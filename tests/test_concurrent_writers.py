"""Concurrent-writer conflict coverage (ITOneTableClient.java:266-303
analog): two writers racing the same target must serialize — exactly one
winner per version, no commit lost, no state corruption."""

from __future__ import annotations

import os
import threading

from pyspark.sql import types as T

from onetable_spark.formats.delta import DeltaLog
from onetable_spark.formats.iceberg import CommitConflictError, IcebergTable
from onetable_spark.formats.iceberg_catalog import JdbcCatalog, TableIdentifier
from onetable_spark.model import Table, TableFormat

_SCHEMA = T.StructType([T.StructField("id", T.LongType())])


def test_delta_racing_writers_all_commit(spark, tmp_path):
    """N threads commit concurrently: every commit lands at a distinct
    version and the log replays all of them (O_EXCL version claim)."""
    path = str(tmp_path / "race")
    log = DeltaLog(spark, path)
    log.init_table(
        Table(name="race", base_path=path, table_format=TableFormat.DELTA, read_schema=_SCHEMA)
    )
    n = 8
    versions: list[int] = []
    errors: list[Exception] = []
    barrier = threading.Barrier(n)

    def writer(i: int) -> None:
        try:
            barrier.wait()
            # metadata-only commits keep the race on the version claim itself
            versions.append(DeltaLog(spark, path).commit(operation=f"W{i}"))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(versions) == n and len(set(versions)) == n  # no version reused
    assert DeltaLog(spark, path).latest_version() == max(versions)
    # every commit file exists exactly once
    files = [f for f in os.listdir(os.path.join(path, "_delta_log")) if f.endswith(".json")]
    assert len(files) == n + 1  # + the init commit


def test_iceberg_version_claim_single_winner(spark, tmp_path):
    """Two writers prepared against the same base version: exactly one wins
    the O_EXCL metadata claim; the loser gets CommitConflictError."""
    path = str(tmp_path / "ice")
    tbl = IcebergTable(spark, path)
    os.makedirs(tbl.metadata_dir, exist_ok=True)
    tbl._write_metadata(1, {"dummy": 1})
    winner = IcebergTable(spark, path)
    loser = IcebergTable(spark, path)
    winner._write_metadata(2, {"dummy": "w"})
    try:
        loser._write_metadata(2, {"dummy": "l"})
        raise AssertionError("second writer must not also claim v2")
    except CommitConflictError:
        pass
    assert winner.current_version() == 2


def test_jdbc_catalog_racing_swaps_single_winner(tmp_path):
    """N threads CAS the same catalog pointer from the same expected value:
    exactly one succeeds (BEGIN IMMEDIATE + conditional UPDATE)."""
    cat = JdbcCatalog("race", str(tmp_path / "cat.db"))
    ident = TableIdentifier.parse("ns.t")
    cat.register(ident, "/m/v1.metadata.json")
    n = 8
    wins: list[int] = []
    barrier = threading.Barrier(n)

    def swapper(i: int) -> None:
        barrier.wait()
        try:
            cat.swap(ident, "/m/v1.metadata.json", f"/m/v2-{i}.metadata.json")
            wins.append(i)
        except CommitConflictError:
            pass

    threads = [threading.Thread(target=swapper, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert cat.metadata_location(ident) == f"/m/v2-{wins[0]}.metadata.json"


def test_iceberg_commit_overwrite_race_replays(spark, sf_dir, tmp_path):
    """Full optimistic-concurrency loop: two writers commit different adds
    concurrently; the loser's CommitConflictError retry re-reads and
    replays, so BOTH files are live afterwards and no snapshot is lost."""
    import os
    import shutil

    from onetable_spark.model import Table as TableModel
    from onetable_spark.sources.parquet_inventory import build_inventory

    table_path = str(tmp_path / "race_ow")
    os.makedirs(table_path)
    schema_src = os.path.join(sf_dir, "region.parquet")
    tbl = IcebergTable(spark, table_path)
    schema = spark.read.parquet(schema_src).schema
    tbl.init_table(
        TableModel(
            name="race_ow", base_path=table_path,
            table_format=TableFormat.ICEBERG, read_schema=schema,
        )
    )
    paths = []
    invs = []
    for i in range(2):
        f = os.path.join(table_path, f"w{i}.parquet")
        shutil.copy(schema_src, f)
        paths.append(f)
        # materialize inventories up front: the worker threads then race
        # purely on the metadata commit
        invs.append(build_inventory(spark, [f], root=table_path).cache())
        invs[i].count()

    errors = []
    barrier = threading.Barrier(2)

    def writer(i):
        try:
            barrier.wait()
            IcebergTable(spark, table_path).commit_overwrite(adds=invs[i], schema=schema)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    live = {r["path"] for r in IcebergTable(spark, table_path).snapshot_files().collect()}
    assert live == set(paths)  # neither writer's commit was lost
    md = IcebergTable(spark, table_path).metadata()
    assert len(md["snapshots"]) == 2


def test_hudi_racing_writers_get_distinct_instants(spark, tmp_path):
    """N threads commit concurrently against one Hudi timeline: the
    O_EXCL requested-marker claim gives every writer its own instant
    (new_instant alone is check-then-act — two writers reading the same
    timeline would pick the same instant and clobber lifecycle files)."""
    from onetable_spark.formats.hudi import HudiTimeline

    path = str(tmp_path / "hrace")
    os.makedirs(path)
    tl = HudiTimeline(spark, path)
    tl.init_table(
        Table(name="hrace", base_path=path, table_format=TableFormat.HUDI, read_schema=_SCHEMA)
    )
    n = 8
    instants: list[str] = []
    errors: list[Exception] = []
    barrier = threading.Barrier(n)

    def writer(i: int) -> None:
        try:
            barrier.wait()
            instants.append(HudiTimeline(spark, path).commit(operation=f"W{i}"))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(instants) == n and len(set(instants)) == n
    tl2 = HudiTimeline(spark, path)
    completed = {i for i, _ in tl2.completed_instants()}
    assert set(instants) <= completed
    # lifecycle markers stay on the active timeline (real-Hudi semantics —
    # and the permanent claim is what makes the instant race-free), but
    # nothing reads as pending once completed
    assert tl2.pending_instants() == []


def test_delta_spool_files_never_leak(spark, tmp_path):
    """r7 spool-file commit path: after racing commits (link() contention)
    every spool temp is unlinked — only NNN.json commit files remain in
    the log directory."""
    path = str(tmp_path / "spool")
    log = DeltaLog(spark, path)
    log.init_table(
        Table(name="spool", base_path=path, table_format=TableFormat.DELTA, read_schema=_SCHEMA)
    )
    n = 6
    barrier = threading.Barrier(n)
    errors: list[Exception] = []

    def commit_one():
        try:
            barrier.wait()
            log.commit(metadata=None, operation="WRITE")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=commit_one) for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    leftovers = [f for f in os.listdir(log.log_path) if not f.endswith(".json")]
    assert leftovers == [], leftovers
    # every racer landed at a distinct version
    assert len(log._versions()) == n + 1  # init + n commits
