"""Streaming CDC over the native Delta log (streaming/cdc.py): the feed
must surface adds/removes with stats-plane record counts, and a RESTART
from the same checkpoint must emit only the commits that landed since —
the property that makes the file-source ledger equivalent to the
reference's ``lastSyncedInstant`` resume (DeltaIncrementalChangesState)."""

from __future__ import annotations

import os
import shutil

import pytest

from onetable_spark.formats.delta import DeltaLog
from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
from onetable_spark.sources.parquet_inventory import build_inventory
from onetable_spark.streaming.cdc import read_delta_log_stream


def _drain(spark, stream_df, ckpt: str):
    """AvailableNow drain via foreachBatch (the memory sink refuses
    checkpoint RECOVERY, which is the very thing under test), offsets
    from ``ckpt``."""
    got: list = []

    def sink(batch_df, _batch_id):
        got.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ref = "version" if got and "version" in got[0].__fields__ else "instant"
    return {(r[ref], r["change"], r["file_name"]): r["record_count"] for r in got}


def test_cdc_feed_and_checkpoint_resume(spark, sf_dir, tmp_path):
    base = str(tmp_path / "cdc")
    os.makedirs(base)
    src = os.path.join(sf_dir, "region.parquet")
    shutil.copy(src, os.path.join(base, "f1.parquet"))
    schema = spark.read.parquet(base).schema
    n_region = spark.read.parquet(src).count()

    log = DeltaLog(spark, base)
    log.init_table(
        Table(
            name="cdc",
            base_path=base,
            table_format=TableFormat.DELTA,
            read_schema=schema,
            layout=DataLayoutStrategy.FLAT,
        )
    )
    f1 = build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base)
    log.commit(adds=f1)

    ckpt = str(tmp_path / "ckpt")
    feed = read_delta_log_stream(spark, base)

    first = _drain(spark, feed, ckpt)
    assert first == {(1, "add", "f1.parquet"): n_region}

    # two more commits land; the SAME checkpoint must replay exactly and
    # only them — the v1 add is already in the ledger
    shutil.copy(src, os.path.join(base, "f2.parquet"))
    log.commit(adds=build_inventory(spark, [os.path.join(base, "f2.parquet")], root=base))
    log.commit(removes=f1, operation="DELETE")

    second = _drain(spark, feed, ckpt)
    assert second == {
        (2, "add", "f2.parquet"): n_region,
        (3, "remove", "f1.parquet"): None,
    }

    # nothing new -> empty micro-batch, not a replay
    assert _drain(spark, feed, ckpt) == {}


def test_cdc_feed_ignores_delta_checkpoints(spark, sf_dir, tmp_path):
    """Crossing CHECKPOINT_INTERVAL drops a checkpoint parquet and
    _last_checkpoint into _delta_log; the [0-9]*.json glob must keep the
    feed on commit files only — every version exactly once, no crash on
    the parquet."""
    from onetable_spark.formats.delta import CHECKPOINT_INTERVAL

    base = str(tmp_path / "ckpted")
    os.makedirs(base)
    src = os.path.join(sf_dir, "region.parquet")
    shutil.copy(src, os.path.join(base, "f1.parquet"))
    schema = spark.read.parquet(base).schema
    log = DeltaLog(spark, base)
    log.init_table(
        Table(
            name="ck",
            base_path=base,
            table_format=TableFormat.DELTA,
            read_schema=schema,
            layout=DataLayoutStrategy.FLAT,
        )
    )
    n = CHECKPOINT_INTERVAL + 2
    for i in range(1, n + 1):
        f = os.path.join(base, f"f{i}.parquet")
        shutil.copy(src, f)
        log.commit(adds=build_inventory(spark, [f], root=base))
    log_dir = os.path.join(base, "_delta_log")
    assert any(f.endswith(".checkpoint.parquet") for f in os.listdir(log_dir))

    got = _drain(spark, read_delta_log_stream(spark, base), str(tmp_path / "ck_ckpt"))
    assert {k[0] for k in got} == set(range(1, n + 1))
    assert all(k[1] == "add" for k in got)


def test_hudi_change_stream_adds_removes_and_real_fixture(spark, sf_dir, tmp_path):
    """The rich Hudi feed surfaces per-file adds (stats-plane counts), the
    replaced file GROUPS of a clustering replace-commit as removes, and
    parses REAL Hudi's pretty-printed multiline commit JSON."""
    from onetable_spark.formats.hudi import HudiTimeline, _file_id_for
    from onetable_spark.streaming.cdc import read_hudi_change_stream

    base = str(tmp_path / "hfeed")
    os.makedirs(base)
    src = os.path.join(sf_dir, "region.parquet")
    shutil.copy(src, os.path.join(base, "f1.parquet"))
    schema = spark.read.parquet(base).schema
    n = spark.read.parquet(src).count()
    tl = HudiTimeline(spark, base)
    tl.init_table(
        Table(name="hf", base_path=base, table_format=TableFormat.HUDI, read_schema=schema)
    )
    tl.commit(adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base), schema=schema)
    # clustering: replace f1's file group with a merged copy
    clustered = os.path.join(base, "clustered.parquet")
    shutil.copy(src, clustered)
    tl.commit(
        adds=build_inventory(spark, [clustered], root=base),
        replace_file_ids={"": [_file_id_for("f1.parquet")]},
    )

    got = _drain(spark, read_hudi_change_stream(spark, base), str(tmp_path / "hf_ck"))
    by_change = {}
    for (instant, change, fname), rc in got.items():
        by_change.setdefault(change, []).append((fname, rc))
    assert sorted(by_change["add"]) == [("clustered.parquet", n), ("f1.parquet", n)]
    assert by_change["remove"] == [(_file_id_for("f1.parquet"), None)]

    # a rollback must surface as a RETRACTION of the undone instant so a
    # feed consumer can drop that instant's adds
    i3 = tl.commit(
        adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base)
    )
    tl.rollback(i3)
    later = _drain(spark, read_hudi_change_stream(spark, base), str(tmp_path / "hf_ck"))
    assert {(c, f) for (_, c, f) in later} == {("add", "f1.parquet"), ("rollback", i3)}


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/demo/data/db/hudi_dimCustomer"),
    reason="reference demo fixtures not present",
)
def test_hudi_change_stream_parses_real_fixture(spark, tmp_path):
    """REAL Hudi fixture: pretty-printed multiline commit JSON, one add
    with a positive stats-plane record count."""
    from onetable_spark.streaming.cdc import read_hudi_change_stream

    fd = str(tmp_path / "fixture")
    shutil.copytree("/root/reference/demo/data/db/hudi_dimCustomer", fd)
    real = _drain(spark, read_hudi_change_stream(spark, fd), str(tmp_path / "fx_ck"))
    assert len(real) == 1
    ((_, change, fname),) = real.keys()
    assert change == "add" and fname.endswith(".parquet")
    assert all(rc and rc > 0 for rc in real.values())


def test_cdc_feed_skip_change_commits_drops_rewrites(spark, sf_dir, tmp_path):
    """r12: OPTIMIZE/REORG actions carry dataChange=false; a feed opened
    with skip_change_commits=True must drop them (delta-spark's
    skipChangeCommits contract) while the default feed still surfaces
    the layout change. Legacy actions without the flag always pass."""
    base = str(tmp_path / "skipcc")
    os.makedirs(base)
    src = os.path.join(sf_dir, "region.parquet")
    shutil.copy(src, os.path.join(base, "f1.parquet"))
    shutil.copy(src, os.path.join(base, "f2.parquet"))
    schema = spark.read.parquet(base).schema
    log = DeltaLog(spark, base)
    log.init_table(
        Table(name="s", base_path=base, table_format=TableFormat.DELTA,
              read_schema=schema, layout=DataLayoutStrategy.FLAT)
    )
    paths = [os.path.join(base, n) for n in ("f1.parquet", "f2.parquet")]
    log.commit(adds=build_inventory(spark, paths, root=base))

    from onetable_spark.operators.maintenance import compact_table

    compact_table(spark, TableFormat.DELTA, base, target_bytes=1 << 30)

    full = _drain(spark, read_delta_log_stream(spark, base),
                  str(tmp_path / "ck_full"))
    skipped = _drain(
        spark,
        read_delta_log_stream(spark, base, skip_change_commits=True),
        str(tmp_path / "ck_skip"),
    )
    # the default feed sees the OPTIMIZE rewrite (v2 adds+removes)...
    assert any(k[0] == 2 for k in full)
    # ...the skipping feed sees only the v1 data commit
    assert skipped and all(k[0] == 1 for k in skipped)
    assert {k for k in skipped} == {k for k in full if k[0] == 1}


def _drain_rows(spark, stream_df, ckpt: str) -> list:
    got: list = []

    def sink(batch_df, _batch_id):
        got.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return got


def test_cdf_stream_derives_non_cdc_commits(spark, tmp_path):
    """r14 (the r13 semantic gap): plain appends author NO cdc files —
    the streamed feed must still emit their rows as derived inserts
    (delta-spark streaming readChangeFeed parity), unioned with the cdc
    files' exact rows, and a remove-only commit's rows as deletes."""
    from onetable_spark.streaming.cdc import read_cdf_stream

    base = str(tmp_path / "cdfstream")
    os.makedirs(base)
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(4)], "id long, name string"
    )
    df.coalesce(1).write.parquet(base + "/.stage")
    part = next(
        f for f in os.listdir(base + "/.stage")
        if f.endswith(".parquet") and not f.startswith(".")
    )
    os.replace(os.path.join(base, ".stage", part), os.path.join(base, "f1.parquet"))
    shutil.rmtree(base + "/.stage")

    log = DeltaLog(spark, base)
    log.init_table(
        Table(name="t", base_path=base, table_format=TableFormat.DELTA,
              read_schema=df.schema),
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    # v1: plain append (no cdc files)
    log.commit(adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base))
    # v2: keyed upsert (authors cdc files — authoritative, must not double-emit)
    batch = spark.createDataFrame([(1, "n1_v2"), (99, "new")], "id long, name string")
    batch.coalesce(1).write.parquet(base + "/.stage2")
    part2 = next(
        f for f in os.listdir(base + "/.stage2")
        if f.endswith(".parquet") and not f.startswith(".")
    )
    os.replace(os.path.join(base, ".stage2", part2), os.path.join(base, "f2.parquet"))
    shutil.rmtree(base + "/.stage2")
    log.upsert_by_key(
        build_inventory(spark, [os.path.join(base, "f2.parquet")], root=base),
        key_fields=["id"],
    )
    # v3: remove-only commit (derived deletes)
    victim = os.path.join(base, "f2.parquet")
    log.commit(removes=spark.createDataFrame([(victim,)], "path string"))
    # v4: MIXED overwrite (remove f1 + add f3, no cdc) — derives BOTH
    # legs (r14; the r13 stream raised on this commit shape)
    b3 = spark.createDataFrame([(200, "o200"), (201, "o201")], "id long, name string")
    b3.coalesce(1).write.parquet(base + "/.stage3")
    part3 = next(
        f for f in os.listdir(base + "/.stage3")
        if f.endswith(".parquet") and not f.startswith(".")
    )
    os.replace(os.path.join(base, ".stage3", part3), os.path.join(base, "f3.parquet"))
    shutil.rmtree(base + "/.stage3")
    log.commit(
        adds=build_inventory(spark, [os.path.join(base, "f3.parquet")], root=base),
        removes=spark.createDataFrame(
            [(os.path.join(base, "f1.parquet"),)], "path string"
        ),
    )

    rows = _drain_rows(spark, read_cdf_stream(spark, base), str(tmp_path / "ck_cdf"))
    tagged = {(r["_change_type"], r["id"], r["name"]) for r in rows}
    assert tagged == {
        # v1 derived inserts — THE r13 hole
        ("insert", 0, "n0"), ("insert", 1, "n1"),
        ("insert", 2, "n2"), ("insert", 3, "n3"),
        # v2 exact cdc rows (once — not re-derived from the log)
        ("update_preimage", 1, "n1"),
        ("update_postimage", 1, "n1_v2"),
        ("insert", 99, "new"),
        # v3 derived deletes
        ("delete", 1, "n1_v2"), ("delete", 99, "new"),
        # v4 mixed overwrite: both derived legs
        ("insert", 200, "o200"), ("insert", 201, "o201"),
        ("delete", 0, "n0"), ("delete", 1, "n1"),
        ("delete", 2, "n2"), ("delete", 3, "n3"),
    }
    assert len(rows) == len(tagged)  # no double emission anywhere


def test_iceberg_append_stream_semantics(spark, tmp_path):
    """Real-Iceberg streaming-source parity: appends stream row-level,
    replace (compaction) is invisible, overwrite fails unless skipped,
    delete fails unless skipped."""
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import DataLayoutStrategy
    from onetable_spark.streaming.cdc import read_iceberg_append_stream

    base = str(tmp_path / "icestream")
    os.makedirs(base)

    def wf(rows, name):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({"id": [r[0] for r in rows], "name": [r[1] for r in rows]}),
            os.path.join(base, name),
        )

    wf([(i, f"n{i}") for i in range(4)], "f1.parquet")
    schema = spark.read.parquet(os.path.join(base, "f1.parquet")).schema
    ice = IcebergTable(spark, base)
    ice.init_table(
        Table(name="t", base_path=base, table_format=TableFormat.ICEBERG,
              read_schema=schema, layout=DataLayoutStrategy.FLAT),
        format_version=2,
    )
    # v1 append, v2 upsert (overwrite), v3 append, then compaction (replace)
    ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base)
    )
    wf([(1, "n1_v2"), (9, "nine")], "u1.parquet")
    ice.commit_upsert(
        build_inventory(spark, [os.path.join(base, "u1.parquet")], root=base), ["id"]
    )
    wf([(20, "n20")], "f2.parquet")
    ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(base, "f2.parquet")], root=base)
    )
    ice.rewrite_data_files(apply_equality_deletes=True)

    # overwrite snapshot fails the stream without the skip flag
    with pytest.raises(Exception, match="OVERWRITE"):
        _drain_rows(
            spark,
            read_iceberg_append_stream(spark, base),
            str(tmp_path / "ck_fail"),
        )

    rows = _drain_rows(
        spark,
        read_iceberg_append_stream(spark, base, skip_overwrite_snapshots=True),
        str(tmp_path / "ck_ok"),
    )
    got = {(r["id"], r["name"]) for r in rows}
    # appends only: v1's 4 rows + v3's 1 row; the upsert's rows are
    # skipped, the compaction's rewritten files never re-emit
    assert got == {(0, "n0"), (1, "n1"), (2, "n2"), (3, "n3"), (20, "n20")}
    assert len(rows) == 5
    sids = {r["_snapshot_id"] for r in rows}
    assert len(sids) == 2


def test_hudi_row_stream_derives_upserts_and_replacecommits(spark, tmp_path):
    """The third edge of the STREAMING triangle: base inserts stream as
    'i', log-block after-images as 'u', delete blocks as 'd'; a
    replacecommit streams its replaced groups' prior rows as 'd' plus
    the new base rows as 'i' (r15 — prior state replayed from the
    timeline's own JSON inside the planning task; the r14 source
    refused replacecommits outright), matching the batch changelog."""
    from onetable_spark.formats.hudi import HudiTimeline, _file_id_for
    from onetable_spark.model import DataLayoutStrategy
    from onetable_spark.streaming.cdc import read_hudi_row_stream

    base = str(tmp_path / "hrow")
    os.makedirs(base)
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(4)], "id long, name string"
    )
    df.coalesce(1).write.parquet(base + "/.stage")
    part = next(
        f for f in os.listdir(base + "/.stage")
        if f.endswith(".parquet") and not f.startswith(".")
    )
    os.replace(os.path.join(base, ".stage", part), os.path.join(base, "f1.parquet"))
    shutil.rmtree(base + "/.stage")
    tl = HudiTimeline(spark, base)
    tl.init_table(
        Table(name="t", base_path=base, table_format=TableFormat.HUDI,
              read_schema=df.schema, layout=DataLayoutStrategy.FLAT,
              record_key_fields=("id",))
    )
    tl.commit(
        adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base),
        action="deltacommit",
    )
    tl.upsert_records(
        spark.createDataFrame([(1, "n1_v2"), (9, "nine")], "id long, name string")
    )
    import pyarrow.parquet as pq

    ids = pq.read_table(os.path.join(base, "f1.parquet"), columns=["id"])["id"].to_pylist()
    tl.commit_delete_logs(
        spark.createDataFrame(
            [(os.path.join(base, "f1.parquet"), ids.index(2))], "path string, pos long"
        )
    )

    rows = _drain_rows(
        spark, read_hudi_row_stream(spark, base), str(tmp_path / "ck_hrow")
    )
    got = {(r["_change_operation"], r["id"], r["name"]) for r in rows}
    assert got == {
        ("i", 0, "n0"), ("i", 1, "n1"), ("i", 2, "n2"), ("i", 3, "n3"),
        ("u", 1, "n1_v2"), ("i", 9, "nine"),
        ("d", 2, None),
    }
    assert len(rows) == len(got)

    # a replacecommit streams: replaced group's prior base rows as 'd',
    # new base rows as 'i' — same as the batch changelog derives
    merged = os.path.join(base, "merged.parquet")
    shutil.copy(os.path.join(base, "f1.parquet"), merged)
    tl.commit(
        adds=build_inventory(spark, [merged], root=base),
        replace_file_ids={"": [_file_id_for("f1.parquet")]},
    )
    prior_instants = [i for i, _ in tl.completed_instants()]
    replace_instant = prior_instants[-1]
    stream_rows = _drain_rows(
        spark, read_hudi_row_stream(spark, base), str(tmp_path / "ck_hrow2")
    )
    stream_tail = {
        (r["_change_operation"], r["id"], r["name"])
        for r in stream_rows
        if r["_commit_instant"] == replace_instant
    }
    batch_tail = {
        (r["_change_operation"], r["id"], r["name"])
        for r in tl.changelog(from_instant=prior_instants[-2]).collect()
    }
    assert stream_tail == batch_tail
    assert ("d", 0, "n0") in stream_tail  # prior rows of the replaced group
    assert ("i", 0, "n0") in stream_tail  # re-written by the merged file


def test_hudi_composite_key_delete_rows(spark, tmp_path):
    """r15 (VERDICT r14 missing #3): a COMPOSITE-key table's delete rows
    carry ALL key fields — the ComplexKeyGenerator 'f1:v1,f2:v2'
    recordKey splits back into typed columns in both the batch changelog
    and the row stream (before, only the first key field was stamped)."""
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.streaming.cdc import read_hudi_row_stream

    base = str(tmp_path / "hcomp")
    os.makedirs(base)
    df = spark.createDataFrame(
        [(i, f"s{i}", f"n{i}") for i in range(4)],
        "id long, sub string, name string",
    )
    df.coalesce(1).write.parquet(base + "/.stage")
    part = next(
        f for f in os.listdir(base + "/.stage")
        if f.endswith(".parquet") and not f.startswith(".")
    )
    os.replace(os.path.join(base, ".stage", part), os.path.join(base, "f1.parquet"))
    shutil.rmtree(base + "/.stage")
    tl = HudiTimeline(spark, base)
    tl.init_table(
        Table(name="t", base_path=base, table_format=TableFormat.HUDI,
              read_schema=df.schema, layout=DataLayoutStrategy.FLAT,
              record_key_fields=("id", "sub"))
    )
    tl.commit(
        adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base),
        action="deltacommit",
    )
    import pyarrow.parquet as pq

    ids = pq.read_table(os.path.join(base, "f1.parquet"), columns=["id"])["id"].to_pylist()
    tl.commit_delete_logs(
        spark.createDataFrame(
            [(os.path.join(base, "f1.parquet"), ids.index(2))], "path string, pos long"
        )
    )

    batch_d = [
        (r["id"], r["sub"], r["name"])
        for r in tl.changelog().where("_change_operation = 'd'").collect()
    ]
    assert batch_d == [(2, "s2", None)]

    rows = _drain_rows(
        spark, read_hudi_row_stream(spark, base), str(tmp_path / "ck_comp")
    )
    stream_d = [
        (r["id"], r["sub"], r["name"])
        for r in rows
        if r["_change_operation"] == "d"
    ]
    assert stream_d == [(2, "s2", None)]


def test_hudi_row_stream_fans_out_per_file(spark, tmp_path):
    """r15: a multi-file commit is read by MORE THAN ONE task (stage-1
    metadata pass + explicit repartition + per-file stage-2 reads)."""
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.streaming.cdc import read_hudi_row_stream

    base = str(tmp_path / "hfan")
    os.makedirs(base)
    import pyarrow as pa
    import pyarrow.parquet as pq

    fs = []
    for k in range(4):
        f = os.path.join(base, f"f{k}.parquet")
        pq.write_table(
            pa.table({"id": [k * 10 + j for j in range(5)],
                      "name": [f"n{k}_{j}" for j in range(5)]}),
            f,
        )
        fs.append(f)
    schema = spark.read.parquet(fs[0]).schema
    tl = HudiTimeline(spark, base)
    tl.init_table(
        Table(name="t", base_path=base, table_format=TableFormat.HUDI,
              read_schema=schema, layout=DataLayoutStrategy.FLAT,
              record_key_fields=("id",))
    )
    tl.commit(adds=build_inventory(spark, fs, root=base), action="deltacommit")

    probe = str(tmp_path / "probe")
    os.makedirs(probe)
    rows = _drain_rows(
        spark,
        read_hudi_row_stream(spark, base, _task_probe_dir=probe),
        str(tmp_path / "ck_hfan"),
    )
    assert len(rows) == 20
    tasks = [f for f in os.listdir(probe) if f.startswith("task-")]
    assert len(tasks) > 1, tasks


def test_iceberg_append_stream_fans_out_per_file(spark, tmp_path):
    """r15: a multi-file append must be read by MORE THAN ONE task — the
    metadata pass explodes the snapshot into per-file rows and an
    explicit repartition fans the reads out (the r14 form read every
    file of a snapshot serially inside one mapInPandas task)."""
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import DataLayoutStrategy
    from onetable_spark.streaming.cdc import read_iceberg_append_stream

    base = str(tmp_path / "icefan")
    os.makedirs(base)
    import pyarrow as pa
    import pyarrow.parquet as pq

    fs = []
    for k in range(4):
        f = os.path.join(base, f"f{k}.parquet")
        pq.write_table(
            pa.table({"id": [k * 10 + j for j in range(5)],
                      "name": [f"n{k}_{j}" for j in range(5)]}),
            f,
        )
        fs.append(f)
    schema = spark.read.parquet(fs[0]).schema
    ice = IcebergTable(spark, base)
    ice.init_table(
        Table(name="t", base_path=base, table_format=TableFormat.ICEBERG,
              read_schema=schema, layout=DataLayoutStrategy.FLAT),
        format_version=2,
    )
    # ONE commit carrying all four files
    ice.commit_overwrite(adds=build_inventory(spark, fs, root=base))

    probe = str(tmp_path / "probe")
    os.makedirs(probe)
    rows = _drain_rows(
        spark,
        read_iceberg_append_stream(spark, base, _task_probe_dir=probe),
        str(tmp_path / "ck_fan"),
    )
    assert len(rows) == 20
    assert {r["name"] for r in rows} == {
        f"n{k}_{j}" for k in range(4) for j in range(5)
    }
    # >1 task actually read files (markers only written on real reads)
    tasks = [f for f in os.listdir(probe) if f.startswith("task-")]
    assert len(tasks) > 1, tasks


def test_iceberg_append_stream_defers_inflight_commit(spark, tmp_path):
    """r15 (VERDICT r14 #5): a manifest list landing BEFORE its
    metadata.json CAS is a normal mid-commit state — the stream must not
    fail on it; the snapshot's rows arrive in the batch AFTER the CAS
    completes."""
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import DataLayoutStrategy
    from onetable_spark.streaming.cdc import read_iceberg_append_stream

    base = str(tmp_path / "iceflight")
    os.makedirs(base)
    import pyarrow as pa
    import pyarrow.parquet as pq

    def wf(rows, name):
        pq.write_table(
            pa.table({"id": [r[0] for r in rows],
                      "name": [r[1] for r in rows]}),
            os.path.join(base, name),
        )

    wf([(i, f"a{i}") for i in range(3)], "fa.parquet")
    schema = spark.read.parquet(os.path.join(base, "fa.parquet")).schema
    ice = IcebergTable(spark, base)
    ice.init_table(
        Table(name="t", base_path=base, table_format=TableFormat.ICEBERG,
              read_schema=schema, layout=DataLayoutStrategy.FLAT),
        format_version=2,
    )
    ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(base, "fa.parquet")], root=base)
    )
    wf([(10, "b10"), (11, "b11")], "fb.parquet")
    ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(base, "fb.parquet")], root=base)
    )
    # simulate mid-CAS: the second commit's snap-*.avro exists, but its
    # metadata.json has not been claimed yet
    meta = os.path.join(base, "metadata")
    latest = max(
        (f for f in os.listdir(meta) if f.endswith(".metadata.json")),
        key=lambda f: int(f[1:].split(".", 1)[0]),
    )
    hidden = str(tmp_path / latest)
    os.replace(os.path.join(meta, latest), hidden)
    # mid-CAS the version hint still names the PREVIOUS version
    n_latest = int(latest[1:].split(".", 1)[0])
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write(str(n_latest - 1))

    ck = str(tmp_path / "ck_flight")
    rows1 = _drain_rows(spark, read_iceberg_append_stream(spark, base), ck)
    assert {r["name"] for r in rows1} == {"a0", "a1", "a2"}  # no failure

    # CAS completes — the NEXT batch (same checkpoint) carries the rows
    os.replace(hidden, os.path.join(meta, latest))
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write(str(n_latest))
    rows2 = _drain_rows(spark, read_iceberg_append_stream(spark, base), ck)
    assert {r["name"] for r in rows2} == {"b10", "b11"}


def test_cdf_stream_fans_out_per_file(spark, tmp_path):
    """r15: the derived-CDF leg gets the same per-file fan-out as the
    Iceberg/Hudi sources — the JSON file source is one partition per
    commit file, so a multi-file commit previously derived in ONE task."""
    from onetable_spark.streaming.cdc import read_cdf_stream

    base = str(tmp_path / "cdffan")
    os.makedirs(base)
    import pyarrow as pa
    import pyarrow.parquet as pq

    fs = []
    for k in range(4):
        f = os.path.join(base, f"f{k}.parquet")
        pq.write_table(
            pa.table({"id": [k * 10 + j for j in range(5)],
                      "name": [f"n{k}_{j}" for j in range(5)]}),
            f,
        )
        fs.append(f)
    schema = spark.read.parquet(fs[0]).schema
    log = DeltaLog(spark, base)
    log.init_table(
        Table(name="t", base_path=base, table_format=TableFormat.DELTA,
              read_schema=schema, layout=DataLayoutStrategy.FLAT),
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    log.commit(adds=build_inventory(spark, fs, root=base))

    probe = str(tmp_path / "probe")
    os.makedirs(probe)
    rows = _drain_rows(
        spark,
        read_cdf_stream(spark, base, _task_probe_dir=probe),
        str(tmp_path / "ck_cdffan"),
    )
    assert len(rows) == 20
    assert {r["_change_type"] for r in rows} == {"insert"}
    tasks = [f for f in os.listdir(probe) if f.startswith("task-")]
    assert len(tasks) > 1, tasks


# --------------------------------------------------- r16 adaptive fan-out


def test_fanout_probes_and_resolution(spark, tmp_path):
    """r16 (VERDICT r15 #4): the build-time metadata probes must measure
    each format's max files-per-commit exactly, and ``_fanout_width`` must
    skip the exchange ONLY when the probe proves commits are tiny."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.streaming.cdc import (
        _delta_max_actions_per_commit,
        _fanout_width,
        _hudi_max_files_per_commit,
        _iceberg_max_added_files,
    )

    def mk(base, n_files):
        os.makedirs(base)
        fs = []
        for k in range(n_files):
            f = os.path.join(base, f"f{k}.parquet")
            pq.write_table(
                pa.table({"id": [k], "name": [f"n{k}"]}), f
            )
            fs.append(f)
        schema = spark.read.parquet(fs[0]).schema
        return fs, schema

    # Delta: two single-file commits -> max 1
    dbase = str(tmp_path / "d1")
    fs, schema = mk(dbase, 2)
    dlog = DeltaLog(spark, dbase)
    dlog.init_table(
        Table(name="d", base_path=dbase, table_format=TableFormat.DELTA,
              read_schema=schema, layout=DataLayoutStrategy.FLAT)
    )
    dlog.commit(adds=build_inventory(spark, [fs[0]], root=dbase))
    dlog.commit(adds=build_inventory(spark, [fs[1]], root=dbase))
    assert _delta_max_actions_per_commit(dbase + "/_delta_log") == 1
    # Delta: one 4-file commit -> max 4
    dbase4 = str(tmp_path / "d4")
    fs4, schema4 = mk(dbase4, 4)
    dlog4 = DeltaLog(spark, dbase4)
    dlog4.init_table(
        Table(name="d4", base_path=dbase4, table_format=TableFormat.DELTA,
              read_schema=schema4, layout=DataLayoutStrategy.FLAT)
    )
    dlog4.commit(adds=build_inventory(spark, fs4, root=dbase4))
    assert _delta_max_actions_per_commit(dbase4 + "/_delta_log") == 4
    # absent/empty log -> unknown
    assert _delta_max_actions_per_commit(str(tmp_path / "nope")) is None

    # Hudi: one 4-file deltacommit -> max 4
    hbase = str(tmp_path / "h4")
    hfs, hschema = mk(hbase, 4)
    tl = HudiTimeline(spark, hbase)
    tl.init_table(
        Table(name="h", base_path=hbase, table_format=TableFormat.HUDI,
              read_schema=hschema, layout=DataLayoutStrategy.FLAT,
              record_key_fields=("id",))
    )
    tl.commit(adds=build_inventory(spark, hfs, root=hbase), action="deltacommit")
    assert _hudi_max_files_per_commit(hbase + "/.hoodie") == 4

    # Iceberg: one single-file commit then one 3-file commit -> max 3
    ibase = str(tmp_path / "i3")
    ifs, ischema = mk(ibase, 4)
    ice = IcebergTable(spark, ibase)
    ice.init_table(
        Table(name="i", base_path=ibase, table_format=TableFormat.ICEBERG,
              read_schema=ischema, layout=DataLayoutStrategy.FLAT),
        format_version=2,
    )
    ice.commit_overwrite(adds=build_inventory(spark, ifs[:1], root=ibase))
    ice.commit_overwrite(adds=build_inventory(spark, ifs[1:], root=ibase))
    assert _iceberg_max_added_files(ibase + "/metadata") == 3

    # resolution: explicit width always wins; tiny commits skip the
    # exchange; bulk/unknown commits use the session's shuffle width
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert _fanout_width(spark, 7, 1) == 7
    assert _fanout_width(spark, None, 1) is None
    assert _fanout_width(spark, None, 2) is None
    assert _fanout_width(spark, None, 3) == sess
    assert _fanout_width(spark, None, None) == sess


def test_single_file_commit_stream_skips_exchange_still_correct(spark, tmp_path):
    """r16: on a table whose commits each add ONE file, the auto probe
    drops the repartition — the plan must carry no shuffle exchange and
    the drained rows must be identical to the repartitioned form."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.streaming.cdc import read_iceberg_append_stream

    base = str(tmp_path / "ismall")
    os.makedirs(base)
    fs = []
    for k in range(3):
        f = os.path.join(base, f"f{k}.parquet")
        pq.write_table(
            pa.table({"id": [k * 10 + j for j in range(5)],
                      "name": [f"n{k}_{j}" for j in range(5)]}),
            f,
        )
        fs.append(f)
    schema = spark.read.parquet(fs[0]).schema
    ice = IcebergTable(spark, base)
    ice.init_table(
        Table(name="t", base_path=base, table_format=TableFormat.ICEBERG,
              read_schema=schema, layout=DataLayoutStrategy.FLAT),
        format_version=2,
    )
    for f in fs:  # three SINGLE-file commits
        ice.commit_overwrite(adds=build_inventory(spark, [f], root=base))

    auto = read_iceberg_append_stream(spark, base)
    assert "Repartition" not in auto._jdf.queryExecution().logical().toString()
    rows_auto = sorted(
        (r["id"], r["name"], r["_snapshot_id"])
        for r in _drain_rows(spark, auto, str(tmp_path / "ck_a"))
    )
    forced = read_iceberg_append_stream(spark, base, fanout=4)
    assert "Repartition" in forced._jdf.queryExecution().logical().toString()
    rows_forced = sorted(
        (r["id"], r["name"], r["_snapshot_id"])
        for r in _drain_rows(spark, forced, str(tmp_path / "ck_f"))
    )
    assert rows_auto == rows_forced and len(rows_auto) == 15
