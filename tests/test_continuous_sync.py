"""Continuous sync (sync/continuous.py): the CDC stream over the source's
Delta log triggers incremental SyncClient runs — first drain FULL-syncs,
later drains sync INCREMENTALLY exactly the commits that landed since the
checkpoint, an empty drain triggers nothing, and the composition stays
idempotent when a manual sync races the service."""

from __future__ import annotations

import os
import shutil

from onetable_spark.formats.delta import DeltaLog
from onetable_spark.formats.hudi import HudiTimeline
from onetable_spark.formats.iceberg import IcebergTable
from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
from onetable_spark.sources.parquet_inventory import build_inventory
from onetable_spark.sync import SyncClient, source_for, target_for
from onetable_spark.sync.continuous import ContinuousSync


def _stage(spark, sf_dir, base):
    os.makedirs(base)
    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(base, "f1.parquet"))
    schema = spark.read.parquet(base).schema
    log = DeltaLog(spark, base)
    log.init_table(
        Table(
            name="cs",
            base_path=base,
            table_format=TableFormat.DELTA,
            read_schema=schema,
            layout=DataLayoutStrategy.FLAT,
        )
    )
    log.commit(adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base))
    return log


def test_continuous_sync_full_then_incremental(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    log = _stage(spark, sf_dir, base)
    targets = (TableFormat.ICEBERG, TableFormat.HUDI)

    j1 = ContinuousSync(spark, base, targets, ckpt, validate=True).run_available_now()
    assert len(j1) == 1
    assert j1[0]["results"] == {
        "ICEBERG": ("SUCCESS", "FULL"),
        "HUDI": ("SUCCESS", "FULL"),
    }
    assert IcebergTable(spark, base).snapshot_files().count() == 1
    assert HudiTimeline(spark, base).snapshot_files().count() == 1

    # two commits land; a NEW service instance on the SAME checkpoint
    # drains only them and replays incrementally
    for name in ("f2.parquet", "f3.parquet"):
        shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(base, name))
        log.commit(adds=build_inventory(spark, [os.path.join(base, name)], root=base))
    j2 = ContinuousSync(spark, base, targets, ckpt, validate=True).run_available_now()
    assert len(j2) == 1
    assert j2[0]["n_commits"] == 2  # exactly the two new commits, no v1 replay
    assert j2[0]["results"] == {
        "ICEBERG": ("SUCCESS", "INCREMENTAL"),
        "HUDI": ("SUCCESS", "INCREMENTAL"),
    }
    assert IcebergTable(spark, base).snapshot_files().count() == 3

    # nothing new: the drain triggers no sync at all
    assert list(ContinuousSync(spark, base, targets, ckpt).run_available_now()) == []


def test_live_service_picks_up_commit(spark, sf_dir, tmp_path):
    """The long-lived service path (processingTime trigger, what
    cli.py --watch starts): a commit made while the service runs is
    synced without any manual drain."""
    import time

    base = str(tmp_path / "live")
    ckpt = str(tmp_path / "ckpt_live")
    log = _stage(spark, sf_dir, base)
    cs = ContinuousSync(spark, base, (TableFormat.ICEBERG,), ckpt)
    q = cs.start(interval="1 seconds")
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not cs.journal:
            time.sleep(0.5)
        assert cs.journal and cs.journal[0]["results"]["ICEBERG"] == ("SUCCESS", "FULL")

        shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(base, "f2.parquet"))
        log.commit(adds=build_inventory(spark, [os.path.join(base, "f2.parquet")], root=base))
        while time.time() < deadline and len(cs.journal) < 2:
            time.sleep(0.5)
        assert len(cs.journal) >= 2
        assert cs.journal[1]["results"]["ICEBERG"] == ("SUCCESS", "INCREMENTAL")
        assert IcebergTable(spark, base).snapshot_files().count() == 2
    finally:
        q.stop()


def test_failed_sync_does_not_consume_the_trigger(spark, sf_dir, tmp_path, monkeypatch):
    """A sync that exhausts its retries must FAIL the micro-batch so the
    checkpoint never records the trigger — the commit is replayed on the
    next drain instead of stranding until an unrelated future commit."""
    import pytest as _pytest

    from onetable_spark.sync import continuous as cont_mod

    base = str(tmp_path / "failtbl")
    ckpt = str(tmp_path / "failckpt")
    _stage(spark, sf_dir, base)
    targets = (TableFormat.ICEBERG,)

    class _Boom(RuntimeError):
        pass

    def boom(self, source, targets):
        raise _Boom("transient")

    monkeypatch.setattr(cont_mod.SyncClient, "sync", boom)
    failing = ContinuousSync(spark, base, targets, ckpt)
    failing.max_sync_attempts = 1
    with _pytest.raises(Exception):
        failing.run_available_now()
    assert failing.journal and "error" in failing.journal[0]
    monkeypatch.undo()

    # same checkpoint, healthy client: the ORIGINAL trigger replays
    j = ContinuousSync(spark, base, targets, ckpt).run_available_now()
    assert len(j) == 1 and j[0]["results"]["ICEBERG"] == ("SUCCESS", "FULL")
    assert IcebergTable(spark, base).snapshot_files().count() == 1


def test_metadata_only_commit_triggers_sync(spark, sf_dir, tmp_path):
    """A Delta SCHEMA-CHANGE commit carries only a metaData action — the
    filtered add/remove feed sees zero rows, so the service watches raw
    commit markers instead. The schema evolution must reach the target
    without waiting for the next data commit."""
    import json as _json

    from pyspark.sql import types as T

    base = str(tmp_path / "meta_only")
    ckpt = str(tmp_path / "meta_ckpt")
    log = _stage(spark, sf_dir, base)
    targets = (TableFormat.ICEBERG,)
    ContinuousSync(spark, base, targets, ckpt).run_available_now()

    schema_v2 = T.StructType(
        list(spark.read.parquet(os.path.join(base, "f1.parquet")).schema.fields)
        + [T.StructField("note", T.StringType(), True)]
    )
    meta = log.update_configuration({})
    meta["schemaString"] = _json.dumps(schema_v2.jsonValue())
    log.commit(metadata=meta)  # no adds, no removes

    j = ContinuousSync(spark, base, targets, ckpt).run_available_now()
    assert len(j) == 1 and j[0]["n_commits"] == 1
    assert j[0]["results"]["ICEBERG"][0] == "SUCCESS"
    evolved = {f.name for f in IcebergTable(spark, base).table_descriptor().read_schema.fields}
    assert "note" in evolved


def test_continuous_sync_hudi_source(spark, sf_dir, tmp_path):
    """Omni-directional: HUDI as the watched source (commit-marker stream
    over the .hoodie timeline), Delta + Iceberg as targets."""
    base = str(tmp_path / "hsrc")
    os.makedirs(base)
    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(base, "f1.parquet"))
    schema = spark.read.parquet(base).schema
    tl = HudiTimeline(spark, base)
    tl.init_table(
        Table(name="hsrc", base_path=base, table_format=TableFormat.HUDI, read_schema=schema)
    )
    tl.commit(adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base), schema=schema)

    ckpt = str(tmp_path / "hckpt")
    targets = (TableFormat.DELTA, TableFormat.ICEBERG)
    j1 = ContinuousSync(
        spark, base, targets, ckpt, source_format=TableFormat.HUDI, validate=True
    ).run_available_now()
    assert len(j1) == 1 and j1[0]["n_commits"] == 1
    assert j1[0]["results"] == {
        "DELTA": ("SUCCESS", "FULL"),
        "ICEBERG": ("SUCCESS", "FULL"),
    }

    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(base, "f2.parquet"))
    i2 = tl.commit(adds=build_inventory(spark, [os.path.join(base, "f2.parquet")], root=base))
    j2 = ContinuousSync(
        spark, base, targets, ckpt, source_format=TableFormat.HUDI
    ).run_available_now()
    assert j2[0]["n_commits"] == 1
    assert j2[0]["results"]["DELTA"] == ("SUCCESS", "INCREMENTAL")
    assert DeltaLog(spark, base).snapshot_files().count() == 2
    assert IcebergTable(spark, base).snapshot_files().count() == 2

    # a ROLLBACK is a snapshot-changing undo action: it must trigger a
    # sync (the marker glob includes *.rollback) and the targets must
    # drop back to the pre-i2 view
    tl.rollback(i2)
    j3 = ContinuousSync(
        spark, base, targets, ckpt, source_format=TableFormat.HUDI
    ).run_available_now()
    assert len(j3) == 1 and j3[0]["n_commits"] == 1
    assert tl.snapshot_files().count() == 1
    assert DeltaLog(spark, base).snapshot_files().count() == 1
    assert IcebergTable(spark, base).snapshot_files().count() == 1


def test_continuous_sync_iceberg_source(spark, sf_dir, tmp_path):
    """Omni-directional: ICEBERG as the watched source (metadata-version
    stream), Delta + Hudi as targets."""
    base = str(tmp_path / "isrc")
    os.makedirs(base)
    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(base, "f1.parquet"))
    schema = spark.read.parquet(base).schema
    ice = IcebergTable(spark, base)
    ice.init_table(
        Table(name="isrc", base_path=base, table_format=TableFormat.ICEBERG, read_schema=schema)
    )
    ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base)
    )

    ckpt = str(tmp_path / "ickpt")
    targets = (TableFormat.DELTA, TableFormat.HUDI)
    j1 = ContinuousSync(
        spark, base, targets, ckpt, source_format=TableFormat.ICEBERG, validate=True
    ).run_available_now()
    # n_commits counts metadata versions in the batch: v1 (init) + v2
    assert len(j1) == 1 and j1[0]["n_commits"] == 2
    assert j1[0]["results"] == {
        "DELTA": ("SUCCESS", "FULL"),
        "HUDI": ("SUCCESS", "FULL"),
    }

    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(base, "f2.parquet"))
    ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(base, "f2.parquet")], root=base)
    )
    j2 = ContinuousSync(
        spark, base, targets, ckpt, source_format=TableFormat.ICEBERG
    ).run_available_now()
    assert j2[0]["n_commits"] == 1
    assert j2[0]["results"]["DELTA"] == ("SUCCESS", "INCREMENTAL")
    assert DeltaLog(spark, base).snapshot_files().count() == 2
    assert HudiTimeline(spark, base).snapshot_files().count() == 2


def test_continuous_sync_idempotent_under_manual_race(spark, sf_dir, tmp_path):
    """A manual cron-style sync between commit and drain must not break
    the service: the triggered sync sees watermarks already advanced and
    converges as an (empty) incremental run."""
    base = str(tmp_path / "tbl2")
    ckpt = str(tmp_path / "ckpt2")
    log = _stage(spark, sf_dir, base)
    targets = (TableFormat.ICEBERG,)

    ContinuousSync(spark, base, targets, ckpt).run_available_now()
    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(base, "f2.parquet"))
    log.commit(adds=build_inventory(spark, [os.path.join(base, "f2.parquet")], root=base))

    # the manual sync lands first (the reference's cron racing the service)
    SyncClient(spark).sync(
        source_for(spark, TableFormat.DELTA, base),
        [target_for(spark, TableFormat.ICEBERG, base)],
    )
    ice_before = IcebergTable(spark, base).metadata()["current-snapshot-id"]

    j = ContinuousSync(spark, base, targets, ckpt).run_available_now()
    # the trigger fired (one journal entry for the new commit) but every
    # change was pruned by the advanced watermark — no target result, no
    # re-application (TableFormatSync.java:135-144 commit pruning)
    assert len(j) == 1 and j[0]["n_commits"] == 1 and j[0]["results"] == {}
    ice = IcebergTable(spark, base)
    assert ice.snapshot_files().count() == 2
    # idempotent: the raced trigger did not double-apply the commit
    assert ice.metadata()["current-snapshot-id"] == ice_before


def test_auto_optimize_service(spark, sf_dir, tmp_path):
    """AutoOptimize: commit-triggered compaction that fires only past the
    small-file threshold, compacts, and self-quenches (its own rewrite
    commit re-triggers one evaluation that finds nothing to do)."""
    from pyspark.sql import functions as F

    from onetable_spark.sync.continuous import AutoOptimize

    base = str(tmp_path / "autoopt")
    ckpt = str(tmp_path / "aockpt")
    log = _stage(spark, sf_dir, base)  # 1 small file

    total = int(log.snapshot_files().agg(F.sum("size")).collect()[0][0])
    svc = lambda: AutoOptimize(  # noqa: E731
        spark, base, (), ckpt, target_bytes=total * 8, min_small_files=3
    )

    # below threshold: evaluated, not compacted
    j1 = svc().run_available_now()
    assert list(j1) == [{"n_commits": 2, "max_partition_small_files": 1}]  # v0 init + v1 add

    for i in (2, 3):
        p = os.path.join(base, f"f{i}.parquet")
        shutil.copy(os.path.join(sf_dir, "region.parquet"), p)
        log.commit(adds=build_inventory(spark, [p], root=base))

    # threshold reached: one compaction run merges all three
    j2 = svc().run_available_now()
    assert j2[0]["max_partition_small_files"] == 3 and j2[0]["bins"] == 1
    assert j2[0]["files_removed"] == 3 and j2[0]["files_added"] == 1
    assert log.snapshot_files().count() == 1

    # self-quenching: the rewrite commit triggers ONE evaluation whose
    # gate (a single merged file < min_small_files) skips planning
    j3 = svc().run_available_now()
    assert list(j3) == [{"n_commits": 1, "max_partition_small_files": 1}]
    assert list(svc().run_available_now()) == []


def test_journal_bounded_over_service_lifetime(spark, tmp_path):
    """Soak: a long-lived service must hold O(journal_maxlen) driver state,
    not O(triggers). 5k triggers (≈2 days of 30 s intervals) through the
    real retry/journal wrapper — the journal stays a fixed-size ring while
    the lifetime counters keep the full history."""
    cs = ContinuousSync(
        spark, str(tmp_path / "t"), (TableFormat.ICEBERG,), str(tmp_path / "c"),
        journal_maxlen=64,
    )
    cs._action = lambda n: {"n_commits": n, "results": {}}  # type: ignore[method-assign]
    for i in range(5000):
        cs._sync_once(1)
    assert len(cs.journal) == 64  # ring bound, not 5000
    assert cs.triggers_total == 5000 and cs.syncs_ok == 5000 and cs.sync_errors == 0
    # the ring holds the MOST RECENT entries and errors still count
    cs._action = lambda n: (_ for _ in ()).throw(RuntimeError("boom"))  # type: ignore[method-assign]
    cs.max_sync_attempts = 1
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        cs._sync_once(9)
    assert cs.sync_errors == 1 and len(cs.journal) == 64
    assert cs.journal[-1] == {"n_commits": 9, "error": "boom"}


def test_auto_vacuum_service(spark, sf_dir, tmp_path):
    """AutoVacuum: each landed commit triggers one vacuum pass — aged
    orphans sweep, fresh orphans and referenced files survive, and the
    service cannot re-trigger itself (vacuum writes no commit)."""
    from onetable_spark.sync.continuous import AutoVacuum

    base = str(tmp_path / "avtbl")
    ckpt = str(tmp_path / "avckpt")
    log = _stage(spark, sf_dir, base)
    old_orphan = os.path.join(base, "orphan_old.parquet")
    new_orphan = os.path.join(base, "orphan_new.parquet")
    shutil.copy(os.path.join(sf_dir, "region.parquet"), old_orphan)
    shutil.copy(os.path.join(sf_dir, "region.parquet"), new_orphan)
    os.utime(old_orphan, (946684800, 946684800))  # 2000-01-01

    svc = lambda: AutoVacuum(spark, base, (), ckpt, retention_hours=1)  # noqa: E731
    j1 = svc().run_available_now()
    assert j1 == [{"n_commits": 2, "referenced": 1, "kept_recent": 1, "removed": 1}]
    assert not os.path.exists(old_orphan) and os.path.exists(new_orphan)
    # no new commit landed -> nothing to trigger (self-quenching)
    assert svc().run_available_now() == []
    # table untouched
    assert log.snapshot_files().count() == 1
