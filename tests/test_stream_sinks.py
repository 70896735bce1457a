"""Streaming ingestion into the native Delta plane (foreachBatch sink):
exactly-once batch commits via SetTransaction ids, then ordinary sync
fan-out of the ingested table."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from onetable_spark.formats.delta import DeltaLog
from onetable_spark.formats.iceberg import IcebergTable
from onetable_spark.model import SyncStatus, TableFormat
from onetable_spark.streaming.table_sinks import DeltaStreamWriter, write_stream_to_delta
from onetable_spark.streaming.events import read_event_stream
from onetable_spark.sync import SyncClient, source_for, target_for


def test_stream_to_delta_ingests_all_events(spark, sf_dir, tmp_path):
    table_path = str(tmp_path / "ingest")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(spark, sf_dir).select("event_id", "user_id", "event_type")
    q = write_stream_to_delta(stream, table_path, ckpt, app_id="t1")
    q.awaitTermination()

    log = DeltaLog(spark, table_path)
    files = [r["path"] for r in log.snapshot_files().select("path").collect()]
    assert files
    got = spark.read.parquet(*files)
    want = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id", "event_type"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # the batch id is recorded; a replay of the same batch is a no-op
    writer = DeltaStreamWriter(table_path, app_id="t1")
    last = writer.last_committed_batch(log)
    assert last >= 0
    version_before = log.latest_version()
    writer(got.limit(5), last)  # simulate a restart replaying batch `last`
    assert DeltaLog(spark, table_path).latest_version() == version_before

    # a NEW batch id commits
    writer(got.limit(5), last + 1)
    assert DeltaLog(spark, table_path).latest_version() == version_before + 1


def test_streamed_delta_table_syncs_to_iceberg(spark, sf_dir, tmp_path):
    table_path = str(tmp_path / "ingest2")
    stream = read_event_stream(spark, sf_dir).select("event_id", "user_id")
    q = write_stream_to_delta(stream, table_path, str(tmp_path / "ck2"), app_id="t2")
    q.awaitTermination()

    res = SyncClient(spark).sync(
        source_for(spark, TableFormat.DELTA, table_path),
        [target_for(spark, TableFormat.ICEBERG, table_path)],
    )
    assert res[TableFormat.ICEBERG].status == SyncStatus.SUCCESS
    ice_files = [r["path"] for r in IcebergTable(spark, table_path).snapshot_files().select("path").collect()]
    delta_files = [r["path"] for r in DeltaLog(spark, table_path).snapshot_files().select("path").collect()]
    assert sorted(ice_files) == sorted(delta_files)


def test_stream_to_iceberg_and_hudi_exactly_once(spark, sf_dir, tmp_path):
    """The same micro-batch contract holds for the Iceberg and Hudi sinks:
    all events land, and a replayed batch id is a no-op."""
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.streaming.table_sinks import (
        HudiStreamWriter,
        IcebergStreamWriter,
        write_stream_to_table,
    )

    want = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id"
    )

    ice_path = str(tmp_path / "ice")
    q = write_stream_to_table(
        read_event_stream(spark, sf_dir).select("event_id", "user_id"),
        TableFormat.ICEBERG, ice_path, str(tmp_path / "ck_i"), app_id="ai",
    )
    q.awaitTermination()
    tbl = IcebergTable(spark, ice_path)
    files = [r["path"] for r in tbl.snapshot_files().select("path").collect()]
    got = spark.read.parquet(*files)
    assert got.count() == want.count() and got.exceptAll(want).count() == 0
    v = tbl.current_version()
    IcebergStreamWriter(ice_path, app_id="ai")(got.limit(3), 0)  # replay
    assert IcebergTable(spark, ice_path).current_version() == v

    hudi_path = str(tmp_path / "hud")
    q = write_stream_to_table(
        read_event_stream(spark, sf_dir).select("event_id", "user_id"),
        TableFormat.HUDI, hudi_path, str(tmp_path / "ck_h"), app_id="ah",
    )
    q.awaitTermination()
    tl = HudiTimeline(spark, hudi_path)
    files = [r["path"] for r in tl.snapshot_files().select("path").collect()]
    got = spark.read.parquet(*files)
    assert got.count() == want.count() and got.exceptAll(want).count() == 0
    n = len(tl.completed_instants())
    HudiStreamWriter(hudi_path, app_id="ah")(got.limit(3), 0)  # replay
    assert len(HudiTimeline(spark, hudi_path).completed_instants()) == n


def test_upsert_stream_writers_merge_by_key(spark, sf_dir, tmp_path):
    """r12 streaming UPSERT sinks: batch 0 seeds the table, batch 1
    re-sends keys {0, 2} with new values — on Delta the old copies die
    via deletion vectors, on Iceberg via an equality-delete file; a
    replayed batch id is a no-op (exactly-once); the logical state is
    one row per key with the LATEST value."""
    import os

    from onetable_spark.streaming.table_sinks import (
        DeltaUpsertStreamWriter,
        IcebergUpsertStreamWriter,
    )

    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet")).select(
        "r_regionkey", "r_name"
    )
    n = region.count()
    b1 = region.filter(F.col("r_regionkey").isin(0, 2)).withColumn(
        "r_name", F.lit("UPDATED")
    )

    # ---- Delta: DVs carry the merge
    dpath = str(tmp_path / "dmerge")
    dw = DeltaUpsertStreamWriter(dpath, ["r_regionkey"], app_id="u1")
    dw(region, 0)
    dw(b1, 1)
    log = DeltaLog(spark, dpath)
    v = log.latest_version()
    dw(b1, 1)  # replay — exactly-once
    assert DeltaLog(spark, dpath).latest_version() == v
    raw, positions = log.snapshot_with_deleted_positions()
    dead = {(r["path"], r["pos"]) for r in positions.collect()}
    rows = []
    for r in raw.select("path").collect():
        pdf = spark.read.parquet(r["path"]).select("r_regionkey", "r_name").collect()
        rows += [
            (x["r_regionkey"], x["r_name"])
            for i, x in enumerate(pdf)
            if (r["path"], i) not in dead
        ]
    assert len(rows) == n
    by_key = dict(rows)
    assert by_key[0] == "UPDATED" and by_key[2] == "UPDATED"

    # ---- Iceberg: an equality-delete file carries the merge
    ipath = str(tmp_path / "imerge")
    iw = IcebergUpsertStreamWriter(ipath, ["r_regionkey"], app_id="u2")
    iw(region, 0)
    iw(b1, 1)
    tbl = IcebergTable(spark, ipath)
    ver = tbl.current_version()
    iw(b1, 1)  # replay — exactly-once
    assert IcebergTable(spark, ipath).current_version() == ver
    total = sum(
        r["record_count"]
        for r in tbl.snapshot_files(apply_equality_deletes=True).collect()
    )
    assert total == n
