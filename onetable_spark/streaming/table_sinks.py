"""Streaming ingestion INTO the native table planes: ``foreachBatch``
sinks that write each micro-batch as parquet files and commit them to
``_delta_log`` through :class:`DeltaLog` — exactly-once via Delta's
version claim keyed by the batch id.

This closes the loop between the two halves of the engine: Structured
Streaming produces data, the metadata plane (the reference's domain)
commits it transactionally, and every downstream format (Iceberg, Hudi)
can then pick the table up through the ordinary sync path. The reference
has no streaming writer — this is the Spark-native extension of its
TableFormatSync commit lifecycle (TableFormatSync.java:61-133) to a
continuous source.

Exactly-once: the batch id is recorded in each commit's ``txn`` action
(appId = the query name). On restart, a replayed micro-batch sees its
batch id already committed and is skipped — the same idempotent-writer
contract delta-spark's streaming sink implements per PROTOCOL.md
("Transaction Identifiers").
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

from onetable_spark.formats.delta import DeltaLog
from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
from onetable_spark.sources.parquet_inventory import build_inventory


class DeltaStreamWriter:
    """foreachBatch callable committing micro-batches to a Delta table."""

    def __init__(self, table_path: str, app_id: str | None = None):
        self.table_path = table_path
        self.app_id = app_id or f"stream_{uuid.uuid4().hex[:8]}"

    def last_committed_batch(self, log: DeltaLog) -> int:
        """Highest batch id this writer already committed (txn replay)."""
        import json

        last = -1
        for v in log._versions():
            from onetable_spark.formats.delta import _version_path

            with open(_version_path(self.table_path, v)) as f:
                for line in f:
                    action = json.loads(line)
                    txn = action.get("txn")
                    if txn and txn.get("appId") == self.app_id:
                        last = max(last, int(txn.get("version", -1)))
        return last

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        log = DeltaLog(spark, self.table_path)
        if not log.exists():
            log.init_table(
                Table(
                    name=os.path.basename(self.table_path),
                    base_path=self.table_path,
                    table_format=TableFormat.DELTA,
                    read_schema=batch_df.schema,
                    layout=DataLayoutStrategy.FLAT,
                )
            )
        if batch_id <= self.last_committed_batch(log):
            return  # replayed batch after restart — already committed
        # write data files under a batch-scoped subdir, then register them
        out_dir = os.path.join(self.table_path, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(out_dir)
        inv = build_inventory(
            spark,
            [
                os.path.join(out_dir, f)
                for f in os.listdir(out_dir)
                if f.endswith(".parquet")
            ],
            root=self.table_path,
        )
        log.commit(
            adds=inv,
            metadata=None,
            operation="STREAMING UPDATE",
            txn={"appId": self.app_id, "version": batch_id},
        )


def write_stream_to_delta(
    stream_df: DataFrame, table_path: str, checkpoint_dir: str, app_id: str | None = None
):
    """Start an available-now streaming write into a native Delta table;
    returns the StreamingQuery (caller awaits termination)."""
    writer = DeltaStreamWriter(table_path, app_id=app_id)
    return (
        stream_df.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


class IcebergStreamWriter:
    """foreachBatch sink committing micro-batches to a native Iceberg
    table. Exactly-once: the committed batch id is recorded in table
    properties under ``onetable.stream.<appId>`` and checked before each
    commit — the property rides the same atomic metadata.json swap as the
    snapshot, so the check-and-commit is one transaction (the same idea as
    Iceberg's Spark streaming sink, which stores batch ids in snapshot
    summaries)."""

    def __init__(self, table_path: str, app_id: str | None = None):
        self.table_path = table_path
        self.app_id = app_id or f"stream_{uuid.uuid4().hex[:8]}"

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from onetable_spark.formats.iceberg import IcebergTable

        spark = batch_df.sparkSession
        tbl = IcebergTable(spark, self.table_path)
        if not tbl.exists():
            tbl.init_table(
                Table(
                    name=os.path.basename(self.table_path),
                    base_path=self.table_path,
                    table_format=TableFormat.ICEBERG,
                    read_schema=batch_df.schema,
                )
            )
        key = f"onetable.stream.{self.app_id}"
        last = int(tbl.properties().get(key, -1))
        if batch_id <= last:
            return
        out_dir = os.path.join(self.table_path, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(out_dir)
        inv = build_inventory(
            spark,
            [os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")],
            root=self.table_path,
        )
        tbl.commit_overwrite(
            adds=inv, schema=batch_df.schema, properties={key: str(batch_id)}
        )


class HudiStreamWriter:
    """foreachBatch sink committing micro-batches to a native Hudi
    timeline. Exactly-once: the batch id rides the commit's extraMetadata
    (the same slot Hudi's DeltaStreamer uses for its checkpoint key); the
    replay check scans completed commits for this app's high-water mark."""

    def __init__(self, table_path: str, app_id: str | None = None):
        self.table_path = table_path
        self.app_id = app_id or f"stream_{uuid.uuid4().hex[:8]}"

    def _last_committed_batch(self, timeline) -> int:
        import json as _json

        last = -1
        for instant, action in timeline.completed_instants():
            try:
                with open(os.path.join(timeline.hoodie_path, f"{instant}.{action}")) as f:
                    meta = _json.load(f)
            except (OSError, ValueError):
                continue
            extra = meta.get("extraMetadata") or {}
            if extra.get("onetable.stream.app") == self.app_id:
                last = max(last, int(extra.get("onetable.stream.batch", -1)))
        return last

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from onetable_spark.formats.hudi import HudiTimeline

        spark = batch_df.sparkSession
        tl = HudiTimeline(spark, self.table_path)
        if not tl.exists():
            tl.init_table(
                Table(
                    name=os.path.basename(self.table_path),
                    base_path=self.table_path,
                    table_format=TableFormat.HUDI,
                    read_schema=batch_df.schema,
                )
            )
        if batch_id <= self._last_committed_batch(tl):
            return
        out_dir = os.path.join(self.table_path, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(out_dir)
        inv = build_inventory(
            spark,
            [os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")],
            root=self.table_path,
        )
        tl.commit(
            adds=inv,
            schema=batch_df.schema,
            extra_metadata={
                "onetable.stream.app": self.app_id,
                "onetable.stream.batch": str(batch_id),
            },
        )


_WRITERS = {
    TableFormat.DELTA: DeltaStreamWriter,
    TableFormat.ICEBERG: IcebergStreamWriter,
    TableFormat.HUDI: HudiStreamWriter,
}


def write_stream_to_table(
    stream_df: DataFrame,
    fmt: TableFormat | str,
    table_path: str,
    checkpoint_dir: str,
    app_id: str | None = None,
):
    """Start an available-now streaming write into a native table of ANY
    supported format; returns the StreamingQuery."""
    writer = _WRITERS[TableFormat(fmt)](table_path, app_id=app_id)
    return (
        stream_df.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


class DeltaUpsertStreamWriter(DeltaStreamWriter):
    """foreachBatch UPSERT sink (r12): each micro-batch MERGES into the
    Delta table by key — ``DeltaLog.upsert_by_key`` attaches a deletion
    vector to every existing file holding a row whose key reappears in
    the batch and adds the batch's files, one commit per batch. The
    exactly-once txn action rides that same commit, so a replayed batch
    after restart is skipped before any file is written. This is the
    streaming CDC-ingest shape (late updates keyed by primary key)
    delta-spark serves with MERGE inside foreachBatch."""

    def __init__(self, table_path: str, key_fields, app_id: str | None = None):
        super().__init__(table_path, app_id=app_id)
        self.key_fields = list(key_fields)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        log = DeltaLog(spark, self.table_path)
        if not log.exists():
            log.init_table(
                Table(
                    name=os.path.basename(self.table_path),
                    base_path=self.table_path,
                    table_format=TableFormat.DELTA,
                    read_schema=batch_df.schema,
                    layout=DataLayoutStrategy.FLAT,
                )
            )
        if batch_id <= self.last_committed_batch(log):
            return  # replayed batch after restart — already committed
        out_dir = os.path.join(self.table_path, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(out_dir)
        inv = build_inventory(
            spark,
            [
                os.path.join(out_dir, f)
                for f in os.listdir(out_dir)
                if f.endswith(".parquet")
            ],
            root=self.table_path,
        )
        log.upsert_by_key(
            inv,
            self.key_fields,
            txn={"appId": self.app_id, "version": batch_id},
            operation="STREAMING MERGE",
        )


class IcebergUpsertStreamWriter(IcebergStreamWriter):
    """foreachBatch UPSERT sink (r12): each micro-batch lands as ONE v2
    snapshot carrying an equality-delete file (the batch's keys) plus
    the batch's data files (``IcebergTable.commit_upsert``) — the
    Flink-style CDC-ingest shape. Exactly-once: the committed batch id
    rides the same metadata.json swap as the snapshot (table property
    ``onetable.stream.<appId>``)."""

    def __init__(self, table_path: str, key_fields, app_id: str | None = None):
        super().__init__(table_path, app_id=app_id)
        self.key_fields = list(key_fields)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from onetable_spark.formats.iceberg import IcebergTable

        spark = batch_df.sparkSession
        tbl = IcebergTable(spark, self.table_path)
        if not tbl.exists():
            tbl.init_table(
                Table(
                    name=os.path.basename(self.table_path),
                    base_path=self.table_path,
                    table_format=TableFormat.ICEBERG,
                    read_schema=batch_df.schema,
                ),
                format_version=2,  # equality deletes are a v2 feature
            )
        key = f"onetable.stream.{self.app_id}"
        last = int(tbl.properties().get(key, -1))
        if batch_id <= last:
            return
        out_dir = os.path.join(self.table_path, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(out_dir)
        inv = build_inventory(
            spark,
            [
                os.path.join(out_dir, f)
                for f in os.listdir(out_dir)
                if f.endswith(".parquet")
            ],
            root=self.table_path,
        )
        tbl.commit_upsert(inv, self.key_fields, properties={key: str(batch_id)})


_UPSERT_WRITERS = {
    TableFormat.DELTA: DeltaUpsertStreamWriter,
    TableFormat.ICEBERG: IcebergUpsertStreamWriter,
}


def write_upsert_stream_to_table(
    stream_df: DataFrame,
    fmt: TableFormat | str,
    table_path: str,
    checkpoint_dir: str,
    key_fields,
    app_id: str | None = None,
):
    """Start an available-now streaming UPSERT into a native Delta or
    Iceberg table (per-batch keyed merge — DVs on Delta, equality
    deletes on Iceberg); returns the StreamingQuery."""
    writer = _UPSERT_WRITERS[TableFormat(fmt)](
        table_path, key_fields, app_id=app_id
    )
    return (
        stream_df.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
