"""Streaming ingestion INTO the native Delta plane: a ``foreachBatch``
sink that writes each micro-batch as parquet files and commits them to
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
