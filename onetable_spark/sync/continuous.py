"""Continuous sync: the reference's RunSync batch loop as a streaming service.

The reference syncs on demand — `utilities/.../RunSync.java` is executed
from cron, re-extracting changes since `lastSyncedInstant` each run. Here
the CDC stream over the source's own log (streaming/cdc.py) TRIGGERS the
same incremental `SyncClient.sync()` the moment a commit lands: Structured
Streaming's checkpoint makes the trigger exactly-once per commit file, and
the sync itself is idempotent under the target watermarks (sync/client.py
prunes instants ≤ `last_instant_synced_millis`), so the composition is
safe under at-least-once delivery, restarts, and concurrent manual syncs.

Design for scale: the stream watches the METADATA plane (a commit file per
micro-batch, not table data), so the service's steady-state cost is one
log-directory listing per trigger interval plus the incremental sync work
itself — identical to what the reference's cron pays per run, minus the
full-snapshot re-extraction it pays when the cron interval drifts.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from onetable_spark.model import TableFormat
from onetable_spark.sync.client import SyncClient, source_for, target_for


@dataclass
class ContinuousSync:
    """Watch one source table (any of the three formats) and keep N
    targets in sync.

    ``run_available_now()`` drains pending commits and returns (the cron
    replacement for tests and backfills); ``start(interval)`` runs as a
    long-lived service. Both share the checkpoint, so a backfill drain and
    the service resume from each other.

    The stream is only a TRIGGER: every sync replays "everything since the
    target watermarks", never the batch contents. Transient sync errors
    retry in-batch (``max_sync_attempts``); if they exhaust, the error is
    journaled and RE-RAISED so the micro-batch never checkpoints — a
    consumed trigger would strand the commit until an unrelated later one,
    whereas failing the query lets a restart from the same checkpoint
    replay this exact trigger (the cron this replaces retries every run).
    """

    spark: SparkSession
    table_path: str
    target_formats: tuple[TableFormat, ...]
    checkpoint_dir: str
    source_format: TableFormat = TableFormat.DELTA
    validate: bool = False
    #: journal retention — a long-lived service (30 s triggers ≈ 1M/year)
    #: must not accrete driver memory per trigger, so the journal is a ring
    #: of the most recent entries; lifetime totals live in the counters
    journal_maxlen: int = 256
    # driver-side journal of the MOST RECENT per-trigger sync outcomes
    # (deque(maxlen=journal_maxlen) built in __post_init__ — bounded for
    # the lifetime of the service, not just per batch)
    journal: deque[dict] = field(default_factory=deque)
    #: lifetime counters — O(1) state that survives journal eviction
    triggers_total: int = 0
    syncs_ok: int = 0
    sync_errors: int = 0

    #: in-batch retries before the trigger is surfaced as a failure
    max_sync_attempts = 3

    def __post_init__(self) -> None:
        # rebind with the configured bound (dataclass default_factory can't
        # see journal_maxlen); preserves any entries passed in by callers
        self.journal = deque(self.journal, maxlen=self.journal_maxlen)

    def _sync_once(self, n_commits: int) -> None:
        """Retry/journal wrapper around ``_action`` — the contract every
        subclass action inherits: transient errors retry in-batch, an
        exhausted trigger is journaled AND re-raised so the micro-batch
        never checkpoints (the trigger replays on restart)."""
        self.triggers_total += 1
        last_err: Exception | None = None
        for attempt in range(self.max_sync_attempts):
            try:
                self.journal.append(self._action(n_commits))
                self.syncs_ok += 1
                return
            except Exception as e:  # noqa: BLE001 — transient sync errors
                # (CAS contention with a racing manual sync, FS hiccups)
                # retry within the batch
                last_err = e
                import time as _time

                _time.sleep(0.1 * (attempt + 1))
        # exhausted: journal AND re-raise so the micro-batch does NOT
        # checkpoint — consuming the trigger here would strand the commit
        # until an unrelated future commit lands (the cron it replaces
        # retries on every run; failing the query is our equivalent, and
        # a restart from the same checkpoint replays this exact trigger)
        self.journal.append({"n_commits": n_commits, "error": str(last_err)})
        self.sync_errors += 1
        raise last_err

    def _action(self, n_commits: int) -> dict:
        """One triggered unit of work; returns the journal entry."""
        from onetable_spark.cli import _target_reader
        from onetable_spark.sync.validation import SnapshotReaderAdapter, SyncValidator

        entry: dict = {"n_commits": n_commits, "results": {}}
        client = SyncClient(self.spark)
        source = source_for(self.spark, self.source_format, self.table_path)
        targets = [
            target_for(self.spark, fmt, self.table_path) for fmt in self.target_formats
        ]
        results = client.sync(source, targets)
        target_by_fmt = {t.table_format: t for t in targets}
        for fmt, r in results.items():
            status = r.status.value
            if self.validate and status == "SUCCESS":
                checks = SyncValidator().validate(
                    SnapshotReaderAdapter(source), _target_reader(target_by_fmt[fmt])
                )
                if not all(v.success for v in checks.values()):
                    status = "VALIDATION_FAILED"
            entry["results"][fmt.value] = (status, r.mode.value)
        return entry

    def _foreach_batch(self, batch_df, _batch_id) -> None:
        # driver-ok: bounded single-row aggregate — the trigger needs only
        # "how many commits landed", not the actions themselves (a marker
        # file surfaces as one row per text line)
        n = batch_df.select("commit_ref").distinct().count()
        if n:
            self._sync_once(n)

    def _stream(self):
        from onetable_spark.streaming.cdc import (
            read_commit_marker_stream,
            read_hudi_commit_stream,
            read_iceberg_metadata_stream,
        )

        if self.source_format is TableFormat.HUDI:
            return read_hudi_commit_stream(self.spark, self.table_path)
        if self.source_format is TableFormat.ICEBERG:
            return read_iceberg_metadata_stream(self.spark, self.table_path)
        # Delta watches the RAW commit markers, not the filtered add/remove
        # feed (streaming/cdc.read_delta_log_stream): a schema-change
        # commit carries only a metaData action, which the data feed
        # filters to zero rows — it must still trigger a sync
        return read_commit_marker_stream(
            self.spark, self.table_path.rstrip("/") + "/_delta_log", "[0-9]*.json"
        )

    def _writer(self):
        return (
            self._stream()
            .writeStream.foreachBatch(self._foreach_batch)
            .outputMode("append")
            .option("checkpointLocation", self.checkpoint_dir)
        )

    def run_available_now(self) -> list[dict]:
        """Drain all pending commits, sync, and stop. Returns a LIST copy
        of the journal ring (the most recent ``journal_maxlen`` entries;
        lifetime totals live in the counters)."""
        q = self._writer().trigger(availableNow=True).start()
        q.awaitTermination()
        return list(self.journal)

    def start(self, interval: str = "30 seconds"):
        """Long-lived service: sync whenever new commits appear."""
        return self._writer().trigger(processingTime=interval).start()


@dataclass
class AutoVacuum(ContinuousSync):
    """Standing orphan-file cleanup: the same commit-marker trigger, but
    the action is ``vacuum_table`` on the watched table — the scheduled
    VACUUM job every real lakehouse deployment pairs with its OPTIMIZE.
    Push-driven by the table's own commit log: failed/abandoned writer
    files age past ``retention_hours`` and the next landed commit sweeps
    them. Self-quenching by construction (vacuum deletes data files, never
    writes a commit, so it cannot re-trigger itself). Journal entries
    carry per-status counts; errors follow the base trigger contract."""

    retention_hours: float = 168.0

    def _action(self, n_commits: int) -> dict:
        from pyspark.sql import functions as F

        from onetable_spark.operators.maintenance import vacuum_table

        counts = (
            vacuum_table(
                self.spark,
                self.source_format,
                self.table_path,
                retention_hours=self.retention_hours,
            )
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            # driver-ok: at most three status rows
            .collect()
        )
        entry: dict = {"n_commits": n_commits}
        entry.update({r["status"]: r["n"] for r in counts})
        return entry


@dataclass
class AutoOptimize(ContinuousSync):
    """Auto-compaction service: the same commit-marker trigger, but the
    action is ``compact_table`` on the watched table itself (instead of a
    cross-format sync) — the standing OPTIMIZE job every real lakehouse
    deployment schedules, here push-driven by the table's own commit log.

    Fires only when some partition holds at least ``min_small_files``
    small files — the precondition for any bin to form — computed as one
    metadata aggregate per trigger, no data read. Below the gate (healthy
    table, or smalls scattered one-per-partition) a trigger costs exactly
    that one snapshot aggregate and nothing else; above it, the trigger
    pays compact_table's planning pass (metadata-only) plus the rewrites
    it actually commits. The compaction commit itself lands on the watched
    log and re-triggers one evaluation, which finds merged-or-singleton
    files and falls back below the gate — self-quenching, not
    self-amplifying. ``max_bins_per_run`` bounds each run the way
    compact_table's ``max_bins`` documents. Errors follow the base-class
    trigger contract: in-batch retries, then journal + re-raise so the
    trigger replays on restart.
    """

    target_bytes: int = 128 * 1024 * 1024
    min_small_files: int = 8
    max_bins_per_run: int | None = None

    def _action(self, n_commits: int) -> dict:
        from pyspark.sql import functions as F

        from onetable_spark.operators.maintenance import (
            compact_table,
            hive_partition_path,
            reader_for,
        )

        reader = reader_for(self.spark, self.source_format, self.table_path)
        files = reader.snapshot_files()
        entry: dict = {"n_commits": n_commits}
        # the gate mirrors compact_table's binning precondition: a bin can
        # only form where ONE partition holds >= min_small_files smalls
        # driver-ok: single-row metadata aggregate (max per-partition count)
        gate = (
            files.where(F.col("size").cast("long") < self.target_bytes)
            .groupBy(hive_partition_path())
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.coalesce(F.max("n"), F.lit(0)).alias("m"))
            .first()["m"]
        )
        entry["max_partition_small_files"] = int(gate)
        if gate >= self.min_small_files:
            entry.update(
                compact_table(
                    self.spark,
                    self.source_format,
                    self.table_path,
                    target_bytes=self.target_bytes,
                    min_files=self.min_small_files,
                    max_bins=self.max_bins_per_run,
                    reader=reader,
                    files=files,
                )
            )
        return entry
