"""Hudi metadata-table ``column_stats`` partition (S5 preferred branch).

The reference prefers metadata-table column stats over parquet footers
whenever the table config advertises the partition
(``HudiFileStatsExtractor.java:87-103`` gating on
``isMetadataPartitionAvailable(COLUMN_STATS)``) — a 100k-file table with
col-stats populated should never re-derive what the table already
stores. This module implements that branch Spark-first:

- the partition lives at ``.hoodie/metadata/column_stats/`` as PARQUET
  base files (Hudi's metadata table supports multiple base formats; we
  pick the one every engine can scan distributed — real Hudi's default
  HFile base files would need the HBase codec and are out of scope, and
  ``available()`` only fires when parquet files are actually present);
- availability is gated on ``hoodie.table.metadata.partitions`` listing
  ``column_stats`` in hoodie.properties, exactly like the reference;
- one row per (file_name, column): min/max as strings (the IR's
  convention for path- and stats-derived values), null/value counts,
  record count — the same fields HoodieMetadataColumnStats carries;
- reads are plain distributed parquet scans + a broadcast-friendly join
  on file_name; no footer I/O.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METADATA_PARTITIONS_KEY = "hoodie.table.metadata.partitions"
COLUMN_STATS_PARTITION = "column_stats"

STATS_ROW_SCHEMA = (
    "rel_path string, column_name string, min_value string, max_value string, "
    "null_count long, value_count long, total_size long, record_count long, "
    "file_size long, last_modified_millis long"
)


class HudiMetadataTable:
    """Reader/writer for the col-stats partition of a table's metadata."""

    def __init__(self, spark: SparkSession, table_path: str):
        self.spark = spark
        self.table_path = table_path
        self.partition_dir = os.path.join(table_path, ".hoodie", "metadata", COLUMN_STATS_PARTITION)
        self.props_path = os.path.join(table_path, ".hoodie", "hoodie.properties")

    # ------------------------------------------------------------ properties

    def _read_props(self) -> dict[str, str]:
        props: dict[str, str] = {}
        if os.path.exists(self.props_path):
            with open(self.props_path) as f:
                for line in f:
                    line = line.strip()
                    if line and not line.startswith("#") and "=" in line:
                        k, v = line.split("=", 1)
                        props[k] = v
        return props

    def available(self) -> bool:
        """Reference parity: the col-stats branch fires only when the table
        config advertises the partition AND readable files exist."""
        parts = self._read_props().get(METADATA_PARTITIONS_KEY, "")
        if COLUMN_STATS_PARTITION not in [p.strip() for p in parts.split(",") if p.strip()]:
            return False
        data_dir = self._data_dir()
        if data_dir is None:
            return False
        return any(f.endswith(".parquet") for f in os.listdir(data_dir))

    # ------------------------------------------------- versioned partition

    def _data_dir(self) -> str | None:
        """Resolve the CURRENT data directory: the ``_CURRENT`` pointer
        names a versioned subdir (``v_000042``); a partition written by a
        pre-pointer version of this module keeps its flat parquet layout
        readable until the next upsert migrates it."""
        ptr = os.path.join(self.partition_dir, "_CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as f:
                name = f.read().strip()
            d = os.path.join(self.partition_dir, name)
            if os.path.isdir(d):
                return d
        if os.path.isdir(self.partition_dir):
            return self.partition_dir
        return None

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.partition_dir):
            return []
        out = []
        for n in os.listdir(self.partition_dir):
            if n.startswith("v_") and n[2:].isdigit() and os.path.isdir(
                os.path.join(self.partition_dir, n)
            ):
                out.append(int(n[2:]))
        return sorted(out)

    def _acquire_lock(self, timeout: float = 30.0, stale_after: float = 300.0) -> str:
        """O_EXCL lock file serializing index rewrites — the same
        create-if-absent primitive as ``HudiTimeline._claim_instant``.
        Two concurrent commits both upserting the index re-merge under
        the lock, so neither's rows are lost. A lock older than
        ``stale_after`` (crashed writer) is broken and re-claimed."""
        lock = self.partition_dir + ".lock"
        os.makedirs(os.path.dirname(lock), exist_ok=True)
        deadline = time.monotonic() + timeout
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return lock
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(lock) > stale_after:
                        os.unlink(lock)  # crashed holder; re-claim via O_EXCL
                        continue
                except OSError:
                    pass  # holder released between the check and the stat
                if time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"could not acquire column_stats lock {lock} within {timeout}s"
                    )
                time.sleep(0.05)

    def _advertise(self) -> None:
        """Add column_stats to hoodie.table.metadata.partitions (atomic)."""
        props = self._read_props()
        parts = [p.strip() for p in props.get(METADATA_PARTITIONS_KEY, "").split(",") if p.strip()]
        if COLUMN_STATS_PARTITION in parts:
            return
        parts.append(COLUMN_STATS_PARTITION)
        props[METADATA_PARTITIONS_KEY] = ",".join(parts)
        tmp = self.props_path + ".tmp"
        with open(tmp, "w") as f:
            for k in sorted(props):
                f.write(f"{k}={props[k]}\n")
        os.replace(tmp, self.props_path)

    # ----------------------------------------------------------------- write

    def _rel_path(self):
        """Table-root-relative path — basenames alone collide across
        partitions (two ``part-00042-….parquet`` under different
        ``day=…`` dirs are distinct files)."""
        prefix = self.table_path.rstrip("/") + "/"
        return F.when(
            F.col("path").startswith(prefix),
            F.expr(f"substring(path, {len(prefix) + 1})"),
        ).otherwise(F.col("path"))

    def upsert_from_files(self, files: DataFrame) -> None:
        """Index a FILES_SCHEMA DataFrame's column stats into the partition.

        One distributed write: files explode to (file, column) rows; the
        merge with pre-existing index rows keys on (rel_path, column_name)
        with new rows winning — Hudi metadata-table upsert semantics. The
        shuffle carries stats rows (strings + longs), never file contents.

        Concurrency: the read-merge-publish cycle runs under an O_EXCL
        lock (two committers both re-merge; neither's rows are lost) and
        publishes by writing a NEW versioned subdir then atomically
        replacing the ``_CURRENT`` pointer — readers see the old or the
        new index, never a missing directory; the immediately-previous
        version is retained one generation so in-flight scans finish."""
        new_rows = files.select(
            self._rel_path().alias("rel_path"),
            F.col("record_count"),
            F.col("size").alias("file_size"),
            F.col("last_modified_millis"),
            F.explode("column_stats").alias("cs"),
        ).select(
            "rel_path",
            F.col("cs.field").alias("column_name"),
            F.col("cs.min_value").alias("min_value"),
            F.col("cs.max_value").alias("max_value"),
            F.col("cs.num_nulls").cast("long").alias("null_count"),
            F.col("cs.num_values").cast("long").alias("value_count"),
            F.col("cs.total_size").cast("long").alias("total_size"),
            "record_count",
            "file_size",
            "last_modified_millis",
        )
        lock = self._acquire_lock()
        try:
            # resolve + read the prior index INSIDE the lock: a concurrent
            # commit that published between our plan and our lock is merged,
            # not overwritten (lost-update fix)
            data_dir = self._data_dir()
            if data_dir is not None and any(
                f.endswith(".parquet") for f in os.listdir(data_dir)
            ):
                prior = self.spark.read.schema(STATS_ROW_SCHEMA).parquet(data_dir)
                merged = new_rows.unionByName(
                    prior.join(
                        new_rows.select("rel_path").distinct(), "rel_path", "left_anti"
                    )
                )
            else:
                merged = new_rows
            versions = self._versions()
            new_v = (versions[-1] + 1) if versions else 1
            vdir = os.path.join(self.partition_dir, f"v_{new_v:06d}")
            merged.write.mode("overwrite").parquet(vdir)
            tmp = os.path.join(self.partition_dir, "_CURRENT.tmp")
            with open(tmp, "w") as f:
                f.write(f"v_{new_v:06d}")
            os.replace(tmp, os.path.join(self.partition_dir, "_CURRENT"))
            # retire: keep the new version plus the one just replaced (an
            # in-flight reader may still be scanning it); drop older ones
            # and any legacy flat-layout files superseded by the pointer
            keep = {new_v} | ({versions[-1]} if versions else set())
            for v in versions:
                if v not in keep:
                    shutil.rmtree(
                        os.path.join(self.partition_dir, f"v_{v:06d}"),
                        ignore_errors=True,
                    )
            if data_dir == self.partition_dir:
                for n in os.listdir(self.partition_dir):
                    if n.endswith(".parquet") or n == "_SUCCESS":
                        try:
                            os.unlink(os.path.join(self.partition_dir, n))
                        except OSError:
                            pass
            self._advertise()
        finally:
            os.unlink(lock)

    # ------------------------------------------------------------------ read

    def stats_for(self, files: DataFrame) -> DataFrame:
        """Join the index onto a (path, file_format, partition_values)
        DataFrame → FILES_SCHEMA rows with column_stats filled from the
        metadata table. Files absent from the index keep NULL stats (the
        caller's footer fallback picks them up)."""
        idx = (
            self.spark.read.schema(STATS_ROW_SCHEMA)
            .parquet(self._data_dir() or self.partition_dir)
            .groupBy("rel_path")
            .agg(
                F.max("record_count").alias("record_count"),
                F.max("file_size").alias("size"),
                F.max("last_modified_millis").alias("last_modified_millis"),
                F.collect_list(
                    F.struct(
                        F.col("column_name").alias("field"),
                        "min_value",
                        "max_value",
                        "null_count",
                        "value_count",
                        "total_size",
                    )
                ).alias("column_stats"),
            )
        )
        keyed = files.withColumn("rel_path", self._rel_path())
        return keyed.join(idx, "rel_path", "left").select(
            "path",
            "file_format",
            "partition_values",
            F.col("size"),
            F.col("record_count"),
            F.col("last_modified_millis"),
            F.when(
                F.col("column_stats").isNotNull(),
                F.transform(
                    "column_stats",
                    lambda s: F.struct(
                        s["field"].alias("field"),
                        s["min_value"].alias("min_value"),
                        s["max_value"].alias("max_value"),
                        s["null_count"].alias("num_nulls"),
                        s["value_count"].alias("num_values"),
                        s["total_size"].alias("total_size"),
                    ),
                ),
            ).alias("column_stats"),
        )
