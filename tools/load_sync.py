"""Rerun of the reference's LoadTest scenarios in this engine
(core/src/test/java/io/onetable/loadtest/LoadTest.java:51-130 — the only
performance harness the reference ships; BASELINE.md rows 2-3).

Scenario 1: FULL metadata sync of a table with P partitions × F files per
partition (reference: 1000 × 100) from a synthetic Delta source into
Iceberg + Hudi targets.

Scenario 2: C incremental commits touching P partitions × 1 file each
(reference: 100 commits × 1000 partitions), synced incrementally.

Metadata-plane only — file entries are fabricated inventories (the sync
engine never opens data files), exactly like the reference's load test.

Usage: python tools/load_sync.py [partitions] [files_per_partition] [commits]
Prints one JSON line with wall-clock seconds per scenario.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql import types as T


def fabricate_inventory(spark, root: str, partitions: int, files_per: int, commit: int = 0):
    from onetable_spark.model import FILES_SCHEMA

    n = partitions * files_per
    return (
        spark.range(n)
        .select(
            F.concat(
                F.lit(f"{root}/p="),
                (F.col("id") % partitions).cast("string"),
                F.lit(f"/c{commit}_f"),
                F.col("id").cast("string"),
                F.lit(".parquet"),
            ).alias("path"),
            F.lit("parquet").alias("file_format"),
            F.create_map(F.lit("p"), (F.col("id") % partitions).cast("string")).alias(
                "partition_values"
            ),
            F.lit(1024 * 1024).alias("size"),
            F.lit(1000).alias("record_count"),
            (F.lit(commit) + 1).alias("last_modified_millis"),
            F.lit(None).cast(FILES_SCHEMA["column_stats"].dataType).alias("column_stats"),
        )
    )


class _RssSampler:
    """Background peak-RSS sampler for the mega-commit scenarios.

    tracemalloc sees only Python-object allocations — the r8 Arrow-batched
    commit path keeps its payload in pyarrow C buffers, which tracemalloc
    reports as ~0. Sampling /proc/self/status VmRSS captures the real
    driver-process peak (Python + Arrow; the JVM is a separate process in
    local mode and holds at most a few in-flight Arrow batches)."""

    def __init__(self, interval: float = 0.02) -> None:
        self.interval = interval
        self.base = self.peak = self._read()

    @staticmethod
    def _read() -> int:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
        return 0

    def __enter__(self):
        import threading

        self._stop = threading.Event()

        def run():
            while not self._stop.wait(self.interval):
                self.peak = max(self.peak, self._read())

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()
        self.peak = max(self.peak, self._read())

    @property
    def delta_mb(self) -> float:
        return round((self.peak - self.base) / 1e6, 1)


def main() -> None:
    partitions = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    files_per = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    commits = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.model import Table, TableFormat
    from onetable_spark.session import get_spark
    from onetable_spark.sync import SyncClient, source_for, target_for

    spark = get_spark("load-sync")
    root = tempfile.mkdtemp(prefix="otb_load_")
    try:
        schema = T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("p", T.IntegerType())]
        )
        log = DeltaLog(spark, root)
        log.init_table(
            Table(
                name="load",
                base_path=root,
                table_format=TableFormat.DELTA,
                read_schema=schema,
            )
        )
        log.commit(adds=fabricate_inventory(spark, root, partitions, files_per))

        client = SyncClient(spark)
        source = source_for(spark, TableFormat.DELTA, root)
        targets = [
            target_for(spark, TableFormat.ICEBERG, root),
            target_for(spark, TableFormat.HUDI, root),
        ]

        t0 = time.perf_counter()
        r = client.sync(source, targets)
        full_s = round(time.perf_counter() - t0, 2)
        assert all(x.status.value == "SUCCESS" for x in r.values()), r

        t0 = time.perf_counter()
        for c in range(1, commits + 1):
            time.sleep(0.01)  # distinct commit timestamps
            log.commit(adds=fabricate_inventory(spark, root, partitions, 1, commit=c))
            r = client.sync(source, targets)
            assert all(x.status.value == "SUCCESS" for x in r.values()), r
        incr_s = round(time.perf_counter() - t0, 2)

        # Scenario 3: partition-scoped overwrite — remove ONE incremental
        # commit's files (~1/commits of recent data, one dirty manifest)
        # directly against the Iceberg table; with manifest carry-forward
        # this commits O(changed), not O(table).
        from onetable_spark.formats.avro_codec import read_container
        from onetable_spark.formats.iceberg import IcebergTable

        itbl = IcebergTable(spark, root)
        _, manifests_before = read_container(
            itbl.current_snapshot_meta(itbl.metadata())["manifest-list"]
        )
        removes = fabricate_inventory(spark, root, partitions, 1, commit=commits // 2)
        t0 = time.perf_counter()
        itbl.commit_overwrite(removes=removes)
        scoped_s = round(time.perf_counter() - t0, 2)
        _, manifests_after = read_container(
            itbl.current_snapshot_meta(itbl.metadata())["manifest-list"]
        )
        carried = len(
            {m["manifest_path"] for m in manifests_before}
            & {m["manifest_path"] for m in manifests_after}
        )

        # Scenario 4 (round 6): FORCED compaction/rewrite — a schema-change
        # commit takes the rewrite path, which now writes the carried live
        # set as executor-side manifest shards; the driver holds one stats
        # row per shard instead of O(table) entries.
        evolved = T.StructType(list(schema.fields) + [T.StructField("note", T.StringType())])
        t0 = time.perf_counter()
        itbl.commit_overwrite(
            adds=fabricate_inventory(spark, root, partitions, 1, commit=commits + 1),
            schema=evolved,
        )
        rewrite_s = round(time.perf_counter() - t0, 2)
        _, manifests_rw = read_container(
            itbl.current_snapshot_meta(itbl.metadata())["manifest-list"]
        )
        live_after_rewrite = itbl.snapshot_files().count()

        # Scenario 5 (r7, extended to 1M in r8): MEGA-COMMIT memory
        # profile — ONE commit carrying a million files (10× the
        # reference's LoadTest table) through each commit plane. The r8
        # Arrow-batched payload builds (model.iter_inventory_rows) keep
        # the Python-object footprint at O(batch); the real driver peak
        # (Python + Arrow C buffers) is captured by the RSS sampler.
        # tracemalloc is deliberately NOT used here: instrumenting every
        # Python allocation slows the million-row dict/json stream ~8×
        # (measured 20.6 s → 161.5 s for the Delta plane), so it would
        # corrupt the TIME metric; RSS is the honest memory number anyway.
        mega_root = tempfile.mkdtemp(prefix="otb_mega_")
        mega_log = DeltaLog(spark, mega_root)
        mega_log.init_table(
            Table(
                name="mega",
                base_path=mega_root,
                table_format=TableFormat.DELTA,
                read_schema=schema,
            )
        )
        mega_files_target = 1_000_000
        mega_inv = fabricate_inventory(spark, mega_root, 1000, mega_files_target // 1000)
        t0 = time.perf_counter()
        with _RssSampler() as rss_delta:
            mega_log.commit(adds=mega_inv)
        mega_s = round(time.perf_counter() - t0, 2)
        mega_files = mega_log.snapshot_files().count()
        assert mega_files == mega_files_target, mega_files

        # same mega commit through the OTHER two commit planes (Iceberg
        # manifests stream through the multi-block avro writer; Hudi's
        # write-stats dicts stream through json.dump)
        from onetable_spark.formats.hudi import HudiTimeline

        mega_ice = IcebergTable(spark, mega_root)
        mega_ice.init_table(
            Table(
                name="mega",
                base_path=mega_root,
                table_format=TableFormat.ICEBERG,
                read_schema=schema,
            )
        )
        t0 = time.perf_counter()
        with _RssSampler() as rss_ice:
            mega_ice.commit_overwrite(adds=mega_inv)
        mega_ice_s = round(time.perf_counter() - t0, 2)
        assert mega_ice.snapshot_files().count() == mega_files_target

        mega_hudi = HudiTimeline(spark, mega_root)
        mega_hudi.init_table(
            Table(
                name="mega",
                base_path=mega_root,
                table_format=TableFormat.HUDI,
                read_schema=schema,
            )
        )
        t0 = time.perf_counter()
        with _RssSampler() as rss_hudi:
            mega_hudi.commit(adds=mega_inv)
        mega_hudi_s = round(time.perf_counter() - t0, 2)
        assert mega_hudi.snapshot_files().count() == mega_files_target
        shutil.rmtree(mega_root, ignore_errors=True)

        print(
            json.dumps(
                {
                    "scenario_full_sync_sec": full_s,
                    "scenario_mega_commit_sec": mega_s,
                    "mega_commit_files": mega_files,
                    "mega_commit_rss_delta_mb": rss_delta.delta_mb,
                    "mega_commit_iceberg_sec": mega_ice_s,
                    "mega_commit_iceberg_rss_delta_mb": rss_ice.delta_mb,
                    "mega_commit_hudi_sec": mega_hudi_s,
                    "mega_commit_hudi_rss_delta_mb": rss_hudi.delta_mb,
                    "scenario_incremental_sec": incr_s,
                    "scenario_scoped_overwrite_sec": scoped_s,
                    "scenario_forced_rewrite_sec": rewrite_s,
                    "forced_rewrite_manifests": len(manifests_rw),
                    "forced_rewrite_live_files": live_after_rewrite,
                    "scoped_overwrite_manifests_carried": carried,
                    "scoped_overwrite_manifests_total": len(manifests_before),
                    "partitions": partitions,
                    "files_per_partition": files_per,
                    "commits": commits,
                    "files_full": partitions * files_per,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        try:
            shutil.rmtree(f"{root}_iceberg", ignore_errors=True)
        except Exception:
            pass


if __name__ == "__main__":
    main()
