"""Distributed parquet file-inventory + footer-stats extraction.

The reference reads per-file column stats either from Hudi's metadata table
or from parquet footers on the driver
(core/.../hudi/HudiFileStatsExtractor.java:87-193). Here footer reading is
a **distributed mapInPandas job**: the file list is a DataFrame, each
executor task opens its batch of footers with pyarrow (no data pages are
read — footer metadata only), and the result lands in FILES_SCHEMA. At
100 TB / millions of files this parallelizes across the cluster instead of
serializing on the driver.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from urllib.parse import unquote

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onetable_spark.session import local_rows_df

from onetable_spark.model import FILES_SCHEMA

HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def list_parquet_files(root: str) -> list[str]:
    """Recursive listing of data files under ``root`` (driver-side walk;
    swap for a distributed lister on object stores with huge listings)."""
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        # skip metadata dirs of any table format living at the same root
        dirnames[:] = [d for d in dirnames if d not in ("_delta_log", ".hoodie", "metadata")]
        for f in filenames:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def partition_values_from_path(
    path: str, root: str, partition_cols: list[str] | None = None
) -> dict[str, str]:
    """Parse partition directories between root and file.

    Mirrors HudiPartitionValuesExtractor.java:47-171: each expected
    partition column consumes one path segment, stripping a hive-style
    ``col=`` prefix when present — so hive-style and DIR_HIERARCHY (bare
    ``value/`` dirs, common for Hudi tables in the wild) parse through the
    same loop, exactly like the reference. Without ``partition_cols``
    (schema unknown), only hive-style segments can be attributed to a
    column; bare values are ignored. ``__HIVE_DEFAULT_PARTITION__`` maps
    to null; values stay strings in the IR."""
    rel = os.path.relpath(os.path.dirname(path), root)
    values: dict[str, str] = {}
    if rel in (".", ""):
        return values
    segs = rel.split(os.sep)
    if partition_cols:
        if len(segs) != len(partition_cols):
            # a mis-placed file would otherwise get a silently-truncated
            # partition map (reference raises through parseValue too:
            # HudiPartitionValuesExtractor "Missing partition value")
            raise ValueError(
                f"{path}: {len(segs)} partition dir(s) under root but "
                f"{len(partition_cols)} partition column(s) declared ({partition_cols})"
            )
        for col, seg in zip(partition_cols, segs):
            if seg.startswith(col + "="):
                seg = seg[len(col) + 1 :]
            values[col] = None if seg == HIVE_DEFAULT_PARTITION else unquote(seg)
        return values
    for seg in segs:
        if "=" in seg:
            k, v = seg.split("=", 1)
            values[k] = None if v == HIVE_DEFAULT_PARTITION else unquote(v)
    return values


def _stats_batches(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: read parquet footers for a batch of paths."""
    import pyarrow.parquet as pq

    for pdf in batch_iter:
        rows = []
        for path, fmt, pv in zip(pdf["path"], pdf["file_format"], pdf["partition_values"]):
            md = pq.read_metadata(path)
            ncols = md.num_columns
            names = [md.schema.column(i).name for i in range(ncols)]
            mins: dict = {n: None for n in names}
            maxs: dict = {n: None for n in names}
            nulls: dict = {n: 0 for n in names}
            sizes: dict = {n: 0 for n in names}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for i in range(ncols):
                    col = g.column(i)
                    n = names[i]
                    sizes[n] += col.total_compressed_size
                    st = col.statistics
                    if st is None:
                        continue
                    if st.has_null_count:
                        nulls[n] += st.null_count
                    if st.has_min_max:
                        try:
                            mn, mx = st.min, st.max
                        except Exception:
                            # pyarrow can't build stat scalars for some
                            # physical types (e.g. FLBA decimals) — stats
                            # are an optimization, never a correctness
                            # input, so leave this column unbounded
                            continue
                        if mins[n] is None or mn < mins[n]:
                            mins[n] = mn
                        if maxs[n] is None or mx > maxs[n]:
                            maxs[n] = mx
            stats = [
                {
                    "field": n,
                    "min_value": None if mins[n] is None else str(mins[n]),
                    "max_value": None if maxs[n] is None else str(maxs[n]),
                    "num_nulls": int(nulls[n]),
                    "num_values": int(md.num_rows),
                    "total_size": int(sizes[n]),
                }
                for n in names
            ]
            stat = os.stat(path)
            rows.append(
                {
                    "path": path,
                    "file_format": fmt,
                    "partition_values": pv,
                    "size": int(stat.st_size),
                    "record_count": int(md.num_rows),
                    "last_modified_millis": int(stat.st_mtime * 1000),
                    "column_stats": stats,
                }
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "path",
                "file_format",
                "partition_values",
                "size",
                "record_count",
                "last_modified_millis",
                "column_stats",
            ],
        )


def build_inventory(
    spark: SparkSession,
    paths: list[str],
    root: str | None = None,
    with_stats: bool = True,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """File list → FILES_SCHEMA DataFrame (distributed footer read).

    ``repartition`` spreads footer I/O across all cores; one task handles
    ~hundreds of footers, so a million-file table is a few thousand tasks.
    """
    if not paths:
        return local_rows_df(spark, [], FILES_SCHEMA)
    rows = [
        {
            "path": p,
            "file_format": "parquet",
            "partition_values": partition_values_from_path(p, root, partition_cols) if root else {},
        }
        for p in paths
    ]
    base = local_rows_df(
        spark,
        rows,
        "path string, file_format string, partition_values map<string,string>",
        slices=len(rows) // 64 + 1,
    )
    if not with_stats:
        return (
            base.withColumn("size", F.lit(None).cast("long"))
            .withColumn("record_count", F.lit(None).cast("long"))
            .withColumn("last_modified_millis", F.lit(None).cast("long"))
            .withColumn("column_stats", F.lit(None).cast(FILES_SCHEMA["column_stats"].dataType))
        )
    # born at ~64 footers per slice — no repartition Exchange (r15)
    return base.mapInPandas(_stats_batches, FILES_SCHEMA)


def inventory_from_directory(
    spark: SparkSession,
    root: str,
    with_stats: bool = True,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Inventory a plain parquet directory (hive-partitioned, or bare
    value-dir DIR_HIERARCHY when ``partition_cols`` names the levels)."""
    return build_inventory(
        spark,
        list_parquet_files(root),
        root=root,
        with_stats=with_stats,
        partition_cols=partition_cols,
    )


def enrich_missing_stats(files: DataFrame, table_path: str | None = None) -> DataFrame:
    """S5 stats-source selection (HudiFileStatsExtractor.java:87-103), in
    preference order:

    1. rows already carrying column stats from the commit metadata pass
       through untouched;
    2. when ``table_path`` has a populated metadata-table ``column_stats``
       partition (gated on hoodie.properties advertising it, like the
       reference's ``isMetadataPartitionAvailable``), missing rows fill
       from that index — a distributed parquet scan + join, zero footer
       I/O for a 100k-file table that already stores its stats;
    3. whatever still has NULL stats pays the distributed footer read.
    """
    have = files.filter(F.col("column_stats").isNotNull())
    missing = files.filter(F.col("column_stats").isNull()).select(
        "path", "file_format", "partition_values"
    )
    if table_path is not None:
        from onetable_spark.formats.hudi_metadata import HudiMetadataTable

        mdt = HudiMetadataTable(files.sparkSession, table_path)
        if mdt.available():
            from pyspark import StorageLevel

            # persisted: both the covered branch and the residual-missing
            # branch read this join — without the persist the index scan
            # plan executes twice
            from_index = mdt.stats_for(missing).persist(StorageLevel.MEMORY_AND_DISK)
            have = have.unionByName(from_index.filter(F.col("column_stats").isNotNull()))
            missing = from_index.filter(F.col("column_stats").isNull()).select(
                "path", "file_format", "partition_values"
            )
    enriched = missing.mapInPandas(_stats_batches, FILES_SCHEMA)
    return have.unionByName(enriched)
