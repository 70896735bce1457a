"""Data-plane writers: partitioned/bucketed parquet writes that realize the
IR's layout strategy and partition transforms (SURVEY §1.1
DataLayoutStrategy + OnePartitionField rows).

Scale notes baked into the defaults:

- **transform columns are derived, then dropped from the data** —
  Spark's hive-style layout carries partition values in the directory
  path, so the transformed column is never duplicated inside the files;
- **write-side repartition on the partition columns** keeps one task per
  output partition slice (no tiny-files explosion from every task writing
  every partition), with ``maxRecordsPerFile`` bounding file size instead
  of task count;
- **bucketed writes** (`write_bucketed`) pre-shuffle by the bucket key so
  later joins/aggs on that key are exchange-free (Spark bucketing needs a
  table catalog — saveAsTable — matching the reference's Hudi file-group
  concept).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onetable_spark.model.core import DataLayoutStrategy, PartitionField
from onetable_spark.schema.partitions import transform_column


def with_partition_columns(df: DataFrame, partition_fields: list[PartitionField]) -> DataFrame:
    """Attach the derived physical partition columns (generated-column
    semantics, DeltaPartitionExtractor.java:227-248)."""
    out = df
    for pf in partition_fields:
        out = out.withColumn(pf.name, transform_column(pf))
    return out


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_fields: list[PartitionField],
    layout: DataLayoutStrategy = DataLayoutStrategy.HIVE_STYLE_PARTITION,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write parquet with the IR layout strategy.

    HIVE_STYLE_PARTITION → Spark's native ``partitionBy`` (col=value dirs).
    DIR_HIERARCHY_PARTITION_VALUES → bare ``value/`` dirs (the reference's
    first-class Hudi layout, DataLayoutStrategy.java:29-36): the write
    runs through the same distributed ``partitionBy`` plan, then the
    driver strips the ``col=`` prefixes with one rename per partition
    directory — a metadata-scale operation (#partitions, not #files or
    #rows). Reading such a table back requires naming the levels:
    ``inventory_from_directory(..., partition_cols=[...])`` or the source
    schema's declared partition fields — Spark's own partition discovery
    only understands hive-style.
    FLAT → no partitioning.
    """
    writer_df = with_partition_columns(df, partition_fields)
    names = [pf.name for pf in partition_fields]
    if names and layout in (
        DataLayoutStrategy.HIVE_STYLE_PARTITION,
        DataLayoutStrategy.DIR_HIERARCHY_PARTITION_VALUES,
    ):
        # one task per partition slice → no NxM small files
        writer_df = writer_df.repartition(*[F.col(n) for n in names])
        (
            writer_df.write.mode(mode)
            .option("maxRecordsPerFile", max_records_per_file)
            .partitionBy(*names)
            .parquet(path)
        )
        if layout is DataLayoutStrategy.DIR_HIERARCHY_PARTITION_VALUES:
            _strip_hive_prefixes(path, names)
    else:
        writer_df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file).parquet(path)


def _strip_hive_prefixes(root: str, names: list[str], level: int = 0) -> None:
    """Rename ``col=value`` partition dirs to bare ``value`` dirs, one
    level per partition column (driver-side: one rename per partition
    directory; the data files never move). When the bare dir already
    exists (append mode over a partition value written before), the fresh
    dir's entries are MOVED INTO it instead — a plain rename would raise
    ENOTEMPTY and strand the table in a half-stripped mixed layout."""
    import os

    if level >= len(names):
        return
    prefix = names[level] + "="
    for d in sorted(os.listdir(root)):
        full = os.path.join(root, d)
        if os.path.isdir(full) and d.startswith(prefix):
            target = os.path.join(root, d[len(prefix) :])
            _merge_move(full, target)
            _strip_hive_prefixes(target, names, level + 1)


def _merge_move(src: str, dst: str) -> None:
    """Recursive directory move that merges into an existing destination
    (task-file names carry UUIDs, so file-level collisions don't occur)."""
    import os

    if not os.path.isdir(dst):
        os.rename(src, dst)
        return
    for child in os.listdir(src):
        _merge_move(os.path.join(src, child), os.path.join(dst, child))
    os.rmdir(src)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on ``bucket_col`` between
    tables bucketed the same way run with NO exchange (the co-located join
    play from SURVEY §7-M6 scale notes)."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)
