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
from pyspark.sql import types as T

from onetable_spark.model.core import DataLayoutStrategy, PartitionField
from onetable_spark.schema.partitions import transform_column

#: Spark's native parquet field-id metadata key: when present on a
#: StructField and ``spark.sql.parquet.fieldId.write.enabled`` is on (the
#: default), the parquet writer stamps the id into the file schema — the
#: Spark-first equivalent of the reference's custom write support
#: (hudi-support/.../HoodieAvroWriteSupportWithFieldIds.java), which wraps
#: parquet-avro to inject Iceberg-style ids at Hudi write time.
PARQUET_FIELD_ID = "parquet.field.id"


def stamp_parquet_field_ids(schema: T.StructType) -> tuple[T.StructType, bool]:
    """Copy IR ``fieldId`` metadata (IdTracker / Delta column-mapping
    provenance) into Spark's ``parquet.field.id`` key on every struct
    field, recursively. Returns (stamped schema, anything changed).

    Ids land on named struct fields at every nesting level — the same
    coverage parquet's own field-id attribute has (list/map *entries* have
    no StructField to carry metadata, matching Spark's native support)."""

    changed = False

    def walk_type(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.StructType):
            return walk_struct(dt)
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(walk_type(dt.elementType), dt.containsNull)
        if isinstance(dt, T.MapType):
            return T.MapType(walk_type(dt.keyType), walk_type(dt.valueType), dt.valueContainsNull)
        return dt

    def walk_struct(st: T.StructType) -> T.StructType:
        nonlocal changed
        fields = []
        for f in st.fields:
            md = dict(f.metadata or {})
            if "fieldId" in md and PARQUET_FIELD_ID not in md:
                md[PARQUET_FIELD_ID] = int(md["fieldId"])
                changed = True
            fields.append(T.StructField(f.name, walk_type(f.dataType), f.nullable, md))
        return T.StructType(fields)

    return walk_struct(schema), changed


def with_field_id_stamping(df: DataFrame) -> DataFrame:
    """Return ``df`` with parquet field-id metadata derived from its IR
    ``fieldId`` metadata (no-op when the schema carries no ids). Purely a
    metadata projection — the plan is untouched."""
    stamped, changed = stamp_parquet_field_ids(df.schema)
    return df.to(stamped) if changed else df


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
    writer_df = with_field_id_stamping(with_partition_columns(df, partition_fields))
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
    w = with_field_id_stamping(df).write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)
