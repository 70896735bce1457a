"""Tests for the partitioned/bucketed data-plane writers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from onetable_spark.model.core import DataLayoutStrategy, PartitionField, PartitionTransform
from onetable_spark.sinks.writer import with_partition_columns, write_bucketed, write_partitioned
from onetable_spark.session import load_table


def test_write_hive_partitioned_roundtrip(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "by_day")
    pf = PartitionField("ts", PartitionTransform.DAY, "day")
    write_partitioned(events, out, [pf])
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert "day" in back.columns  # partition column discovered from dirs
    # partition pruning: a day filter touches one partition only
    one_day = back.select("day").first()["day"]
    pruned = back.filter(F.col("day") == one_day)
    assert 0 < pruned.count() < back.count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_transform_columns_values(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 3, 5, 7, 0, 0),)], "ts timestamp"
    )
    out = with_partition_columns(
        df,
        [
            PartitionField("ts", PartitionTransform.YEAR, "y"),
            PartitionField("ts", PartitionTransform.MONTH, "m"),
            PartitionField("ts", PartitionTransform.DAY, "d"),
            PartitionField("ts", PartitionTransform.HOUR, "h"),
        ],
    ).first()
    assert (out["y"], out["m"], out["d"], out["h"]) == (
        "2024", "2024-03", "2024-03-05", "2024-03-05-07"
    )


def test_dir_hierarchy_write_and_inventory_matches_hive(spark, sf_dir, tmp_path):
    """DIR_HIERARCHY (bare value dirs, reference DataLayoutStrategy.java:
    29-36) writes the same data as hive-style and inventories to the same
    partition values — only the directory names differ."""
    import os

    from onetable_spark.sources.parquet_inventory import inventory_from_directory

    events = load_table(spark, sf_dir, "events")
    hive_out = str(tmp_path / "hive")
    bare_out = str(tmp_path / "bare")
    pf = PartitionField("ts", PartitionTransform.DAY, "day")
    write_partitioned(events, hive_out, [pf])
    write_partitioned(
        events, bare_out, [pf], layout=DataLayoutStrategy.DIR_HIERARCHY_PARTITION_VALUES
    )
    # bare layout: no col= prefix anywhere
    subdirs = [d for d in os.listdir(bare_out) if os.path.isdir(os.path.join(bare_out, d))]
    assert subdirs and all("=" not in d for d in subdirs)
    inv_hive = inventory_from_directory(spark, hive_out, partition_cols=["day"])
    inv_bare = inventory_from_directory(spark, bare_out, partition_cols=["day"])
    h = sorted(
        (r["partition_values"]["day"], r["record_count"]) for r in inv_hive.collect()
    )
    b = sorted(
        (r["partition_values"]["day"], r["record_count"]) for r in inv_bare.collect()
    )
    assert h == b and len(h) > 1


def test_dir_hierarchy_source_syncs_to_all_targets(spark, sf_dir, tmp_path):
    """Sync-matrix over a non-hive-layout table: a bare value-dir parquet
    source lands in Delta, Iceberg, and Hudi with per-partition file
    inventories intact."""
    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import TableFormat
    from onetable_spark.sync import SyncClient, source_for, target_for

    base = str(tmp_path / "bare_tbl")
    events = load_table(spark, sf_dir, "events").limit(2000)
    pf = PartitionField("ts", PartitionTransform.DAY, "day")
    write_partitioned(
        events, base, [pf], layout=DataLayoutStrategy.DIR_HIERARCHY_PARTITION_VALUES
    )
    src = source_for(spark, TableFormat.PARQUET, base, partition_cols=["day"])
    snap = src.current_snapshot()
    assert snap.table.layout == DataLayoutStrategy.DIR_HIERARCHY_PARTITION_VALUES
    assert "day" in [f.name for f in snap.table.read_schema.fields]
    results = SyncClient(spark).sync(
        src,
        [
            target_for(spark, TableFormat.DELTA, base),
            target_for(spark, TableFormat.ICEBERG, base),
            target_for(spark, TableFormat.HUDI, base),
        ],
    )
    assert all(r.status.value == "SUCCESS" for r in results.values()), results
    want = sorted(
        (r["partition_values"]["day"], r["path"]) for r in snap.files.collect()
    )
    for reader in (
        DeltaLog(spark, base),
        IcebergTable(spark, base),
        HudiTimeline(spark, base),
    ):
        got = sorted(
            (r["partition_values"]["day"], r["path"])
            for r in reader.snapshot_files().collect()
        )
        assert got == want, type(reader).__name__


def test_write_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_orders_b", "o_orderkey", 8)
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"), "t_li_b", "o_orderkey", 8)
    joined = spark.table("t_orders_b").join(spark.table("t_li_b"), "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert joined.count() > 0
    # both sides bucketed on the key: the sort-merge join needs no shuffle
    assert "Exchange hashpartitioning" not in plan
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_li_b")


def test_enrich_missing_stats_footer_fallback(spark, sf_dir, tmp_path):
    """S5 branch selection: metadata-provided stats pass through unread;
    NULL-stats rows get footer-derived stats (external-writer fallback)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from onetable_spark.sources.parquet_inventory import (
        enrich_missing_stats,
        inventory_from_directory,
    )

    root = str(tmp_path / "t")
    os.makedirs(root)
    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(root, "a.parquet"))
    shutil.copy(os.path.join(sf_dir, "nation.parquet"), os.path.join(root, "b.parquet"))
    inv = inventory_from_directory(spark, root)

    # simulate metadata-plane stats present for one file, absent for the other
    sentinel = F.array(
        F.struct(
            F.lit("marker").alias("field"),
            F.lit("x").alias("min_value"),
            F.lit("x").alias("max_value"),
            F.lit(0).cast("long").alias("num_nulls"),
            F.lit(1).cast("long").alias("num_values"),
            F.lit(0).cast("long").alias("total_size"),
        )
    )
    mixed = inv.withColumn(
        "column_stats",
        F.when(F.col("path").endswith("a.parquet"), sentinel).otherwise(
            F.lit(None).cast(inv.schema["column_stats"].dataType)
        ),
    )
    out = {r["path"]: r for r in enrich_missing_stats(mixed).collect()}
    a = out[os.path.join(root, "a.parquet")]
    b = out[os.path.join(root, "b.parquet")]
    # metadata stats untouched (sentinel survived → no footer re-read)
    assert [s["field"] for s in a["column_stats"]] == ["marker"]
    # footer fallback produced real per-column stats
    fields = {s["field"] for s in b["column_stats"]}
    assert "n_nationkey" in fields
    assert b["record_count"] == 25


def test_dir_hierarchy_append_merges_existing_partitions(spark, sf_dir, tmp_path):
    """Append-mode DIR_HIERARCHY writes must merge into pre-existing bare
    partition dirs instead of failing the col=value -> value rename."""
    events = load_table(spark, sf_dir, "events").limit(1000)
    out = str(tmp_path / "bare_append")
    pf = PartitionField("ts", PartitionTransform.DAY, "day")
    write_partitioned(
        events, out, [pf], layout=DataLayoutStrategy.DIR_HIERARCHY_PARTITION_VALUES
    )
    n1 = spark.read.parquet(out + "/*").count()
    write_partitioned(
        events,
        out,
        [pf],
        layout=DataLayoutStrategy.DIR_HIERARCHY_PARTITION_VALUES,
        mode="append",
    )
    import os

    subdirs = [d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))]
    assert subdirs and all("=" not in d for d in subdirs)
    assert spark.read.parquet(out + "/*").count() == 2 * n1


def test_parquet_field_id_stamping(spark, tmp_path):
    """Write-side field-id injection (round-5, VERDICT #7 —
    HoodieAvroWriteSupportWithFieldIds.java parity): IR ``fieldId``
    metadata — here produced by the IdTracker pipeline — must land as
    parquet field ids in the written files' footers, nested fields
    included, so external id-based readers (Iceberg) map columns by id."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from onetable_spark.formats.avro_schema import (
        add_id_tracking,
        id_tracking_to_field_ids,
        inject_field_ids,
        structtype_to_avro,
    )
    from onetable_spark.sinks.writer import stamp_parquet_field_ids

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField(
                "addr",
                T.StructType(
                    [
                        T.StructField("city", T.StringType(), True),
                        T.StructField("zip", T.IntegerType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    tracked = add_id_tracking(structtype_to_avro(schema, name="rec"))
    ids = id_tracking_to_field_ids(tracked)
    assert ids  # IdTracker assigned ids for every path
    stamped_input = inject_field_ids(schema, ids)

    df = spark.createDataFrame([(1, "a", ("x", 10)), (2, "b", ("y", 20))], stamped_input)
    out = str(tmp_path / "fid")
    write_partitioned(df, out, [])

    files = glob.glob(f"{out}/*.parquet")
    assert files
    arrow_schema = pq.read_schema(files[0])
    # top-level ids
    footer_ids = {}
    for fld in arrow_schema:
        if fld.metadata and b"PARQUET:field_id" in fld.metadata:
            footer_ids[fld.name] = int(fld.metadata[b"PARQUET:field_id"])
    assert footer_ids["k"] == ids["k"]
    assert footer_ids["name"] == ids["name"]
    assert footer_ids["addr"] == ids["addr"]
    # nested struct ids survive into the parquet group type
    addr_type = arrow_schema.field("addr").type
    nested = {addr_type.field(i).name: addr_type.field(i) for i in range(addr_type.num_fields)}
    assert int(nested["city"].metadata[b"PARQUET:field_id"]) == ids["addr.city"]
    assert int(nested["zip"].metadata[b"PARQUET:field_id"]) == ids["addr.zip"]

    # no-op contract: schemas without fieldId metadata are left untouched
    plain, changed = stamp_parquet_field_ids(T.StructType([T.StructField("a", T.LongType())]))
    assert not changed
