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


def test_dir_hierarchy_rejected(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="hive-style"):
        write_partitioned(
            events, str(tmp_path / "x"), [], layout=DataLayoutStrategy.DIR_HIERARCHY_PARTITION_VALUES
        )


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
