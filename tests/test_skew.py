"""Salting operators must be result-identical to their plain counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from onetable_spark.operators.skew import salted_groupby, salted_join
from onetable_spark.session import load_table


def test_salted_groupby_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = {
        r["l_returnflag"]: (round(r["sum_l_quantity"], 2), r["count_l_orderkey"])
        for r in salted_groupby(
            li, "l_returnflag", {"l_quantity": "sum", "l_orderkey": "count"}, salt_buckets=8
        ).collect()
    }
    plain = {
        r["l_returnflag"]: (round(r["s"], 2), r["c"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("l_orderkey").alias("c"))
        .collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    salted = salted_join(orders, cust, "o_custkey", salt_buckets=4)
    plain = orders.join(cust, "o_custkey")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_groupby_min_max(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = {
        r["l_linestatus"]: r["min_l_extendedprice"]
        for r in salted_groupby(li, "l_linestatus", {"l_extendedprice": "min"}, 8).collect()
    }
    plain = {
        r["l_linestatus"]: r["m"]
        for r in li.groupBy("l_linestatus").agg(F.min("l_extendedprice").alias("m")).collect()
    }
    assert out == plain
