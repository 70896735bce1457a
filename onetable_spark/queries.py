"""Declared query surface: SURVEY §2 operators as (Spark, oracle-SQL) pairs.

Each entry maps one operator from the reference's inventory (or one of the
Spark-native extension operators) to:

- a Spark callable ``(spark, sf_dir) -> DataFrame`` (idiomatic DataFrame API,
  Catalyst-optimizable), and
- an equivalent ANSI-SQL string DuckDB runs over the same parquet tables
  (``None`` for non-SQL-expressible ops → driver does a rows-only check).

Parity rules applied throughout (the driver hash-compares values after
sorting columns by name):

- every computed column aliased identically on both sides;
- SUM/AVG over doubles rounded on both sides (accumulation order differs
  between engines); raw MIN/MAX/COUNT left exact;
- integer SUMs cast to BIGINT in DuckDB (DuckDB widens to HUGEINT);
- timestamps surfaced as DATE (ns-parquet truncation differs between
  readers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from onetable_spark.session import load_table


# ---------------------------------------------------------------------------
# §2.1 generic relational operators (G1-G13) over the test tables
# ---------------------------------------------------------------------------


def q_g1_files_diff(spark: SparkSession, sf: str) -> DataFrame:
    """G1 set-difference diff (OneDataFilesDiff.java:51-68): left-anti join.

    Parts never shipped in bulk (qty > 45) ≍ files present in source,
    absent in target. Scale: anti-join shuffles on the key; AQE turns the
    small side into a broadcast anti-join automatically; the quantity
    filter pushes to the parquet scan before the join.
    """
    part = load_table(spark, sf, "part")
    li = load_table(spark, sf, "lineitem").filter(F.col("l_quantity") > 45)
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


def q_g2_group_files(spark: SparkSession, sf: str) -> DataFrame:
    """G2 group-by-partition (OneFileGroup.java:38-53): hash aggregation.

    Lineitems grouped by (returnflag, linestatus) ≍ files grouped by
    partition values; counts and sizes aggregate map-side first.
    """
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("num_files"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_size"),
        F.round(F.sum("l_quantity"), 2).alias("total_records"),
    )


def q_g3_schema_flatten(spark: SparkSession, sf: str) -> DataFrame:
    """G3 BFS flatten of nested structure (OneSchema.java:87-98): explode.

    Explode the embedding array and aggregate per label — the data-plane
    analogue of flattening nested schema fields.
    """
    emb = load_table(spark, sf, "embeddings")
    return (
        emb.select("label", F.explode("embedding").alias("component"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.round(F.sum(F.col("component").cast("double")), 2).alias("component_sum"),
        )
    )


def q_g4_sorted_merge_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """G4 sorted merge + dedup (HudiClient.java:260-287): union-distinct."""
    customer = load_table(spark, sf, "customer")
    supplier = load_table(spark, sf, "supplier")
    merged = customer.select(F.col("c_nationkey").alias("nationkey")).unionByName(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )
    return merged.distinct()


def q_g5_min_over_group(spark: SparkSession, sf: str) -> DataFrame:
    """G5 min over group (OneTableClient.java:248-266): earliest instant."""
    orders = load_table(spark, sf, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("earliest_date")
    )


def q_g6_filter_predicates(spark: SparkSession, sf: str) -> DataFrame:
    """G6 filter by IN-list + range predicate (TableFormatSync.java:135-144).

    Both predicates push down to the parquet scan (PushedFilters)."""
    events = load_table(spark, sf, "events")
    return (
        events.filter(
            F.col("event_type").isin("click", "view")
            & (F.col("ts") >= F.lit("2024-01-03").cast("timestamp_ntz"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def q_g7_max_agg(spark: SparkSession, sf: str) -> DataFrame:
    """G7 max aggregation (HudiFileStatsExtractor.java:169-175)."""
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.max("l_quantity").alias("max_qty"),
        F.max("l_extendedprice").alias("max_price"),
    )


def q_g8_stats_regroup(spark: SparkSession, sf: str) -> DataFrame:
    """G8 per-file stats regroup (HudiFileStatsExtractor.java:124-167).

    Per-(file × column) stat rows → per-file aggregates: one hash agg with
    map-side combine; raw MIN/MAX are exact (no float accumulation)."""
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("num_values"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


def q_g10_json_flatten(spark: SparkSession, sf: str) -> DataFrame:
    """G10 nested JSON flatten (DeltaStatsExtractor.java:215-235).

    Delta stats JSON → typed values; here: extract props.k from the JSON
    props column and aggregate."""
    events = load_table(spark, sf, "events")
    return (
        events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_props"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_g11_sort_commits(spark: SparkSession, sf: str) -> DataFrame:
    """G11/G12 order-by + top-k (DeltaIncrementalChangesState.java:77-81,
    OneTableClient.java:200-207): TakeOrderedAndProject, no full sort."""
    orders = load_table(spark, sf, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", F.col("o_orderdate").cast("date").alias("o_date"))
    )


def q_g12_latest_instant(spark: SparkSession, sf: str) -> DataFrame:
    """G12 top-1 latest instant (HudiClient.java:88-94) per group.

    Latest event per user via row_number — window-free-dedup variant."""
    events = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q_dedup_first_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """Window-free dedup (row_number()==1): first order per customer."""
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped headline queries (join/agg surface at benchmark scale)
# ---------------------------------------------------------------------------


def q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape): the flagship scan-heavy aggregate.

    Whole-stage-codegen'd hash aggregation; the shipdate filter pushes to
    the parquet scan."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """Shipping-priority (TPC-H Q3 shape): 3-way join + agg + top-k.

    customer is broadcast (small dim); orders⋈lineitem shuffles on the
    order key once and the aggregation reuses that partitioning."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .filter(
            (F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz"))
            & (F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz"))
        )
        .groupBy("o_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """Local-supplier-volume (TPC-H Q5 shape): 6-way star join.

    All dims broadcast; only orders⋈lineitem shuffles."""
    region = load_table(spark, sf, "region")
    nation = load_table(spark, sf, "nation")
    customer = load_table(spark, sf, "customer")
    supplier = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


ORACLE_SQL: dict[str, str] = {
    "g1_files_diff": """
        SELECT p_partkey, p_name FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
    """,
    "g2_group_files": """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS num_files,
               ROUND(SUM(l_extendedprice), 2) AS total_size,
               ROUND(SUM(l_quantity), 2) AS total_records
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "g3_schema_flatten": """
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_components,
               ROUND(SUM(CAST(component AS DOUBLE)), 2) AS component_sum
        FROM (SELECT label, UNNEST(embedding) AS component FROM embeddings)
        GROUP BY label
    """,
    "g4_sorted_merge_dedup": """
        SELECT DISTINCT nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey FROM supplier
        )
    """,
    "g5_min_over_group": """
        SELECT o_orderstatus, MIN(CAST(o_orderdate AS DATE)) AS earliest_date
        FROM orders GROUP BY o_orderstatus
    """,
    "g6_filter_predicates": """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM events
        WHERE event_type IN ('click', 'view') AND ts >= TIMESTAMP '2024-01-03 00:00:00'
        GROUP BY event_type
    """,
    "g7_max_agg": """
        SELECT l_returnflag, MAX(l_quantity) AS max_qty, MAX(l_extendedprice) AS max_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "g8_stats_regroup": """
        SELECT l_orderkey,
               CAST(COUNT(*) AS BIGINT) AS num_values,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty
        FROM lineitem GROUP BY l_orderkey
    """,
    "g10_json_flatten": """
        SELECT event_type,
               CAST(COUNT(k) AS BIGINT) AS n_props,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(MIN(k) AS BIGINT) AS min_k,
               CAST(MAX(k) AS BIGINT) AS max_k
        FROM (SELECT event_type, CAST(props ->> '$.k' AS BIGINT) AS k FROM events)
        GROUP BY event_type
    """,
    "g11_sort_commits": """
        SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_date
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "g12_latest_instant": """
        SELECT user_id, event_id, event_type FROM (
            SELECT user_id, event_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "dedup_first_per_key": """
        SELECT o_custkey, o_orderkey FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
            FROM orders
        ) WHERE rn = 1
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q3": """
        SELECT o_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """,
    "tpch_q5": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, orders, customer, supplier, nation, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY n_name
    """,
}


SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "g1_files_diff": q_g1_files_diff,
    "g2_group_files": q_g2_group_files,
    "g3_schema_flatten": q_g3_schema_flatten,
    "g4_sorted_merge_dedup": q_g4_sorted_merge_dedup,
    "g5_min_over_group": q_g5_min_over_group,
    "g6_filter_predicates": q_g6_filter_predicates,
    "g7_max_agg": q_g7_max_agg,
    "g8_stats_regroup": q_g8_stats_regroup,
    "g10_json_flatten": q_g10_json_flatten,
    "g11_sort_commits": q_g11_sort_commits,
    "g12_latest_instant": q_g12_latest_instant,
    "dedup_first_per_key": q_dedup_first_per_key,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
}
