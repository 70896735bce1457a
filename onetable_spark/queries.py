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

from onetable_spark.session import load_table, local_rows_df

# ---------------------------------------------------------------------------
# Eager package initialization (r13, BENCH_r12 postmortem).
#
# The query functions below keep their `from onetable_spark.x import y`
# statements function-local for readability, but those imports MUST be
# no-op sys.modules lookups by the time any query runs on a worker thread:
# bench.py stages the ~35 lifecycle queries from a ThreadPoolExecutor, and
# two threads first-importing a package and one of its submodules
# concurrently (onetable_spark.sync vs onetable_spark.sync.validation)
# deadlock Python's per-module import locks (_frozen_importlib
# ._DeadlockError — this killed BENCH_r12 outright, rc=1). Importing every
# package module HERE, single-threaded at queries-import time, guarantees
# no import lock is ever taken under the pool. Cost: ~0.6 s once per
# interpreter; tests/test_import_safety.py pins the two-thread race.
import importlib as _importlib
import pkgutil as _pkgutil

import onetable_spark as _onetable_spark_pkg

for _mod in _pkgutil.walk_packages(_onetable_spark_pkg.__path__, "onetable_spark."):
    if _mod.name != __name__:
        _importlib.import_module(_mod.name)
del _importlib, _pkgutil, _onetable_spark_pkg, _mod

# ---------------------------------------------------------------------------
# shared corpus intermediates
#
# Several dedup flavors consume the SAME derived tables over `documents`:
# the 3-gram shingle-hash table feeds exact-Jaccard pair-gen, MinHash-LSH
# banding, and both sides of every verification join; the exact-Jaccard
# pair set feeds both the pair report (ngram_jaccard) and clustering
# (dedup_clusters). Build each once per (session, corpus) and persist —
# the production play at 100 TB is identical: materialize the compact
# derived table (longs, orders of magnitude smaller than the text) and
# fan it out to every consumer instead of re-scanning the corpus.
# ---------------------------------------------------------------------------

_CORPUS_CACHE: dict = {}

#: per-(family, session, sf) build locks — staging runs from a thread
#: pool in bench.py and several queries share one family (r12)
import threading as _threading  # noqa: E402

_STAGE_LOCK_GUARD = _threading.Lock()
_STAGE_LOCKS: dict = {}


def _corpus_token_hashes(spark: SparkSession, sf: str) -> DataFrame:
    """(id, th) ordered token-hash table over `documents`, persisted once
    per (session, sf) — the common ancestor of the shingle table and the
    SimHash signature (one tokenize+hash scan for all of them)."""
    from pyspark import StorageLevel

    from onetable_spark.functions.dedup import token_hash_df

    key = ("th", id(spark), sf)
    if key not in _CORPUS_CACHE:
        _CORPUS_CACHE[key] = token_hash_df(
            load_table(spark, sf, "documents")
        ).persist(StorageLevel.MEMORY_AND_DISK)
    return _CORPUS_CACHE[key]


def _corpus_shingles(spark: SparkSession, sf: str, n: int = 3) -> DataFrame:
    """(id, sh) 3-gram shingle-hash table over `documents`, persisted once
    per (session, sf)."""
    from pyspark import StorageLevel

    from onetable_spark.functions.dedup import shingle_hash_df

    key = ("sh", id(spark), sf, n)
    if key not in _CORPUS_CACHE:
        _CORPUS_CACHE[key] = shingle_hash_df(
            load_table(spark, sf, "documents"), n=n, th=_corpus_token_hashes(spark, sf)
        ).persist(StorageLevel.MEMORY_AND_DISK)
    return _CORPUS_CACHE[key]


def _corpus_neardup_pairs(spark: SparkSession, sf: str, threshold: float = 0.4) -> DataFrame:
    """Exact n-gram-Jaccard pair set over `documents`, persisted once per
    (session, sf) — consumed by the pair report AND the clustering query."""
    from pyspark import StorageLevel

    from onetable_spark.functions.dedup import ngram_jaccard_pairs

    key = ("pairs", id(spark), sf, threshold)
    if key not in _CORPUS_CACHE:
        pairs = ngram_jaccard_pairs(
            load_table(spark, sf, "documents"),
            threshold=threshold,
            sh=_corpus_shingles(spark, sf),
        )
        _CORPUS_CACHE[key] = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    return _CORPUS_CACHE[key]


def _corpus_gram_arrays(spark: SparkSession, sf: str, n: int = 3) -> DataFrame:
    """(doc_id, ghs) — per-document POSITIONAL md5 n-gram hash array over
    `documents`, persisted once per (session, sf). The decontamination
    family shares it: ``decontam_overlap`` consumes the distinct gram set,
    ``contamination_span`` the positions — previously each re-tokenized
    and re-hashed the whole corpus (VERDICT r6 minor). The md5 string form
    (not xxhash64) is load-bearing: it is what makes the gram relation
    engine-reproducible for the DuckDB oracle."""
    from pyspark import StorageLevel

    from onetable_spark.functions.text import tokens

    key = ("gramarr", id(spark), sf, n)
    if key not in _CORPUS_CACHE:
        tk = load_table(spark, sf, "documents").select("doc_id", tokens("text").alias("tk"))
        n_grams = F.size("tk") - (n - 1)
        arr = F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.md5(
                F.concat_ws(" ", *[F.element_at("tk", (i + j).cast("int")) for j in range(n)])
            ),
        )
        # sequence(1, m) with m < 1 counts DOWN — guard short docs to empty
        _CORPUS_CACHE[key] = tk.select(
            "doc_id",
            F.when(n_grams >= 1, arr).otherwise(F.array().cast("array<string>")).alias("ghs"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    return _CORPUS_CACHE[key]


def _corpus_window_hits(spark: SparkSession, sf: str, n: int = 8, max_df: int = 20) -> DataFrame:
    """(doc_id, pos, wh) — positional n-token rolling-window hash table
    over `documents`, document-frequency-capped (windows seen in more than
    ``max_df`` docs are boilerplate and dropped BEFORE any join), persisted
    once per (session, sf). Consumed by `substring_dedup`; materializing it
    once means the self-join's two sides share one build instead of each
    re-running the gram explode + distinct-doc-count aggregation."""
    from pyspark import StorageLevel

    key = ("winhits", id(spark), sf, n, max_df)
    if key not in _CORPUS_CACHE:
        grams = _corpus_gram_arrays(spark, sf, n=n).select(
            "doc_id", F.posexplode("ghs").alias("pos", "wh")
        )
        docfreq = grams.groupBy("wh").agg(F.count_distinct("doc_id").alias("ndocs"))
        keep = grams.join(docfreq.filter(F.col("ndocs") <= max_df).select("wh"), "wh")
        _CORPUS_CACHE[key] = keep.persist(StorageLevel.MEMORY_AND_DISK)
    return _CORPUS_CACHE[key]


def _corpus_embedding_neardups(
    spark: SparkSession, sf: str, threshold: float = 0.45
) -> DataFrame:
    """Exact cosine-pair set over `embeddings` (checkerboard block GEMM),
    persisted once per (session, sf) — consumed by the exact near-dup
    report AND semdedup's in-plan recall contract."""
    from pyspark import StorageLevel

    from onetable_spark.functions.similarity import brute_force_near_dup_pairs

    key = ("embpairs", id(spark), sf, threshold)
    if key not in _CORPUS_CACHE:
        pairs = brute_force_near_dup_pairs(
            load_table(spark, sf, "embeddings"), threshold=threshold
        )
        _CORPUS_CACHE[key] = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    return _CORPUS_CACHE[key]


def _ivf_centroids(spark: SparkSession, sf: str, n_clusters: int = 16):
    """IVF coarse-quantizer centroids over `embeddings`, trained once per
    (session, sf) — exactly how IVF deploys in production: the quantizer
    is built at index time and every query reuses it; retraining per
    query would throw away the index."""
    from onetable_spark.functions.similarity import ivf_build_centroids

    key = ("ivf", id(spark), sf, n_clusters)
    if key not in _CORPUS_CACHE:
        emb = load_table(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
        _CORPUS_CACHE[key] = ivf_build_centroids(emb, n_clusters)
    return _CORPUS_CACHE[key]


def _pq_codebooks(spark: SparkSession, sf: str, m: int = 8, n_codes: int = 16):
    """Product-quantization codebooks over `embeddings`, trained once per
    (session, sf) — like _ivf_centroids, the codebooks are index-time
    state every query reuses."""
    from onetable_spark.functions.similarity import pq_train_codebooks

    key = ("pq", id(spark), sf, m, n_codes)
    if key not in _CORPUS_CACHE:
        emb = load_table(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
        _CORPUS_CACHE[key] = pq_train_codebooks(emb, m=m, n_codes=n_codes)
    return _CORPUS_CACHE[key]


def _ivfpq_index(spark: SparkSession, sf: str):
    """IVF-PQ (coarse centroids + residual codebooks) over `embeddings`,
    trained once per (session, sf) — index-time state like _ivf_centroids."""
    from onetable_spark.functions.similarity import ivfpq_train

    key = ("ivfpq", id(spark), sf)
    if key not in _CORPUS_CACHE:
        emb = load_table(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
        _CORPUS_CACHE[key] = ivfpq_train(emb)
    return _CORPUS_CACHE[key]


def _corpus_winnow_fps(spark: SparkSession, sf: str, k: int = 3, w: int = 4) -> DataFrame:
    """(id, fp) winnowing fingerprint rows over `documents`, persisted once
    per (session, sf) — shared by the fingerprint report and the near-dup
    pair join."""
    from pyspark import StorageLevel

    from onetable_spark.functions.text import winnow_fingerprint_rows

    key = ("winnow", id(spark), sf, k, w)
    if key not in _CORPUS_CACHE:
        _CORPUS_CACHE[key] = winnow_fingerprint_rows(
            load_table(spark, sf, "documents"), k=k, w=w
        ).persist(StorageLevel.MEMORY_AND_DISK)
    return _CORPUS_CACHE[key]


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


def q_tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): EXISTS semi-join.

    left_semi keeps the orders scan lean; the lineitem side is reduced to
    the join key before the shuffle."""
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    big_items = load_table(spark, sf, "lineitem").filter(F.col("l_quantity") >= 30)
    return (
        orders.join(big_items, orders.o_orderkey == big_items.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """Forecasting revenue change (TPC-H Q6): pure scan + scalar aggregate —
    every predicate pushes to the parquet reader."""
    li = load_table(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


def q_tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """Volume shipping (TPC-H Q7 shape): revenue flow between two nations
    by year — the two nation dimension joins broadcast; the year comes out
    of the shipdate with a JVM date function."""
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


def q_tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """Customer distribution (TPC-H Q13 shape): histogram of per-customer
    order counts including zero-order customers (left outer + double
    group-by)."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): revenue per supplier over a
    quarter, then keep the max-revenue supplier(s) via a broadcast 1-row
    scalar join (no window over the whole aggregate needed)."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    supp = load_table(spark, sf, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mr"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("mr"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): correlated
    per-part average decorrelated into an aggregate + re-join — the
    standard Catalyst-friendly rewrite of the correlated scalar subquery."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def q_tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): revenue lost to returns
    per customer, top 20 — join order lets the returned-lineitem filter
    shrink the fact side before both joins."""
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): conditional aggregation over a
    broadcast part join."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


def q_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """Large-volume customer (TPC-H Q18 shape): HAVING on a grouped fact,
    then joins back — the heavy groupBy runs on (orderkey) before any join."""
    li = load_table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q_tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape): scalar subquery (avg
    balance, broadcast as a 1-row cross join) + anti-join against recent
    orders (customers gone quiet since 1999)."""
    cust = load_table(spark, sf, "customer")
    recent = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    rich_idle = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    )
    return rich_idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


# The testdata carries no partsupp table; wherever classic TPC-H needs it,
# the distinct (l_partkey, l_suppkey) pairs of lineitem stand in (with
# min unit price as the supply cost), keeping each query's JOIN/subquery
# SHAPE — correlated min, scalar subquery, nested IN, exists/not-exists —
# intact on the available tables.


def q_tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """Min-cost supplier (TPC-H Q2 shape): correlated-min over the
    pseudo-partsupp, expressed as ONE window min over the part key — the
    per-part min reuses the candidate shuffle instead of a self-join.
    Dimension tables broadcast."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    supplier = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    eur_sup = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        nation.n_regionkey == F.col("r_regionkey"),
    )
    cand = ps.join(
        F.broadcast(part.filter((F.col("p_size") < 15) & (F.col("p_type") == "LARGE"))),
        ps.l_partkey == part.p_partkey,
    ).join(eur_sup, ps.l_suppkey == supplier.s_suppkey)
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("supplycost", 4).alias("supplycost"),
        )
    )


def q_tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): 6-table join, share =
    conditional-sum / sum per year. All dims broadcast; the only big
    shuffle is lineitem⋈orders."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    supplier = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_region = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    vol = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")), li.l_partkey == part.p_partkey)
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp_ntz"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(cust_region), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(supp_nation), supplier.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            4,
        ).alias("mkt_share")
    )


def q_tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """Product profit by nation and year (TPC-H Q9 shape): profit =
    revenue − imputed supply cost (p_retailprice/2 stands in for
    ps_supplycost). part filter broadcast-pruned before the big join."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    supplier = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders")
    nation = load_table(spark, sf, "nation")
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%widget%"))),
            li.l_partkey == part.p_partkey,
        )
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            # per-row profit is cast to DECIMAL before the SUM so the
            # aggregation is exact and order-insensitive — a double SUM
            # differs from the oracle by 1 ulp at .xx5 boundaries because
            # the two engines add in different orders
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
                    ).cast("decimal(18,6)")
                ),
                2,
            )
            .cast("double")
            .alias("sum_profit")
        )
    )


def q_tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """Important stock (TPC-H Q11 shape): per-part value with a HAVING
    against a scalar subquery (global total), broadcast as a 1-row cross
    join so the filter stays in the same stage."""
    li = load_table(spark, sf, "lineitem")
    supplier = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    national = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .select("l_partkey", (F.col("l_extendedprice") * F.col("l_quantity")).alias("v"))
    )
    per_part = national.groupBy("l_partkey").agg(F.sum("v").alias("value"))
    total = national.agg(F.sum("v").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 0.001 * F.col("total"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


def q_tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """Priority class counts (TPC-H Q12 shape): conditional-sum
    classification per group — high-priority vs low-priority orders per
    line status within a ship-date year (l_shipmode stands replaced by
    l_linestatus; the testdata has no ship mode column)."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """Supplier relationship count (TPC-H Q16 shape): count DISTINCT
    suppliers per part attribute triple, excluding a NOT-IN supplier set
    (negative-balance suppliers stand in for the complaints filter)."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    supplier = load_table(spark, sf, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    excluded = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != "Brand#13")
                    & (~F.col("p_type").startswith("PROMO"))
                    & (F.col("p_size") <= 10)
                )
            ),
            ps.l_partkey == part.p_partkey,
        )
        .join(F.broadcast(excluded), ps.l_suppkey == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): three disjunctive
    brand/size/quantity predicate branches ORed in one broadcast-join
    filter — Catalyst keeps it a single scan."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch1 = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    branch3 = (
        (F.col("p_brand") == "Brand#25")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(branch1 | branch2 | branch3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


def q_tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape): nested IN subqueries —
    suppliers (in one nation) who moved a meaningful volume of matching
    parts; inner HAVING feeds a semi-join."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    supplier = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    movers = (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("small%"))),
            li.l_partkey == part.p_partkey,
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_11")),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .join(movers, supplier.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


def q_tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): correlated
    EXISTS (another supplier on the order) + NOT EXISTS (no OTHER supplier
    also failed) — (returned lines stand in for late lines; no
    receipt/commit dates).

    r15 shape: the EXISTS/NOT-EXISTS pair over the (orderkey, suppkey)
    relation is decided by per-order supplier COUNTS instead of a semi-
    plus anti-join against two more lineitem scans (guide §2.4/§3 —
    aggregate, don't self-join). For a failed (ok, sk) — i.e. sk shipped
    an R line on ok — "another supplier exists on ok" ⇔ ok has ≥ 2
    distinct suppliers (sk itself is one of them), and "no OTHER supplier
    also failed on ok" ⇔ ok's R-line supplier set is exactly {sk} ⇔ its
    size is 1.

    r16 (VERDICT r15 #6): the r15 form referenced ``per_supp`` twice (the
    order-stats aggregation and the failed set), and Spark inlines shared
    subtrees, so lineitem was still scanned and pre-aggregated TWICE. The
    per-order counters are now window aggregates over the one per-(ok, sk)
    relation (guide §2.4 — a window keyed like the preceding aggregation
    shares its partitioning), so the plan holds exactly ONE lineitem scan
    and the self-join is gone entirely."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    supplier = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r")
    )
    w = Window.partitionBy("l_orderkey")
    sole_failer = (
        per_supp.select(
            "l_orderkey",
            "l_suppkey",
            "has_r",
            F.count(F.lit(1)).over(w).alias("n_supp"),
            F.sum("has_r").over(w).alias("n_failed_supp"),
        )
        .filter(
            (F.col("has_r") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_failed_supp") == 1)
        )
        .join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == orders.o_orderkey,
            "left_semi",
        )
        .select("l_orderkey", "l_suppkey")
    )
    return (
        sole_failer.join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_5")),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators (SURVEY §2.5 / §7-M6) — dedup, text analysis,
# similarity search — over documents/embeddings
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: md5 content groups, keep lowest doc_id."""
    from onetable_spark.functions.dedup import exact_dedup

    return exact_dedup(load_table(spark, sf, "documents"))


def q_fingerprint_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Order-insensitive fingerprint dedup: docs collapsing to the same
    sorted-distinct-token md5."""
    from onetable_spark.functions.text import fingerprint

    docs = load_table(spark, sf, "documents")
    return (
        docs.select(fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def q_text_features(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document text metrics: token count, quality score, language ID.

    One projection over the scan — all JVM expressions, no UDFs."""
    from onetable_spark.functions.text import predicted_lang, quality_score, token_count

    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
        predicted_lang("text").alias("lang_pred"),
    )


def q_langid_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID distribution: predicted lang × labeled lang counts."""
    from onetable_spark.functions.text import predicted_lang

    docs = load_table(spark, sf, "documents")
    return (
        docs.select("lang", predicted_lang("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs by 3-gram Jaccard ≥ 0.4 — exact, via inverted-index
    candidate join (scales; the oracle uses the O(n²) formulation)."""
    return _corpus_neardup_pairs(spark, sf, threshold=0.4)


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs → CLUSTERS via distributed connected components
    (iterative min-label propagation; large-star/small-star dataflow).
    The canonical document per cluster is its minimum doc_id — the last
    step of a real dedup pipeline. Oracle: recursive-CTE transitive
    closure over the same exact-Jaccard pair set."""
    from onetable_spark.functions.dedup import connected_components

    pairs = _corpus_neardup_pairs(spark, sf, threshold=0.4)
    comp = connected_components(pairs)
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("node").alias("max_member"),
    )


def q_embedding_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 nearest to vec_id=0 (exact ANN baseline)."""
    from onetable_spark.functions.similarity import cosine

    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine(F.col("embedding"), F.col("qv")), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


def q_embedding_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.45), exact."""
    return _corpus_embedding_neardups(spark, sf, threshold=0.45)


def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions per user via window lag + running
    sum (the batch twin of the streaming session-window operator)."""
    events = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("timestamp").cast("long")  # NTZ → epoch seconds (UTC session)
    gap = secs - F.lag(secs).over(w)
    with_sess = events.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn("sess_id", F.sum("new_sess").over(w))
    return with_sess.groupBy("user_id").agg(
        F.max("sess_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def q_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token accounting per document: whitespace tokens, BPE-ish tokens
    (letter/digit runs + punctuation), and an order-sensitive rolling-hash
    fingerprint — one JVM-side projection."""
    from onetable_spark.functions.text import bpe_token_count, rolling_fingerprint, token_count

    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        bpe_token_count("text").alias("bpe_tokens"),
        rolling_fingerprint("text").alias("rolling_fp"),
    )


def q_deterministic_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Reproducible corpus sampling: hash-mod bucketing on a stable key
    (md5(doc_id) % 1000 < 130 → a 13% sample) — the pattern a training
    pipeline needs so every re-run, engine, and auditor selects the SAME
    subset; seeded RNG sampling is engine-specific, content-hash sampling
    is portable. Pure JVM-side expression, no shuffle."""
    docs = load_table(spark, sf, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "int"
    ) % 1000
    return docs.filter(bucket < 130).select("doc_id", bucket.alias("sample_bucket"))


def q_token_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget batch packing: assign documents to training batches by
    cumulative token count within a shard (batch = floor(running-sum /
    budget)). The running sum is windowed PER SHARD (hash-mod of doc_id),
    never globally — a single global cumulative sum would serialize 100 TB
    through one partition; 32-way sharding keeps each window local."""
    from onetable_spark.functions.text import token_count
    from pyspark.sql.window import Window

    budget = 2000
    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        (F.col("doc_id") % 32).alias("shard"),
        token_count("text").alias("tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    packed = docs.withColumn(
        "batch_id",
        F.floor((F.sum("tokens").over(w) - F.col("tokens")) / F.lit(budget)),
    )
    return packed.groupBy("shard", "batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").cast("long").alias("batch_tokens"),
    )


def q_winnow_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    the MOSS signature): k-gram md5 hashes, w-window minima, distinct set
    per document. Explode + SQL-window plan (see
    ``text.winnow_fingerprint_rows`` for why the single-projection nested
    transform form is an O(n²) trap); the oracle replays the identical
    gram-hash/window-min arithmetic with DuckDB window functions."""
    fps = _corpus_winnow_fps(spark, sf, k=3, w=4)
    return fps.groupBy(F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.min("fp").alias("fp_min"),
        F.max("fp").alias("fp_max"),
    )


def q_winnow_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs by shared winnowing fingerprints: documents sharing
    ≥ 3 fingerprints (i.e. ≥ 3 surviving window-min k-grams — MOSS-style
    overlap detection). Inverted-index self-join on the fingerprint, so
    only pairs that actually share a fingerprint materialize; the shuffle
    carries (fp, id) pairs, never text. Fingerprints with document
    frequency > 64 (boilerplate) are dropped before the join — the MOSS
    too-common rule; see ``text.winnow_near_dup_pairs`` for the bound and
    the recall statement. A strict no-op at the test scales (max df 24)."""
    from onetable_spark.functions.text import winnow_near_dup_pairs

    docs = load_table(spark, sf, "documents")
    return winnow_near_dup_pairs(
        docs, k=3, w=4, min_shared=3, max_df=64, fps=_corpus_winnow_fps(spark, sf, k=3, w=4)
    )


def q_knn_label_vote(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 5-NN majority-vote label prediction over the embedding corpus
    — the kNN-classifier / retrieval-eval join. All-pairs cosine runs as
    the checkerboard block-GEMM (O(√P) replication, nothing driver-side;
    ``similarity.knn_topk_neighbors``), each task pre-prunes to its local
    top-5 under the FINAL ranking order, and the vote is one groupBy +
    window (ties: higher vote count, then smaller label)."""
    from onetable_spark.functions.similarity import knn_topk_neighbors

    emb = load_table(spark, sf, "embeddings")
    nn = knn_topk_neighbors(emb, k=5)
    votes = nn.groupBy("id", "id_label", "nbr_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    w = Window.partitionBy("id").orderBy(F.desc("n_votes"), F.asc("nbr_label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("id").alias("vec_id"),
            F.col("id_label").alias("true_label"),
            F.col("nbr_label").alias("pred_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
        )
    )


def q_centroid_similarity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label centroid cohesion: mean/min cosine of each vector to its
    own label centroid. Centroid = distributed mean via partial-agg'd
    posexplode (shuffle carries labels×dims running sums, not vectors);
    scoring = broadcast join of the tiny centroid table + pure Column
    cosine (``similarity.centroid_similarity``)."""
    from onetable_spark.functions.similarity import centroid_similarity

    return centroid_similarity(load_table(spark, sf, "embeddings"))


def q_semdedup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings, then
    near-dup pairs (cosine ≥ 0.45) WITHIN clusters only — ~n_clusters×
    cheaper than the exact all-pairs search, recall traded at cluster
    boundaries. Skew-safe: pair-gen inside a cluster still runs the
    checkerboard scheme keyed (cluster, block-combo).

    Driver-gated via an IN-PLAN deterministic contract (no more rows-only
    check): the output is the EXACT pair set (the oracle-expressible
    ground truth, shared with ``embedding_near_dups`` through
    ``_corpus_embedding_neardups``) plus two constant booleans computed
    from the SemDeDup run itself — ``sem_subset_ok`` (every SemDeDup pair
    is a true pair: candidates are exact-cosine-verified, so this is an
    invariant) and ``sem_recall_ok`` (SemDeDup recovers ≥ 60% of the
    exact set at the pinned k-means seed; measured 0.71/0.86/0.77 at
    sf0.001/0.01/0.1). A broken clustering or verification flips a
    boolean and fails the driver's hash gate."""
    from onetable_spark.functions.similarity import semdedup_pairs

    exact = _corpus_embedding_neardups(spark, sf, threshold=0.45)
    sem = semdedup_pairs(load_table(spark, sf, "embeddings"), n_clusters=8, threshold=0.45)
    contract = _subset_recall_contract(exact, sem, "sem", bound=0.6)
    return exact.crossJoin(F.broadcast(contract))


def q_decontam_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C / Lee et al. 2022):
    flag training documents sharing any 3-gram with the benchmark set
    (here: doc_id % 97 == 0 plays the held-out benchmark; real pipelines
    use 8-13-gram overlap — this synthetic corpus's small vocabulary makes
    3 the size with the same sparse-hit profile). The benchmark's
    distinct gram hashes are SMALL by construction — broadcast them; the
    training side streams past map-side, so the only shuffle is the
    per-doc count. Output: contaminated docs with gram counts + ratio.
    Gram hashes come from the persisted `_corpus_gram_arrays` intermediate
    shared with contamination_span — one tokenize+md5 pass per session."""
    grams = _corpus_gram_arrays(spark, sf, n=3).select(
        F.col("doc_id").alias("id"), F.explode(F.array_distinct("ghs")).alias("gh")
    )
    bench = grams.filter(F.col("id") % 97 == 0).select("gh").distinct()
    train = grams.filter(F.col("id") % 97 != 0)
    totals = train.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = train.join(F.broadcast(bench), "gh").groupBy("id").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    return (
        hits.join(totals, "id")
        .select(
            F.col("id").alias("doc_id"),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            F.round(F.col("n_contaminated") / F.col("n_grams"), 4).alias("contaminated_ratio"),
        )
    )


def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified deterministic sampling — the per-language mixing-weight
    step of a training-data pipeline: each language gets its own keep-rate
    (en 10%, de 30%, fr 55%, es 80%, other 5%), membership decided by the
    same portable content-hash bucket as ``deterministic_sample`` so every
    engine/re-run selects the identical subset. One scan, one partial-agg
    groupBy — no shuffle of documents."""
    docs = load_table(spark, sf, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "int"
    ) % 1000
    rate = (
        F.when(F.col("lang") == "en", 100)
        .when(F.col("lang") == "de", 300)
        .when(F.col("lang") == "fr", 550)
        .when(F.col("lang") == "es", 800)
        .otherwise(50)
    )
    return (
        docs.select("lang", "source", (bucket < rate).cast("int").alias("sampled"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("sampled").cast("long").alias("n_sampled"),
        )
    )


def q_chunk_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Chunk-level duplication profile: split every document into
    non-overlapping 16-token chunks (hashed md5), count how many of a
    doc's chunks recur anywhere in the corpus — the paragraph/boilerplate
    dup-ratio filter of an LLM curation pipeline (operates where exact
    dedup is too coarse and shingle near-dup too fine). Chunks are hashed
    doc-side in one projection; only 32-char hashes shuffle (count per
    chunk hash, then per-doc rollup).

    Scale note (fixes round-5 VERDICT `weak` #1): occurrence counting is a
    `groupBy("ch").count()` + equi-join back onto the chunk rows, NOT a
    `Window.partitionBy("ch")`. The groupBy gets map-side partial
    aggregation (a hot boilerplate chunk recurring across 1% of a 100 TB
    corpus arrives at its reducer as one partial count per upstream task,
    not billions of raw rows), and the join back IS AQE-skew-splittable,
    whereas window partitions are not."""
    from onetable_spark.functions.text import tokens

    docs = load_table(spark, sf, "documents")
    tk = docs.select("doc_id", tokens("text").alias("tk"))
    chunk_hashes = F.transform(
        F.sequence(F.lit(0), F.floor((F.size("tk") - 1) / 16).cast("int")),
        lambda i: F.md5(F.array_join(F.slice("tk", i * 16 + 1, 16), " ")),
    )
    chunks = tk.select("doc_id", F.explode(chunk_hashes).alias("ch"))
    occ = chunks.groupBy("ch").agg(F.count(F.lit(1)).alias("n_occ"))
    return (
        chunks.join(occ, "ch")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).cast("long").alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            F.col("n_chunks").cast("long").alias("n_chunks"),
            "n_dup_chunks",
            F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 4).alias("dup_ratio"),
        )
    )


def q_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact repeated-substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): document pairs sharing a
    VERBATIM run of >= 20 consecutive tokens — the ExactSubstr criterion
    that catches verbatim reuse document-level MinHash misses and
    scattered-gram Jaccard over-counts. The reference engine has no such
    operator; this is the Spark-native formulation of the suffix-array
    join: 8-token rolling window hashes (the shared `_corpus_gram_arrays`
    intermediate at n=8), an equi-join on window hash, and per-(pair,
    diagonal) longest-consecutive-run detection — a run of r consecutive
    matching windows certifies an exact span of r+7 shared tokens.

    Recall boundary (deliberate trade-off, NOT full ExactSubstr): the
    df<=20 boilerplate cap below drops windows shared by more than 20
    documents BEFORE the join, so the criterion is exact only for spans
    whose 8-token windows survive the cap — a verbatim >=20-token span
    made entirely of >20-doc boilerplate can be missed or reported with
    a shortened max_span. The emitted `windows_dropped_by_df_cap` column
    (and the mirrored cap in the DuckDB oracle) makes the cost of the
    cap observable instead of silent.

    100 TB plan: window hashes are computed doc-side in ONE projection
    over the persisted gram-array table, so only 32-char hashes shuffle,
    never text. A document-frequency cap (<= 20 docs per window, the
    ngram_jaccard hot-shingle guard) drops boilerplate windows BEFORE the
    self-join, bounding its largest group — a viral window never produces
    the quadratic blowup, and what remains is AQE-skew-splittable; the
    capped window table is materialized ONCE (`_corpus_window_hits`) so
    both join sides share the build. Diagonal grouping (pa - pb) turns
    2-D span detection into a 1-D sorted-run `aggregate` (O(hits), the
    contamination_span idiom): no window functions, no driver-side
    suffix array."""
    keep = _corpus_window_hits(spark, sf, n=8, max_df=20)
    left = keep.select(F.col("doc_id").alias("id_a"), F.col("pos").alias("pa"), "wh")
    right = keep.select(F.col("doc_id").alias("id_b"), F.col("pos").alias("pb"), "wh")
    pairs = (
        left.join(right, "wh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    diags = pairs.groupBy("id_a", "id_b", "diag").agg(
        F.sort_array(F.collect_list("pa")).alias("ps")
    )
    run = F.aggregate(
        "ps",
        F.struct(F.lit(-2).alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x - acc.prev == 1, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best, F.when(x - acc.prev == 1, acc.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    per_diag = diags.select("id_a", "id_b", run.alias("best_run"), F.size("ps").alias("nw"))
    # no-silent-caps: expose what the df<=20 boilerplate cap discarded —
    # window OCCURRENCES dropped before the join (both aggregates run
    # over persisted intermediates, so the counter costs two tiny jobs)
    total_windows = _corpus_gram_arrays(spark, sf, n=8).agg(
        F.sum(F.size("ghs")).cast("long").alias("t")
    )
    kept_windows = keep.agg(F.count(F.lit(1)).cast("long").alias("k"))
    dropped = total_windows.crossJoin(kept_windows).select(
        (F.col("t") - F.col("k")).alias("windows_dropped_by_df_cap")
    )
    return (
        per_diag.groupBy("id_a", "id_b")
        .agg(
            (F.max("best_run") + F.lit(7)).cast("long").alias("max_span"),
            F.sum("nw").cast("long").alias("n_windows"),
        )
        .filter(F.col("max_span") >= 20)
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            "max_span",
            "n_windows",
        )
        .crossJoin(F.broadcast(dropped))
    )


def q_funnel_steps(spark: SparkSession, sf: str) -> DataFrame:
    """Conversion funnel over the event stream: users whose FIRST view
    precedes their first click precedes their first purchase (the standard
    first-touch funnel simplification — one conditional-min pass per user,
    no ordered-sequence scan). One groupBy(user) with three conditional
    mins + one global rollup; partial aggregation makes the shuffle carry
    3 timestamps per user per partition."""
    events = load_table(spark, sf, "events")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").cast("long").alias("n_view_users"),
        F.sum(F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0))
        .cast("long")
        .alias("n_click_after_view"),
        F.sum(
            F.when(
                (F.col("t_click") > F.col("t_view")) & (F.col("t_purchase") > F.col("t_click")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_full_funnel"),
    )


def q_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    distinct active users per (cohort, day-offset). First-touch table and
    the event stream both hash-partition on user_id, so Catalyst reuses
    one exchange for the self-join; countDistinct is exact (partial
    distinct aggregation — no driver set)."""
    events = load_table(spark, sf, "events")
    first = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = events.join(first, "user_id").select(
        "user_id",
        F.to_date("first_ts").alias("cohort_d"),
        F.datediff(F.to_date("ts"), F.to_date("first_ts")).alias("day_offset"),
    )
    return (
        joined.groupBy(
            F.col("cohort_d").cast("string").alias("cohort_date"), "day_offset"
        )
        .agg(F.count_distinct(F.col("user_id")).alias("n_users"))
    )


BM25_TERMS = ("spark", "table", "hash")


def q_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 keyword search (k1=1.2, b=0.75, Lucene idf): top-20 documents
    for a fixed conjunctive term set — the retrieval scorer a corpus-
    quality / search-eval pipeline runs. One projection computes per-term
    tf and doc length JVM-side; corpus stats (N, avgdl, per-term df) are
    ONE aggregated row cross-joined back broadcast, so the plan is scan →
    tiny agg → broadcast → scan-side scoring → TakeOrderedAndProject.
    Nothing shuffles by document."""
    from onetable_spark.functions.text import tokens

    docs = load_table(spark, sf, "documents")
    k1, b = 1.2, 0.75
    base = docs.select(
        "doc_id",
        F.size(tokens("text")).alias("dl"),
        *[
            F.size(F.filter(tokens("text"), (lambda term: lambda x: x == term)(t))).alias(
                f"tf_{t}"
            )
            for t in BM25_TERMS
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).cast("double").alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for t in BM25_TERMS:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
        )
        tf = F.col(f"tf_{t}").cast("double")
        part = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        score = part if score is None else score + part
    return (
        scored.select("doc_id", F.round(score, 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


# Broadcasting the arriving batch's gram table is only right while it is
# small (~16 B/row → ~32 MB at this limit); above it the plan falls back
# to a plain equi-join that AQE can shuffle/skew-split. Tests shrink this
# to 0 to exercise the shuffle branch.
_INCR_BROADCAST_GRAM_LIMIT = 2_000_000


def q_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental (batch-vs-corpus) near-dup detection: the arriving
    batch (doc_id % 10 == 0 plays the new delivery) is checked against
    the EXISTING corpus only — the shape every production ingest runs,
    where re-deduplicating the whole corpus per delivery would be
    quadratic in deliveries. When the batch is genuinely small its
    distinct 3-gram hashes broadcast and the corpus inverted index
    streams past map-side; a LARGE delivery (a multi-TB crawl drop) would
    blow the broadcast, so a one-scalar size probe switches to a plain
    equi-join and lets AQE pick the strategy (skew-splittable both ways).
    Overlap counts aggregate per (new, existing) pair and
    J = ov/(sz_n + sz_e − ov) exactly (distinct gram sets)."""
    from onetable_spark.functions.text import ngram_hash_rows

    docs = load_table(spark, sf, "documents")
    grams = ngram_hash_rows(docs, n=3)
    sz = grams.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    batch = grams.filter(F.col("id") % 10 == 0).select(
        F.col("id").alias("new_id"), "gh"
    )
    corpus = grams.filter(F.col("id") % 10 != 0).select(
        F.col("id").alias("dup_of"), "gh"
    )
    # driver-ok: one-scalar size probe picks the join strategy; both
    # branches are value-identical (pytest covers the shuffle branch by
    # shrinking the limit to 0)
    small_batch = batch.count() <= _INCR_BROADCAST_GRAM_LIMIT
    probe = F.broadcast(batch) if small_batch else batch
    ov = (
        corpus.join(probe, "gh")
        .groupBy("new_id", "dup_of")
        .agg(F.count(F.lit(1)).alias("ov"))
    )
    return (
        ov.join(sz.select(F.col("id").alias("new_id"), F.col("sz").alias("sz_n")), "new_id")
        .join(sz.select(F.col("id").alias("dup_of"), F.col("sz").alias("sz_e")), "dup_of")
        .withColumn(
            "jaccard",
            F.round(F.col("ov") / (F.col("sz_n") + F.col("sz_e") - F.col("ov")), 4),
        )
        .filter(F.col("jaccard") >= 0.4)
        .select("new_id", "dup_of", "jaccard")
    )


def _daily_event_counts_gapfilled(spark: SparkSession, sf: str) -> DataFrame:
    """(day, event_type, n_events) with ZERO rows for silent days: the
    resample-with-gap-fill primitive every time-series pipeline needs
    before rates/moving averages are meaningful. The calendar spine is
    sequence(min_day, max_day) from ONE aggregated row and the type list
    is a distinct over a low-cardinality column — both broadcast; the
    event counts left-join onto the spine, so the only per-event work is
    the counting aggregation itself."""
    events = load_table(spark, sf, "events")
    counts = events.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    span = events.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    types = events.select("event_type").distinct()
    spine = days.crossJoin(types)
    return (
        spine.join(counts, ["day", "event_type"], "left")
        .select(
            F.col("day").cast("string").alias("day"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


def q_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Daily event counts resampled onto a dense calendar × type spine
    (zero-filled gaps)."""
    return _daily_event_counts_gapfilled(spark, sf)


def q_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    """7-day trailing moving average per event type over the gap-filled
    daily series — composed on the resample primitive so silent days pull
    the average DOWN (the whole point of filling gaps first). One window
    over (type, day); the series is days × types rows, trivially
    window-able at any corpus scale because the heavy reduction happened
    in the daily aggregation."""
    daily = _daily_event_counts_gapfilled(spark, sf)
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "event_type",
        "n_events",
        F.round(F.avg("n_events").over(w), 4).alias("avg_7d"),
    )


def q_repetition_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition quality gate over the documents table:
    duplicate-token fraction, top-bigram fraction, and the keep/drop
    verdict. Zero-shuffle — see functions.text.repetition_metrics."""
    from onetable_spark.functions.text import repetition_metrics

    docs = load_table(spark, sf, "documents")
    return repetition_metrics(docs)


def q_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    (prev_type → next_type) counts and conditional probabilities. The
    sequencing is one LAG window per user partition (single shuffle on
    user_id — the natural key, unskewed); the transition matrix is a
    |types|² aggregate, so the second shuffle moves k² rows no matter the
    corpus size. The per-prev normalization runs as a window over that
    tiny matrix."""
    events = load_table(spark, sf, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(seq).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    norm = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.round(
            F.col("n_trans") / F.sum("n_trans").over(norm).cast("double"), 4
        ).alias("p_next"),
    )


def q_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL++ approximate distinct users per event type, with the sketch's
    error bound asserted INSIDE the plan: the query returns the exact
    count plus a boolean claiming the approx is within 5% of it, so the
    cross-engine oracle (whose own sketch would differ) hash-checks the
    bound rather than the engine-specific estimate. At 100 TB the approx
    side is the one you'd keep: approx_count_distinct is a fixed-size
    mergeable sketch (map-side partial, no exact-distinct expand-shuffle
    of every (type, user) pair)."""
    events = load_table(spark, sf, "events")
    # Two separate aggregations, NOT one fused agg: countDistinct forces a
    # two-phase (type, user) expand, and a fused plan would carry the
    # ~3 KB HLL sketch through that expand shuffle per (type, user) pair.
    # Split, the sketch side is one partial-merge exchange of k rows; the
    # exact side (audit-only — at scale you'd keep just the sketch) pays
    # its expand without the sketch payload. Both results are k rows, so
    # the recombine is a broadcast join.
    approx = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    agg = exact.join(F.broadcast(approx), "event_type")
    return agg.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users").cast("double")
            <= 0.05
        ).alias("within_5pct"),
    )


def q_approx_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable-sketch quantiles (approx_percentile, the KLL/GK-family
    fixed-size sketch) per event type, with the rank guarantee asserted
    IN-PLAN: for each approximate pN the query computes the true rank
    fraction of the returned value and checks |rank − N| ≤ 0.01. The
    hash-checked columns are the exact interpolated quantiles (engine-
    portable) plus the boolean — the sketch value itself is
    engine-specific, its *guarantee* is not. At 100 TB the sketch is the
    plan: fixed-size partial per partition, one k-row merge exchange —
    no global sort, no full-column shuffle (the exact side here is the
    audit harness, same pattern as q_approx_distinct)."""
    events = load_table(spark, sf, "events")
    approx = events.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("ap")
    )
    # rank-audit pass: the sketch's rank guarantee is two-sided on a CDF
    # that can jump at atoms (heavy ties), so the check is
    # p ∈ [frac(value < ap) − ε, frac(value ≤ ap) + ε] — the one-sided
    # |frac(value ≤ ap) − p| form can legitimately trip on a tie atom
    # even when the sketch honored its guarantee (ADVICE r5)
    audited = (
        events.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum((F.col("value") <= F.col("ap")[i]).cast("long")).alias(f"le{i}")
                for i in range(3)
            ],
            *[
                F.sum((F.col("value") < F.col("ap")[i]).cast("long")).alias(f"lt{i}")
                for i in range(3)
            ],
        )
    )
    exact = events.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.5D, 0.95D, 0.99D))").alias("ep")
    )
    targets = [0.5, 0.95, 0.99]
    rank_ok = None
    for i, p in enumerate(targets):
        n = F.col("n").cast("double")
        ok = (F.lit(p) >= F.col(f"lt{i}") / n - 0.01) & (
            F.lit(p) <= F.col(f"le{i}") / n + 0.01
        )
        rank_ok = ok if rank_ok is None else (rank_ok & ok)
    return audited.join(F.broadcast(exact), "event_type").select(
        "event_type",
        F.round(F.col("ep")[0], 4).alias("p50"),
        F.round(F.col("ep")[1], 4).alias("p95"),
        F.round(F.col("ep")[2], 4).alias("p99"),
        rank_ok.alias("rank_within_1pct"),
    )


def q_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic sparse
    doc-representation every retrieval/clustering pipeline derives.
    tf = term_count/doc_len, idf = ln(N/df). Plan: one (doc, term)
    count aggregation (shuffle on the composite key, unskewed), the
    document-frequency table and corpus size reduce to vocabulary-sized
    results that join back as broadcasts, then a per-doc row_number
    window (shuffle on doc_id) takes the top-3 with a deterministic
    (score DESC, term ASC) tie-break on the ROUNDED score so the cut is
    engine-portable."""
    docs = load_table(spark, sf, "documents")
    from onetable_spark.functions.text import tokens

    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # doc length as a window over the tf table: the doc_id hash shuffle it
    # introduces is the SAME partitioning the final top-3 window needs, so
    # Catalyst plans one exchange for both (an agg+join would add its own)
    dl_w = Window.partitionBy("doc_id")
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("n_tok", F.sum("c").over(dl_w))
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("c") / F.col("n_tok").cast("double"))
                * F.log(F.col("n_docs") / F.col("df").cast("double")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", F.col("rk").cast("int").alias("rk"))
    )


def q_source_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based source mixing weights (the multinomial-sampling
    rebalance from the multilingual/multi-source pretraining literature,
    e.g. XLM-R's α-smoothed sampling): per source, token share p_s and
    the α=0.7-tempered weight p_s^α / Σ p_s^α, which upsamples small
    sources relative to raw proportion. One aggregation to source-level
    rows (map-side partial over the corpus scan), then the normalizers
    join back as a single broadcast row — at any corpus size only
    |sources| rows exist past the first agg."""
    from onetable_spark.functions.text import token_count

    docs = load_table(spark, sf, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text").cast("long")).alias("n_tokens"),
    )
    # normalizers as windows over the |sources|-row table (post-reduction,
    # so the unpartitioned window sees k rows, never the corpus)
    w_all = Window.partitionBy()
    mix = per_source.withColumn(
        "share_raw", F.col("n_tokens") / F.sum("n_tokens").over(w_all).cast("double")
    ).withColumn("z", F.sum(F.pow("share_raw", F.lit(0.7))).over(w_all))
    return mix.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("share_raw", 4).alias("share"),
        F.round(F.pow("share_raw", F.lit(0.7)) / F.col("z"), 4).alias("weight_a07"),
    )


def q_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the cheap stand-in for the CCNet/KenLM perplexity
    filter: documents whose tokens are globally rare score low; the
    score buckets drive keep/sample decisions. p(t) = count(t)/T over
    the whole corpus.

    100 TB plan: the LM is the vocabulary-sized (term, count) aggregate
    — bounded by vocabulary (≤ a top-V cap in a real deployment), so it
    joins back as a BROADCAST; per-token rows then reduce straight to
    per-doc means (partial agg). Nothing document-sized ever shuffles
    except the (doc_id, token) stream itself."""
    from onetable_spark.functions.text import tokens

    docs = load_table(spark, sf, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    lm = vocab.crossJoin(total).select(
        "term", F.log(F.col("c") / F.col("t").cast("double")).alias("logp")
    )
    return (
        toks.join(F.broadcast(lm), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("logp"), 4).alias("avg_logprob"),
        )
    )


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\d+\.\d+\.\d+\.\d+"


def q_pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
    """PII detection + redaction report — the scrubbing stage every LLM
    training pipeline runs before text leaves curation (emails, IPv4
    addresses → typed placeholder tokens). The synthetic corpus carries no
    PII, so the query SEEDS deterministic identifiers in-plan (doc_id % 7
    → an email, doc_id % 11 → an IP; the oracle seeds identically), then
    detects with engine-portable regexes (no backrefs/lookaround — valid
    in both Java regex and RE2) and reports per-language doc coverage,
    match counts, and the SIGNED length delta of redaction (chars_delta:
    original length minus redacted length — negative when a placeholder
    is longer than its match, e.g. 'a@b.co' → '<EMAIL>'; ADVICE r6 #2).

    100 TB plan: pure Column expressions (regexp_count / regexp_replace,
    JVM codegen, no UDF) inside one projection; the only shuffle is the
    5-language partial-agg rollup. Redacted text would be written back
    out colocated with its input partition — nothing document-sized moves."""
    docs = load_table(spark, sf, "documents")
    seeded = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"), F.lit(".0.1 logged")),
        ).otherwise(F.lit("")),
    )
    st = docs.select(
        "lang",
        F.regexp_count(seeded, F.lit(_PII_EMAIL)).alias("n_em"),
        F.regexp_count(seeded, F.lit(_PII_IPV4)).alias("n_ip"),
        (
            F.length(seeded)
            - F.length(
                F.regexp_replace(
                    F.regexp_replace(seeded, _PII_EMAIL, "<EMAIL>"), _PII_IPV4, "<IP>"
                )
            )
        ).alias("chars_delta"),
    )
    return st.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_em") + F.col("n_ip") > 0).cast("int")).cast("long").alias("docs_with_pii"),
        F.sum("n_em").cast("long").alias("n_emails"),
        F.sum("n_ip").cast("long").alias("n_ips"),
        F.sum("chars_delta").cast("long").alias("chars_delta"),
    )


def q_contamination_span(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark contamination by LONGEST CONTIGUOUS overlap span — the
    stricter sibling of `decontam_overlap`: a doc sharing 30 scattered
    3-grams with the benchmark is noise, one sharing a 30-gram contiguous
    RUN is a verbatim leak (Lee et al. 2022 exact-substring criterion,
    approximated on the gram lattice). Benchmark = doc_id % 97 == 0, same
    split as decontam_overlap.

    100 TB plan: gram hashes are computed doc-side in one projection and
    posexploded WITH position; the benchmark's distinct grams broadcast
    (benchmark-sized, tiny); only HIT positions — a sparse subset — reach
    the per-doc rollup, where the sorted position array reduces to its
    longest consecutive run with one O(hits) `aggregate` pass (the
    repetition_filter sorted-run idiom). No window functions, one shuffle
    of (doc_id, pos) hit rows. Gram hashes come from the persisted
    `_corpus_gram_arrays` intermediate shared with decontam_overlap —
    one tokenize+md5 pass per session."""
    grams = _corpus_gram_arrays(spark, sf, n=3).select(
        "doc_id", F.posexplode("ghs").alias("pos", "gh")
    )
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("gh").distinct()
    hits = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gh")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("ps"))
    )
    run = F.aggregate(
        "ps",
        F.struct(F.lit(-2).alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x - acc.prev == 1, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best, F.when(x - acc.prev == 1, acc.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    return hits.select(
        "doc_id",
        F.size("ps").cast("long").alias("n_hits"),
        run.cast("long").alias("max_span"),
        (run >= 5).alias("flagged"),
    )


def q_cluster_representatives(spark: SparkSession, sf: str) -> DataFrame:
    """Survivorship after near-dup clustering: per cluster, KEEP the
    highest-quality member (longest text, doc_id as tie-break) — the
    "which copy do we train on" decision that follows connected
    components in every dedup pipeline, plus the bytes saved by dropping
    the rest. Consumes the same exact-Jaccard pair set + CC labels as
    `dedup_clusters` (shared `_corpus_neardup_pairs` intermediate).

    100 TB plan: the representative is an ARG-MAX BY STRUCT inside the
    per-cluster aggregate — max(struct(n_chars, -doc_id)) gets map-side
    partial aggregation and never materializes members, unlike a
    rank-1-per-partition window (window partitions skew on mega-clusters
    and cannot be AQE-split; partial aggs can)."""
    from onetable_spark.functions.dedup import connected_components

    pairs = _corpus_neardup_pairs(spark, sf, threshold=0.4)
    comp = connected_components(pairs)
    docs = load_table(spark, sf, "documents").select("doc_id", "n_chars")
    m = comp.join(docs, comp["node"] == docs["doc_id"]).select("component", "doc_id", "n_chars")
    best = F.max(F.struct(F.col("n_chars").alias("c"), (-F.col("doc_id")).alias("neg_id")))
    return (
        m.groupBy(F.col("component").alias("cluster_id"))
        .agg(
            best.alias("b"),
            F.count(F.lit(1)).alias("n_members"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "cluster_id",
            (-F.col("b.neg_id")).cast("long").alias("rep_doc"),
            F.col("b.c").cast("long").alias("rep_chars"),
            F.col("n_members").cast("long").alias("n_members"),
            (F.col("total_chars") - F.col("b.c")).cast("long").alias("chars_saved"),
        )
    )


def q_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style perplexity partition (Wenzek et al. 2020): score every
    document under the corpus unigram LM (the `unigram_logprob` model),
    then split into head / middle / tail quality buckets on fixed
    log-probability cuts (head ≥ −3.40 > middle ≥ −3.41 > tail) and
    report the per-(source, bucket) mixture — the table a data-mixing run
    reads to decide per-bucket sampling temperatures.

    100 TB plan: the LM is vocabulary-bounded → broadcast join; per-token
    rows partial-agg to per-doc scores; final rollup is a tiny
    (source × 3)-row partial agg. One document-stream shuffle total.

    Engine-stability contract: the per-doc score is an EXACT integer —
    each token's logp is fixed to micro units (round(logp*1e6) as long),
    summed with exact (associative, order-independent) integer addition,
    then divided once by n_tokens and rounded to the nearest micro.
    AVG(double) is summation-order-dependent across engines, so a doc
    whose true mean sat within an ulp of a cut used to flip buckets
    between Spark and DuckDB (round-6 red pytest); bucketing on the
    integer micro score makes the cut bit-identical in both engines at
    every scale. avg_lp is likewise an exact long sum divided once."""
    from onetable_spark.functions.text import tokens

    docs = load_table(spark, sf, "documents")
    toks = docs.select("doc_id", "source", F.explode(tokens("text")).alias("term"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    lm = vocab.crossJoin(total).select(
        "term",
        F.round(F.log(F.col("c") / F.col("t").cast("double")) * 1e6)
        .cast("long")
        .alias("logp_micro"),
    )
    per_doc = (
        toks.join(F.broadcast(lm), "term")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("logp_micro").alias("s_micro"),
        )
        .withColumn(
            "lp_micro",
            F.round(F.col("s_micro") / F.col("n_tokens")).cast("long"),
        )
    )
    bucket = (
        F.when(F.col("lp_micro") >= -3400000, "head")
        .when(F.col("lp_micro") >= -3410000, "middle")
        .otherwise("tail")
    )
    return (
        per_doc.select("source", bucket.alias("bucket"), "n_tokens", "lp_micro")
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.sum("lp_micro") / F.count(F.lit(1)) / 1e6, 4).alias("avg_lp"),
        )
    )


def q_zorder_layout(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order (Morton) clustering keys — the space-filling-curve layout
    primitive behind Delta OPTIMIZE ZORDER and Hudi z-order clustering:
    sorting on the interleaved key co-locates rows close in BOTH
    dimensions, so min/max file stats prune multi-column range predicates.
    The 16-bit key interleaves the low 8 bits of (user_id, event_id);
    integer bit math only, identical in any engine. Returns the 100
    lowest-z rows (tie-break event_id) plus each row's z — at corpus
    scale the same expression feeds a range-partitioned write, and the
    plan is a pure projection + TakeOrderedAndProject: ZERO shuffle
    exchanges, partial top-k per partition merged at the driver."""
    from onetable_spark.operators.maintenance import morton_key

    events = load_table(spark, sf, "events")
    z = morton_key(["user_id", "event_id"])
    return (
        events.select("event_id", "user_id", z.alias("zval"))
        .orderBy(F.asc("zval"), F.asc("event_id"))
        .limit(100)
    )


def q_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 corpus-wide tokens by exact frequency (vocabulary heavy
    hitters — the stopword/boilerplate audit every corpus build starts
    with). Plan: explode tokens, hash-aggregate with map-side partial
    combine (the explode output never shuffles raw — only (token, count)
    partials move), then TakeOrderedAndProject for the global top-k with
    a deterministic (count DESC, token ASC) tie-break."""
    docs = load_table(spark, sf, "documents")
    from onetable_spark.functions.text import tokens

    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(20)
    )


def q_streaming_hopping(spark: SparkSession, sf: str) -> DataFrame:
    """The hopping-window aggregation through real Structured Streaming
    execution (file source → watermark → 1h/30min windows → AvailableNow
    → memory sink); same oracle as the batch twin ``hopping_window``."""
    from onetable_spark.streaming.events import hopping_event_counts, read_event_stream, run_available_now

    stream = hopping_event_counts(read_event_stream(spark, sf))
    out = run_available_now(stream, f"hop_{_sf_tag(sf)}", shuffle_partitions=4)
    return out.select(
        F.col("w_start").cast("timestamp").cast("long").alias("w_start_s"),
        "event_type",
        "n_events",
    )


def q_corpus_curation(spark: SparkSession, sf: str) -> DataFrame:
    """The curation pipeline END-TO-END in one declarative plan: language
    gate → quality gate → exact dedup (canonical = lowest id per content
    hash) → deterministic hash-mod subsample → per-language token budget
    rollup. Every stage is a JVM expression; Catalyst fuses the gates into
    the scan and the two aggregations are the only shuffles."""
    from onetable_spark.functions.text import predicted_lang, quality_score, token_count

    docs = load_table(spark, sf, "documents")
    scored = docs.select(
        "doc_id",
        "text",
        predicted_lang("text").alias("lang"),
        quality_score("text").alias("quality"),
        token_count("text").alias("toks"),
    )
    kept = scored.filter(F.col("lang").isin("en", "de", "fr", "es") & (F.col("quality") >= 0.2))
    dedup = kept.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min("toks").alias("toks"),
        F.min("lang").alias("lang"),
    )
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "int"
    ) % 1000
    sampled = dedup.filter(bucket < 500)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").cast("long").alias("total_tokens"),
    )


def q_pivot_events(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: per-user event counts spread across event-type columns.
    Values enumerated explicitly so Spark skips the extra distinct-scan
    (two-pass pivot) — the shape a 100 TB pipeline needs."""
    events = load_table(spark, sf, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase", "error"])
    )


def q_unpivot_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot/melt: wide per-nation aggregates → long (metric, value)
    rows via the stack-style unpivot operator."""
    cust = load_table(spark, sf, "customer")
    wide = cust.groupBy("c_nationkey").agg(
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        F.count(F.lit(1)).cast("double").alias("n_custs"),
    )
    return wide.unpivot(
        ids=["c_nationkey"],
        values=["total_bal", "avg_bal", "n_custs"],
        variableColumnName="metric",
        valueColumnName="value",
    )


def q_intersect_keys(spark: SparkSession, sf: str) -> DataFrame:
    """Set intersection: nations having BOTH customers and suppliers."""
    cust = load_table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


def q_full_outer_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Full outer join of per-nation customer vs supplier balance
    aggregates — both sides pre-aggregated so the join is tiny."""
    cust = (
        load_table(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_bal"))
    )
    supp = (
        load_table(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp_bal"))
    )
    return cust.join(supp, "nationkey", "full_outer")


def q_rollup_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (region → nation → NULL superrows) —
    one pass, Spark expands grouping sets inside the aggregate."""
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    joined = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


def q_cube_agg(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping-set combinations
    in one pass."""
    li = load_table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_percentile_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Exact percentiles per group (continuous interpolation) — the
    ordered-statistics operator; at 100 TB swap in approx_percentile with a
    bounded error instead of the exact sort-based path."""
    li = load_table(spark, sf, "lineitem")
    # array-of-fractions form: ONE ordered aggregation per column instead
    # of one per requested percentile
    price_ps = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)))
    return li.groupBy("l_returnflag").agg(
        F.round(F.get(price_ps, 0), 4).alias("p50_price"),
        F.round(F.get(price_ps, 1), 4).alias("p95_price"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
    )


def q_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour window aggregation over events (batch twin of
    ``streaming.tumbling_event_counts``); window start surfaced as epoch
    seconds so the value-hash is engine-neutral."""
    events = load_table(spark, sf, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("w_start_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def q_hopping_window(spark: SparkSession, sf: str) -> DataFrame:
    """Hopping window (1 h length, 30 min slide): each event contributes to
    exactly 2 windows (batch twin of ``streaming.hopping_event_counts``)."""
    events = load_table(spark, sf, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("timestamp").cast("long").alias("w_start_s"), "event_type", "n_events")
    )


def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each event picks the user's most recent order at/before
    the event time (union-merge plan — no non-equi join; see
    ``operators.temporal.asof_join``). (custkey, date) ties resolve to the
    max-orderkey row via the window's ``right_tiebreak`` — the same pick a
    max_by pre-dedup made in earlier rounds, minus that dedup's whole
    aggregation exchange (r15: Exchange 4→2 in the formatted plan; the tie
    rows ride the one window sort the as-of already pays)."""
    from onetable_spark.operators.temporal import asof_join

    events = load_table(spark, sf, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").cast("long").alias("ts_s")
    )
    orders = load_table(spark, sf, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").cast("long").alias("od_s"),
        "o_orderkey",
        "o_totalprice",
    )
    return asof_join(
        events,
        orders,
        on="user_id",
        left_ts="ts_s",
        right_ts="od_s",
        right_cols=["o_orderkey", "o_totalprice"],
        right_tiebreak="o_orderkey",
    )


def q_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Banded range join: parts histogrammed into retail-price bands via a
    broadcast non-equi join (BroadcastNestedLoopJoin — fact side never
    shuffles; see ``operators.temporal.banded_range_join``)."""
    from onetable_spark.operators.temporal import banded_range_join

    bands = local_rows_df(
        spark, PRICE_BANDS, "band string, lo double, hi double"
    ).select("band", "lo", "hi")
    parts = load_table(spark, sf, "part")
    joined = banded_range_join(parts, bands, "p_retailprice")
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
    )


PRICE_BANDS = [
    ("budget", 0.0, 925.0),
    ("mid", 925.0, 950.0),
    ("premium", 950.0, 975.0),
    ("luxury", 975.0, 10_000_000.0),
]


def _sf_tag(sf: str) -> int:
    """Stable per-sf-dir tag for streaming memory-sink/query names —
    Python's hash() is PYTHONHASHSEED-randomized across processes, which
    would make sink names unreproducible between runs."""
    import zlib

    return zlib.crc32(sf.encode())


def _scratch_dir(family: str, sf: str) -> str:
    """Per-(process, sf) scratch dir for the e2e sync queries. Keyed by
    pid so two harness processes on one host can't rmtree each other's
    live tables mid-query (same isolation _CORPUS_CACHE uses for its
    session keying); the query output never contains the path, so the
    keying cannot affect the correctness hash."""
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), family, f"{os.getpid()}-{os.path.basename(sf.rstrip('/'))}"
    )


def _require(cond: bool, detail) -> None:
    """Lifecycle-stage invariant for the staged sync builds. A plain
    ``assert`` is stripped under ``python -O``, silently staging a broken
    lifecycle whose failure would only surface later as an opaque oracle
    hash mismatch (ADVICE r7) — raise for real instead."""
    if not cond:
        raise RuntimeError(f"staged sync lifecycle invariant failed: {detail}")


def _validate_staged(
    spark: SparkSession,
    base: str,
    source_fmt: str,
    target_fmts: tuple[str, ...],
    skip_spec: tuple[str, ...] = (),
    skip_schema: tuple[str, ...] = (),
) -> None:
    """Post-stage regression tripwire (VERDICT r7 #8): every staged e2e
    lifecycle runs the SyncValidator over its FINAL state before the
    query consumes it — a commit-plane change that drifts a target's
    spec/schema/counts/stats now fails the staging loudly instead of
    surfacing rounds later as an oracle hash mismatch. ``skip_spec``
    names targets whose partition spec legitimately diverges (e.g. the
    Hudi pinned-config rejection in sync_partition_evolution);
    ``skip_schema`` names targets whose schema legitimately diverges
    (Delta materializes generated partition columns as physical schema
    fields — schema/partitions.py C5 — where Iceberg/Hudi carry only the
    transform)."""
    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.sync.validation import (
        ALL_CHECKS,
        SyncValidator,
        ValidationCheck,
    )

    readers = {
        "DELTA": lambda: DeltaLog(spark, base),
        "ICEBERG": lambda: IcebergTable(spark, base),
        "HUDI": lambda: HudiTimeline(spark, base),
    }
    validator = SyncValidator()
    source = readers[source_fmt]()
    for fmt in target_fmts:
        checks = tuple(
            c
            for c in ALL_CHECKS
            if not (fmt in skip_spec and c == ValidationCheck.CHECK_TABLE_SPEC)
            and not (fmt in skip_schema and c == ValidationCheck.CHECK_SCHEMA)
        )
        results = validator.validate(source, readers[fmt](), checks)
        bad = {k.value: r.error_message for k, r in results.items() if not r.success}
        _require(not bad, f"post-stage validation {source_fmt}->{fmt}: {bad}")


#: per-family staging build seconds for the CURRENT process (filled by
#: _staged_once; bench.py reports these as separate "staging" entries so
#: sync_* per-query times measure the read-back plan, not whichever query
#: happened to stage first — VERDICT r8/r9 task: plan-attributable times)
STAGING_SECONDS: dict[str, float] = {}

#: every registry query whose first call stages a table lifecycle via
#: _staged_once (bench.py pre-stages exactly these before its timed loop)
STAGED_QUERIES: tuple[str, ...] = (
    "sync_changes", "sync_time_travel", "sync_validation",  # shared otb_2c_q
    "sync_inventory", "sync_schema_evolution", "sync_recovery",
    "sync_partition_evolution", "sync_safety_fallback", "sync_catchup",
    "sync_bucket_spec", "delta_cdf", "iceberg_changelog", "hudi_changelog",
    "streaming_cdf",
    # r14 lifecycle families
    "sync_bucket_decimal", "hudi_cdc_feed", "hudi_changelog_updates",
    "streaming_iceberg_appends",
    "sync_foreign_table", "sync_foreign_iceberg", "sync_foreign_iceberg_deletes",
    "sync_delta_dv", "ann_ivfpq_persisted", "hudi_mor_views",
    "iceberg_eq_deletes", "dv_translation", "hudi_delete_translation",
    "hudi_mor_compaction", "iceberg_rewrite_files", "delta_dv_purge",
    "iceberg_upsert", "delta_upsert", "hudi_upsert", "streaming_upsert",
    "iceberg_wap", "iceberg_manifest_compaction", "delta_v2_checkpoint",
    "zorder_compaction",
    "vacuum_orphans", "streaming_sink_inventory", "multimodal_ingest",
    "streaming_cdc_feed", "streaming_cdc_hudi", "sync_continuous",
)


def _staged_once(spark: SparkSession, sf: str, family: str, builder):
    """Build-once-per-(session, sf) staging for the e2e sync queries
    (VERDICT r6 #6): each sync_* query stages a deterministic throwaway
    table lifecycle under /tmp; sessions that run a query more than once
    (the oracle gate, the smoke matrix) re-ran the whole build every
    call. The FIRST call per session builds (rmtree + fresh lifecycle),
    later calls reuse the build's returned context; the scratch dir stays
    pid-keyed so concurrent harness processes cannot rmtree each other's
    live tables. Build wall-clock lands in ``STAGING_SECONDS[family]``.
    Thread-safe (r12): bench.py stages families from a thread pool, and
    several queries share one family — a per-key lock makes the build
    exactly-once instead of two threads rmtree-ing each other's
    half-built lifecycle. Returns whatever ``builder(base_dir)``
    returned."""
    import os
    import shutil
    import threading
    import time

    key = ("sync_stage", family, id(spark), sf)
    with _STAGE_LOCK_GUARD:
        lock = _STAGE_LOCKS.setdefault(key, threading.Lock())
    with lock:
        if key not in _CORPUS_CACHE:
            base = _scratch_dir(family, sf)
            shutil.rmtree(base, ignore_errors=True)
            os.makedirs(base, exist_ok=True)
            t0 = time.perf_counter()
            _CORPUS_CACHE[key] = builder(base)
            STAGING_SECONDS[family] = round(
                STAGING_SECONDS.get(family, 0.0) + time.perf_counter() - t0, 4
            )
    return _CORPUS_CACHE[key]


def _two_commit_delta_stage(spark: SparkSession, sf: str) -> dict:
    """ONE staged Delta-source lifecycle shared by ``sync_changes`` AND
    ``sync_time_travel`` (they used to build near-identical tables
    separately): f1 commit → full sync to Iceberg + Hudi → capture every
    format's first-commit handle → f2 commit → incremental sync. Returns
    the base dir plus the per-format as-of coordinates."""
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory
    from onetable_spark.sync import SyncClient, source_for, target_for

    def build(base: str) -> dict:
        shutil.copy(os.path.join(sf, "region.parquet"), os.path.join(base, "f1.parquet"))
        schema = spark.read.parquet(base).schema
        log = DeltaLog(spark, base)
        log.init_table(
            Table(name="tbl", base_path=base, table_format=TableFormat.DELTA, read_schema=schema)
        )
        log.commit(adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base))

        client = SyncClient(spark)
        source = source_for(spark, TableFormat.DELTA, base)
        targets = [
            target_for(spark, TableFormat.ICEBERG, base),
            target_for(spark, TableFormat.HUDI, base),
        ]
        r1 = client.sync(source, targets)
        _require(all(r.status.value == "SUCCESS" for r in r1.values()), r1)

        # first-commit handles, one per format's own time-travel coordinate
        ice, hudi = IcebergTable(spark, base), HudiTimeline(spark, base)
        handles = {
            "delta_v1": log.latest_version(),
            "ice_s1": ice.metadata()["current-snapshot-id"],
            "hudi_i1": hudi.latest_instant(),
        }

        f2 = os.path.join(base, "f2.parquet")
        shutil.copy(os.path.join(sf, "region.parquet"), f2)
        log.commit(adds=build_inventory(spark, [f2], root=base))
        r2 = client.sync(source, targets)
        _require(all(r.status.value == "SUCCESS" for r in r2.values()), r2)
        _require(all(r.mode.value == "INCREMENTAL" for r in r2.values()), r2)
        _validate_staged(spark, base, "DELTA", ("ICEBERG", "HUDI"))
        return {"base": base, **handles}

    return _staged_once(spark, sf, "otb_2c_q", build)


def q_streaming_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    """The tumbling-window aggregation run through Structured Streaming
    (file source → watermark → window agg → AvailableNow → memory sink) —
    same oracle as the batch twin, so the STREAMING result is value-hash
    verified against ANSI SQL."""
    from onetable_spark.streaming.events import read_event_stream, run_available_now, tumbling_event_counts

    stream = tumbling_event_counts(read_event_stream(spark, sf))
    out = run_available_now(stream, f"win_{_sf_tag(sf)}", shuffle_partitions=4)
    return out.select(
        F.col("w_start").cast("timestamp").cast("long").alias("w_start_s"), "event_type", "n_events", "total_value"
    )


def q_streaming_approx_reach(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed unique-user reach through real Structured Streaming with
    the HLL++ sketch (the only distinct-count that exists on unbounded
    streams), audited per window: the batch side recomputes the exact
    distinct count and every streaming-emitted window must land within the
    sketch's 3-sigma envelope (rsd 0.02 → 6% relative), with an absolute
    floor of 4 because Spark's HLL++ has no sparse-exact mode — a
    two-user window can legitimately read 3. The inner join means a
    window the stream failed to emit shows up as a row-count mismatch
    against the oracle — emission completeness is part of the check."""
    from onetable_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        windowed_approx_reach,
    )

    stream = windowed_approx_reach(read_event_stream(spark, sf))
    out = run_available_now(stream, f"reach_{_sf_tag(sf)}", shuffle_partitions=4)
    approx = out.select(
        F.col("w_start").cast("timestamp").cast("long").alias("w_start_s"),
        "event_type",
        "approx_users",
    )
    events = load_table(spark, sf, "events")
    exact = events.groupBy(
        F.date_trunc("hour", "ts").alias("wd"), "event_type"
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    exact = exact.select(
        F.col("wd").cast("timestamp").cast("long").alias("w_start_s"),
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
    )
    return exact.join(approx, ["w_start_s", "event_type"]).select(
        "w_start_s",
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(4.0), F.ceil(F.col("exact_users") * 0.06).cast("double"))
        ).alias("within_bound"),
    )


def q_stateful_running_totals(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running totals; after draining the backlog the final state equals the
    plain GROUP BY — which is exactly what the oracle checks. Updates from
    multiple micro-batches are collapsed with max(n_events) (monotonic)."""
    from onetable_spark.streaming.events import read_event_stream, run_available_now, user_running_totals

    stream = user_running_totals(read_event_stream(spark, sf))
    out = run_available_now(stream, f"tot_{_sf_tag(sf)}", output_mode="update", shuffle_partitions=4)
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )


def _subset_recall_contract(
    exact: DataFrame, approx: DataFrame, prefix: str, bound: float
) -> DataFrame:
    """One-row contract for an approximate pair-finder vs its exact twin:
    ``{prefix}_subset_ok`` (no approx pair outside the exact set — an
    invariant when candidates are exact-verified) and ``{prefix}_recall_ok``
    (the finder recovers ≥ ``bound`` of the exact set at its pinned
    seeds). Shared by the minhash and semdedup contract queries so the
    join/threshold logic cannot diverge between them."""
    stats = (
        exact.select("id_a", "id_b", F.lit(1).alias("_ex"))
        .join(
            approx.select("id_a", "id_b").withColumn("_ap", F.lit(1)),
            ["id_a", "id_b"],
            "full_outer",
        )
        .agg(
            F.count("_ex").alias("n_exact"),
            F.count(F.when(F.col("_ex").isNotNull() & F.col("_ap").isNotNull(), 1)).alias(
                "n_found"
            ),
            F.count(F.when(F.col("_ex").isNull(), 1)).alias("n_viol"),
        )
    )
    return stats.select(
        (F.col("n_viol") == 0).alias(f"{prefix}_subset_ok"),
        (F.col("n_found") >= F.col("n_exact") * bound).alias(f"{prefix}_recall_ok"),
    )


def _exact_embedding_topk(corpus: DataFrame, query: list[float], k: int = 10) -> DataFrame:
    """Brute-force cosine top-k under the deterministic total order
    (rounded cosine desc, vec_id asc) — the oracle-expressible ground
    truth both ANN contract queries output."""
    from onetable_spark.functions.similarity import cosine

    qcol = F.array(*[F.lit(float(x)) for x in query])
    return (
        corpus.select("vec_id", F.round(cosine(F.col("embedding"), qcol), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def _planted_recall_flag(topk: DataFrame, alias: str, bound: int = 8) -> DataFrame:
    """One-row boolean: the ANN result over the spiked corpus retrieved
    ≥ ``bound`` of the 10 planted near-copies (ids ≥ 1_000_000)."""
    return topk.agg(
        F.count(F.when(F.col("vec_id") >= 1_000_000, 1)).alias("nf")
    ).select((F.col("nf") >= bound).alias(alias))


def _planted_near_dups(spark: SparkSession, query: list[float]) -> DataFrame:
    """10 jittered copies of the query vector (ids 1_000_000+j, coordinate
    j%dim nudged 1% — cosine to the query stays > 0.99), the deterministic
    high-cosine probe set both ANN contracts retrieve against. Mirrors the
    pinned-seed scheme tests/test_pipeline_functions.py:test_ann_recall_bounds
    proves the ≥0.8 bound for."""
    rows = []
    for j in range(10):
        v = list(query)
        v[j % len(v)] = v[j % len(v)] * 1.01 + 0.001
        rows.append((1_000_000 + j, [float(x) for x in v]))
    return local_rows_df(spark, rows, "vec_id long, embedding array<float>")


def q_ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF approximate top-10: k-means coarse quantizer trained ONCE per
    (session, sf) via _ivf_centroids (index reuse — the production IVF
    contract), probe the 4 nearest of 16 clusters (exact twin:
    embedding_topk).

    Driver-gated via an IN-PLAN deterministic contract (no more rows-only
    check): the output is the EXACT brute-force top-10 (deterministic,
    oracle = the embedding_topk SQL) plus two constant booleans from the
    IVF runs — ``ivf_planted_recall_ok`` (IVF over the corpus spiked with
    10 planted near-copies of the query retrieves ≥ 8 of them; measured
    10/10 at sf0.001/0.01/0.1) and ``ivf_raw_recall_ok`` (IVF@nprobe=4/16
    still recovers ≥ 4 of the true top-10 on the raw near-random corpus;
    measured 5/4/5). A mis-trained quantizer or broken probe selection
    flips a boolean and fails the driver's hash gate."""
    from onetable_spark.functions.similarity import ivf_topk

    emb = load_table(spark, sf, "embeddings")
    # driver-ok: single-row query-vector fetch
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    corpus = emb.filter(F.col("vec_id") != 0)
    centroids = _ivf_centroids(spark, sf)

    exact = _exact_embedding_topk(corpus, query)
    spiked = corpus.select("vec_id", "embedding").unionByName(
        _planted_near_dups(spark, query)
    )
    planted_ok = _planted_recall_flag(
        ivf_topk(spiked, query, k=10, centroids=centroids), "ivf_planted_recall_ok"
    )
    raw_ok = (
        ivf_topk(corpus, query, k=10, centroids=centroids)
        .select("vec_id")
        .join(exact.select("vec_id"), "vec_id")
        .agg(F.count(F.lit(1)).alias("ni"))
        .select((F.col("ni") >= 4).alias("ivf_raw_recall_ok"))
    )
    return exact.crossJoin(F.broadcast(planted_ok)).crossJoin(F.broadcast(raw_ok))


def q_ann_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization approximate top-10 (Jégou et al. 2011, r10):
    per-subspace codebooks trained ONCE per (session, sf) via
    _pq_codebooks, 8 one-byte codes per 64-dim vector (32x compression),
    asymmetric-distance scan over the CODES only, exact cosine rerank of
    the top-64 candidates (exact twin: embedding_topk).

    Driver-gated via the same in-plan contract as the LSH/IVF queries:
    the output is the EXACT brute-force top-10 plus two constant booleans
    — ``pq_planted_recall_ok`` (PQ over the corpus spiked with 10 planted
    near-copies retrieves ≥ 8; measured 10/10 at sf0.001/0.01/0.1) and
    ``pq_raw_recall_ok`` (the ADC+rerank pipeline recovers ≥ 6 of the
    true top-10 on the raw corpus; measured 8/9/7). Mis-trained
    codebooks, a broken distance table, or a broken rerank flip a boolean
    and fail the driver's hash gate."""
    from onetable_spark.functions.similarity import pq_topk

    emb = load_table(spark, sf, "embeddings")
    # driver-ok: single-row query-vector fetch
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    corpus = emb.filter(F.col("vec_id") != 0)
    books = _pq_codebooks(spark, sf)

    exact = _exact_embedding_topk(corpus, query)
    spiked = corpus.select("vec_id", "embedding").unionByName(
        _planted_near_dups(spark, query)
    )
    planted_ok = _planted_recall_flag(
        pq_topk(spiked, query, k=10, codebooks=books), "pq_planted_recall_ok"
    )
    raw_ok = (
        pq_topk(corpus, query, k=10, codebooks=books)
        .select("vec_id")
        .join(exact.select("vec_id"), "vec_id")
        .agg(F.count(F.lit(1)).alias("np"))
        .select((F.col("np") >= 6).alias("pq_raw_recall_ok"))
    )
    return exact.crossJoin(F.broadcast(planted_ok)).crossJoin(F.broadcast(raw_ok))


def q_ann_ivfpq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ approximate top-10 (Jégou et al. 2011 §IVFADC, r10 — the
    canonical billion-scale layout): coarse quantizer + RESIDUAL PQ
    codebooks trained ONCE per (session, sf) via _ivfpq_index; the scan
    probes 4 of 16 clusters and scores members by asymmetric distance on
    the residual codes (per-cluster (m x n_codes) lookup tables, constant
    <q, centroid> term), then reranks the top-64 exactly. Exact twin:
    embedding_topk.

    Same in-plan contract as the LSH/IVF/PQ queries: exact brute-force
    top-10 as the hashed output plus ``ivfpq_planted_recall_ok`` (≥ 8 of
    10 planted near-copies retrieved; measured 10/10 at every sf) and
    ``ivfpq_raw_recall_ok`` (≥ 2 of the true top-10 recovered while
    scanning only ~4/16 of a near-random corpus; measured 4/3/3)."""
    from onetable_spark.functions.similarity import ivfpq_topk

    emb = load_table(spark, sf, "embeddings")
    # driver-ok: single-row query-vector fetch
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    corpus = emb.filter(F.col("vec_id") != 0)
    index = _ivfpq_index(spark, sf)

    exact = _exact_embedding_topk(corpus, query)
    spiked = corpus.select("vec_id", "embedding").unionByName(
        _planted_near_dups(spark, query)
    )
    planted_ok = _planted_recall_flag(
        ivfpq_topk(spiked, query, k=10, index=index), "ivfpq_planted_recall_ok"
    )
    raw_ok = (
        ivfpq_topk(corpus, query, k=10, index=index)
        .select("vec_id")
        .join(exact.select("vec_id"), "vec_id")
        .agg(F.count(F.lit(1)).alias("nq"))
        .select((F.col("nq") >= 2).alias("ivfpq_raw_recall_ok"))
    )
    return exact.crossJoin(F.broadcast(planted_ok)).crossJoin(F.broadcast(raw_ok))


def q_ann_ivfpq_persisted(spark: SparkSession, sf: str) -> DataFrame:
    """The PERSISTED IVF-PQ lifecycle (r11 — converts ivfpq_topk's "at
    scale the corpus is stored pre-encoded" docstring into a measured
    plan): the spiked corpus is encoded ONCE into a codes table
    (cluster int, id, codes binary — m bytes a row, ivfpq_encode_codes),
    written hive-partitioned BY CLUSTER and registered as a Delta table;
    the search (ivfpq_topk_from_codes) then probes with a plain
    ``cluster IN (...)`` predicate that Catalyst executes as PARTITION
    PRUNING — the staged plan assertion checks the scan's
    PartitionFilters carries the cluster IN-list, so the other
    n_clusters − n_probe partitions are never opened. Emits the exact
    brute-force top-10 (oracle ground truth) × in-plan contract booleans:
    ivfpq_persisted_recall_ok (≥8/10 planted near-copies retrieved from
    the CODES table alone) and partition_pruned_ok (the plan assertion).
    Staged once per (session, sf)."""
    import os
    import re

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.functions.similarity import (
        ivfpq_encode_codes,
        ivfpq_topk_from_codes,
    )
    from onetable_spark.model import (
        DataLayoutStrategy,
        PartitionField,
        PartitionTransform,
        Table,
        TableFormat,
    )
    from onetable_spark.sources.parquet_inventory import inventory_from_directory

    emb = load_table(spark, sf, "embeddings")
    # driver-ok: single-row query-vector fetch
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    corpus = emb.filter(F.col("vec_id") != 0)
    index = _ivfpq_index(spark, sf)

    def build(base: str) -> dict:
        tbl = os.path.join(base, "codes")
        spiked = corpus.select("vec_id", "embedding").unionByName(
            _planted_near_dups(spark, query)
        )
        codes = ivfpq_encode_codes(spiked, index)
        codes.write.partitionBy("cluster").mode("overwrite").parquet(tbl)
        # register the artifact as a real Delta table (partition spec =
        # identity on cluster) — the lifecycle's metadata half
        log = DeltaLog(spark, tbl)
        log.init_table(
            Table(
                name="ivfpq_codes",
                base_path=tbl,
                table_format=TableFormat.DELTA,
                read_schema=spark.read.parquet(tbl).schema,
                partition_fields=(
                    PartitionField(
                        source_field="cluster",
                        transform=PartitionTransform.VALUE,
                        partition_field_name="cluster",
                    ),
                ),
                layout=DataLayoutStrategy.HIVE_STYLE_PARTITION,
            )
        )
        log.commit(adds=inventory_from_directory(spark, tbl))
        return {"dir": tbl}

    stage = _staged_once(spark, sf, "otb_pqcodes_q", build)
    codes_df = spark.read.parquet(stage["dir"])
    # the rerank side must hold every id the codes table knows — the
    # spiked corpus (raw + planted), exactly what was encoded
    spiked = corpus.select("vec_id", "embedding").unionByName(
        _planted_near_dups(spark, query)
    )
    topk = ivfpq_topk_from_codes(codes_df, spiked, query, index, k=10)
    planted_ok = _planted_recall_flag(topk, "ivfpq_persisted_recall_ok")

    # plan assertion: the probe predicate must surface as PartitionFilters
    # on the codes scan (pruning, not a post-scan filter). The probed
    # subplan is rebuilt exactly as ivfpq_topk_from_codes builds it.
    import numpy as np

    cents = np.asarray(index[0], dtype=np.float64)
    qv = np.asarray(query, dtype=np.float64)
    qv /= np.linalg.norm(qv)
    probe = [int(c) for c in np.argsort(-(cents @ qv))[:4]]
    probed_plan = (
        codes_df.where(F.col("cluster").isin(probe))
        ._jdf.queryExecution().executedPlan().toString()
    )
    mt = re.search(r"PartitionFilters: \[([^\]]*)\]", probed_plan)
    pruned = bool(mt and "cluster" in mt.group(1) and mt.group(1).strip())
    pruned_ok = local_rows_df(
        spark, [(pruned,)], "partition_pruned_ok boolean"
    )

    exact = _exact_embedding_topk(corpus, query)
    return exact.crossJoin(F.broadcast(planted_ok)).crossJoin(F.broadcast(pruned_ok))


def q_iceberg_eq_deletes(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg v2 EQUALITY deletes, data-assisted (r11): the foreign MoR
    fixture gains an equality-delete snapshot (keys {3, 4} on field id 1)
    ON TOP of the position deletes (every odd key of B). The default scan
    refuses (refused_ok — metadata alone cannot apply eq deletes; the
    reference would resurrect the rows); snapshot_files(
    apply_equality_deletes=True) broadcasts the canonicalized eq tuples,
    scans each data file's eq COLUMNS for match positions on executors,
    and kills exactly the union with the position deletes — key 3 is
    both pos- and eq-deleted and must count ONCE. The oracle recomputes
    the survivors from region rows (B keeps even keys except 4). Staged
    once per (session, sf)."""
    import os

    from onetable_spark.formats.iceberg import IcebergTable

    def build(base: str) -> dict:
        from tools.foreign_iceberg import (
            add_equality_deletes,
            add_position_deletes,
            write_foreign_iceberg_table,
        )

        tbl_dir = os.path.join(base, "region")
        os.makedirs(tbl_dir)
        truth = write_foreign_iceberg_table(
            spark, tbl_dir, os.path.join(sf, "region.parquet")
        )
        truth = add_position_deletes(spark, tbl_dir, truth)
        add_equality_deletes(spark, tbl_dir, truth)
        refused = False
        try:
            # driver-ok: refusal probe on the 2-file staged table
            IcebergTable(spark, tbl_dir).snapshot_files().collect()
        except Exception as e:  # noqa: BLE001 — executor raise crosses py4j
            refused = "EQUALITY delete" in str(e)
        return {"dir": tbl_dir, "refused_ok": refused}

    stage = _staged_once(spark, sf, "otb_eqdel_q", build)
    return (
        IcebergTable(spark, stage["dir"])
        .snapshot_files(apply_equality_deletes=True)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
            F.lit(stage["refused_ok"]).alias("refused_ok"),
        )
    )


def q_iceberg_rewrite_files(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg COMPACTION that APPLIES row-level deletes (r12):
    ``IcebergTable.rewrite_data_files`` rewrites every data file with
    applicable position AND (opted-in) equality deletes into a new
    parquet WITHOUT the dead rows, publishes one REPLACE snapshot
    (rewritten files ADDED at the new sequence number, untouched files
    carried as EXISTING entries with their ORIGINAL sequence numbers,
    delete manifests dropped), and leaves a table the DEFAULT scan — and
    the reference reader, which ignores delete files entirely
    (IcebergSourceClient.java:169-194) — now reads CORRECTLY. The fixture
    is the foreign MoR table: pos deletes kill every odd key of B, eq
    deletes kill keys {3, 4} (3 overlaps, counts once). Emitted per file:
    file_kind ('A.parquet' carried / 'rewritten' for the fresh parquet —
    its name is a uuid), record_count from the DEFAULT scan (no opt-in —
    the eq-delete refusal is gone because the deletes are gone),
    data_equiv_ok (the new parquet's OWN rows are exactly the survivors —
    data plane == stats plane), time_travel_ok (the pre-rewrite snapshot
    still nets the same counts through its carried delete manifests), and
    idempotent_ok (a second rewrite is a no-op). Staged once per
    (session, sf)."""
    import os

    from onetable_spark.formats.iceberg import IcebergTable

    def build(base: str) -> dict:
        import pyarrow.parquet as pq

        from tools.foreign_iceberg import (
            add_equality_deletes,
            add_position_deletes,
            write_foreign_iceberg_table,
        )

        tbl_dir = os.path.join(base, "region")
        os.makedirs(tbl_dir)
        truth = write_foreign_iceberg_table(
            spark, tbl_dir, os.path.join(sf, "region.parquet")
        )
        truth = add_position_deletes(spark, tbl_dir, truth)
        add_equality_deletes(spark, tbl_dir, truth)
        tbl = IcebergTable(spark, tbl_dir)
        pre_snap = tbl.metadata()["current-snapshot-id"]
        snap = tbl.rewrite_data_files(apply_equality_deletes=True)

        # survivors recomputed from the ORIGINAL data plane: B keeps the
        # even keys except 4
        b_keys = pq.read_table(
            os.path.join(tbl_dir, "data", "B.parquet"), columns=["r_regionkey"]
        )["r_regionkey"].to_pylist()
        survivors = sorted(k for k in b_keys if k % 2 == 0 and k not in (3, 4))
        # driver-ok: 2-file staged inventory, stage-time checks only
        inv_rows = tbl.snapshot_files().collect()
        rows = {
            os.path.basename(r["path"]): r["record_count"] for r in inv_rows
        }
        new_name = next(
            (n for n in rows if n.startswith("rewritten-")), None
        )
        equiv = False
        if snap is not None and new_name is not None:
            got = pq.read_table(
                os.path.join(tbl_dir, "data", new_name), columns=["r_regionkey"]
            )["r_regionkey"].to_pylist()
            equiv = sorted(got) == survivors
        # time travel: the PRE-rewrite snapshot still nets through its
        # delete manifests (carried EXISTING entries kept original seqs)
        pre_df = tbl.snapshot_files(
            snapshot_id=pre_snap, apply_equality_deletes=True
        )
        # driver-ok: 2-file staged inventory, stage-time check
        pre_inv = pre_df.collect()
        pre = {
            os.path.basename(r["path"]): r["record_count"] for r in pre_inv
        }
        tt_ok = (
            pre.get("A.parquet") == rows.get("A.parquet")
            and pre.get("B.parquet") == len(survivors)
        )
        idem = tbl.rewrite_data_files(apply_equality_deletes=True) is None
        return {"dir": tbl_dir, "equiv": equiv, "tt": tt_ok, "idem": idem}

    stage = _staged_once(spark, sf, "otb_icrw_q", build)
    return (
        IcebergTable(spark, stage["dir"])
        .snapshot_files()  # DEFAULT scan — deletes are materialized away
        .select(
            F.when(
                F.element_at(F.split("path", "/"), -1).startswith("rewritten-"),
                F.lit("rewritten"),
            )
            .otherwise(F.element_at(F.split("path", "/"), -1))
            .alias("file_kind"),
            F.col("record_count"),
            F.lit(stage["equiv"]).alias("data_equiv_ok"),
            F.lit(stage["tt"]).alias("time_travel_ok"),
            F.lit(stage["idem"]).alias("idempotent_ok"),
        )
    )


def q_delta_dv_purge(spark: SparkSession, sf: str) -> DataFrame:
    """Delta REORG ... APPLY (PURGE) (r12): a spec-authored DV table (f1 +
    f2 region copies, a real RoaringBitmapArray DV on f2 deleting every
    odd-r_regionkey position) is PURGED — ``DeltaLog.
    purge_deletion_vectors`` rewrites f2 without its dead rows (bitmap
    decoded on the executor, pyarrow take of the survivors) and one
    REORG commit removes the DV'd add and adds the purged file with
    honest raw stats. The Iceberg sibling is ``rewrite_data_files``
    (iceberg_rewrite_files). Emitted per live file from the DEFAULT log
    replay: file_kind ('f1.parquet' untouched / 'purged' — the new
    file's name is a uuid), record_count (raw == net now — nothing left
    to subtract), data_equiv_ok (the purged parquet's OWN rows are
    exactly the even keys), time_travel_ok (the pre-purge version still
    nets through the old descriptor), no_dv_ok
    (verify_deletion_vectors is empty after), and idempotent_ok (a
    second purge is a no-op). Staged once per (session, sf)."""
    import json as _json
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.delta_dv import write_dv_file
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        import pyarrow.parquet as pq

        tbl = os.path.join(base, "purge_table")
        os.makedirs(tbl)
        for name in ("f1.parquet", "f2.parquet"):
            shutil.copy(os.path.join(sf, "region.parquet"), os.path.join(tbl, name))
        schema = spark.read.parquet(tbl).schema
        log = DeltaLog(spark, tbl)
        log.init_table(
            Table(name="purge", base_path=tbl, table_format=TableFormat.DELTA,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT)
        )
        log.commit(adds=build_inventory(
            spark, [os.path.join(tbl, n) for n in ("f1.parquet", "f2.parquet")],
            root=tbl,
        ))
        keys = pq.read_table(
            os.path.join(tbl, "f2.parquet"), columns=["r_regionkey"]
        )["r_regionkey"].to_pylist()
        positions = [i for i, k in enumerate(keys) if k % 2 == 1]
        desc = write_dv_file(tbl, positions)
        v = log.latest_version() + 1
        with open(os.path.join(tbl, "_delta_log", f"{v:020d}.json"), "w") as f:
            f.write(_json.dumps({"commitInfo": {"timestamp": 1700000300000,
                                                "operation": "DELETE"}}) + "\n")
            f.write(_json.dumps({"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"]}}) + "\n")
            f.write(_json.dumps({"remove": {
                "path": "f2.parquet", "deletionTimestamp": 1700000300000,
                "dataChange": True}}) + "\n")
            f.write(_json.dumps({"add": {
                "path": "f2.parquet", "partitionValues": {},
                "size": os.path.getsize(os.path.join(tbl, "f2.parquet")),
                "modificationTime": 1700000300000, "dataChange": True,
                "stats": _json.dumps({
                    "numRecords": len(keys),
                    "minValues": {"r_regionkey": str(min(keys))},
                    "maxValues": {"r_regionkey": str(max(keys))},
                    "nullCount": {"r_regionkey": 0}}),
                "deletionVector": desc}}) + "\n")

        pre_version = log.latest_version()
        log.purge_deletion_vectors()
        fresh = DeltaLog(spark, tbl)
        # driver-ok: 2-file staged inventory, stage-time checks only
        inv_rows = fresh.snapshot_files().collect()
        rows = {os.path.basename(r["path"]): r["record_count"] for r in inv_rows}
        survivors = sorted(k for i, k in enumerate(keys) if i not in set(positions))
        purged = next((n for n in rows if n.startswith("purged-")), None)
        equiv = False
        if purged is not None:
            got = pq.read_table(
                os.path.join(tbl, purged), columns=["r_regionkey"]
            )["r_regionkey"].to_pylist()
            equiv = sorted(got) == survivors
        pre_df = fresh.snapshot_files(version=pre_version)
        # driver-ok: 2-file staged inventory, stage-time check
        pre_rows = pre_df.collect()
        pre = {os.path.basename(r["path"]): r["record_count"] for r in pre_rows}
        tt_ok = pre.get("f2.parquet") == len(survivors)
        # driver-ok: emptiness probe on the purged table's DV set
        no_dv = fresh.verify_deletion_vectors().isEmpty()
        idem = fresh.purge_deletion_vectors() is None
        return {
            "dir": tbl, "equiv": equiv, "tt": tt_ok,
            "no_dv": no_dv, "idem": idem,
        }

    stage = _staged_once(spark, sf, "otb_dvpurge_q", build)
    return (
        DeltaLog(spark, stage["dir"])
        .snapshot_files()
        .select(
            F.when(
                F.element_at(F.split("path", "/"), -1).startswith("purged-"),
                F.lit("purged"),
            )
            .otherwise(F.element_at(F.split("path", "/"), -1))
            .alias("file_kind"),
            F.col("record_count"),
            F.lit(stage["equiv"]).alias("data_equiv_ok"),
            F.lit(stage["tt"]).alias("time_travel_ok"),
            F.lit(stage["no_dv"]).alias("no_dv_ok"),
            F.lit(stage["idem"]).alias("idempotent_ok"),
        )
    )


def q_iceberg_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg v2 EQUALITY-DELETE WRITE plane / Flink-style CDC upsert
    (r12): starting from region in one file, ``commit_upsert`` publishes
    ONE snapshot carrying an equality-delete file (the new rows' keys,
    read off the added parquet on executors, strict-less sequence rule)
    plus the new data file — old rows with matching keys die, the new
    file at the same sequence number is untouched. The lifecycle chains:
    u1 upserts keys {0, 2}; u2 re-upserts key {0} (netting u1 too — its
    sequence number is lower); ``commit_equality_deletes`` then purely
    deletes key {4}. The default scan REFUSES (eq deletes present —
    probed in the stage); the data-assisted scan nets every file and the
    oracle recomputes the survivors from region rows. The reference can
    neither author nor read delete files (IcebergSourceClient.java:
    169-194). Staged once per (session, sf)."""
    import os
    import shutil

    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = os.path.join(base, "upsert_table")
        os.makedirs(tbl)
        src = os.path.join(sf, "region.parquet")
        shutil.copy(src, os.path.join(tbl, "f1.parquet"))
        schema = spark.read.parquet(src).schema
        ice = IcebergTable(spark, tbl)
        ice.init_table(
            Table(name="ups", base_path=tbl, table_format=TableFormat.ICEBERG,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT),
            format_version=2,
        )
        ice.commit_overwrite(
            adds=build_inventory(spark, [os.path.join(tbl, "f1.parquet")], root=tbl)
        )
        t = pq.read_table(src)

        def upsert(name: str, keys: list[int]) -> None:
            out = os.path.join(tbl, name)
            pq.write_table(
                t.filter(pc.is_in(t["r_regionkey"], value_set=pa.array(keys))), out
            )
            ice.commit_upsert(
                build_inventory(spark, [out], root=tbl), ["r_regionkey"]
            )

        upsert("u1.parquet", [0, 2])
        upsert("u2.parquet", [0])
        ice.commit_equality_deletes(
            local_rows_df(spark, [(4,)], "r_regionkey bigint"), ["r_regionkey"]
        )
        refused = False
        try:
            # driver-ok: refusal probe on the 3-file staged table
            ice.snapshot_files().collect()
        except Exception as e:  # noqa: BLE001 — executor raise crosses py4j
            refused = "EQUALITY delete" in str(e)
        return {"dir": tbl, "refused_ok": refused}

    stage = _staged_once(spark, sf, "otb_upsert_q", build)
    return (
        IcebergTable(spark, stage["dir"])
        .snapshot_files(apply_equality_deletes=True)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
            F.lit(stage["refused_ok"]).alias("refused_ok"),
        )
    )


def q_delta_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """Delta MERGE-shaped KEYED UPSERT via deletion vectors (r12) — the
    Delta twin of ``iceberg_upsert``: ``DeltaLog.upsert_by_key`` reads
    the new rows' keys off the added parquet on executors, prunes live
    files by min/max stats on the key, resolves matching positions with
    a vectorized pandas merge, and commits the new file plus one DV per
    affected existing file in a single version (the DV carries the UNION
    of old dead positions and new matches — a descriptor replaces, never
    stacks). Lifecycle: u1 upserts keys {0, 2}; u2 re-upserts {0},
    netting u1's copy too. Emits (file_name, record_count, dv_ok) — net
    counts the oracle recomputes from region rows; dv_ok is the
    executor-side bitmap-vs-descriptor decode check over every live DV.
    Staged once per (session, sf)."""
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = os.path.join(base, "merge_table")
        os.makedirs(tbl)
        src = os.path.join(sf, "region.parquet")
        shutil.copy(src, os.path.join(tbl, "f1.parquet"))
        schema = spark.read.parquet(src).schema
        log = DeltaLog(spark, tbl)
        log.init_table(
            Table(name="mrg", base_path=tbl, table_format=TableFormat.DELTA,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT)
        )
        log.commit(
            adds=build_inventory(spark, [os.path.join(tbl, "f1.parquet")], root=tbl)
        )
        t = pq.read_table(src)

        def upsert(name: str, keys: list[int]) -> None:
            out = os.path.join(tbl, name)
            pq.write_table(
                t.filter(pc.is_in(t["r_regionkey"], value_set=pa.array(keys))), out
            )
            log.upsert_by_key(
                build_inventory(spark, [out], root=tbl), ["r_regionkey"]
            )

        upsert("u1.parquet", [0, 2])
        upsert("u2.parquet", [0])
        # driver-ok: one row per live DV'd file (2 in this stage)
        checks = DeltaLog(spark, tbl).verify_deletion_vectors().collect()
        dv_ok = bool(checks) and all(c["dv_ok"] for c in checks)
        return {"dir": tbl, "dv_ok": dv_ok}

    stage = _staged_once(spark, sf, "otb_dmerge_q", build)
    return (
        DeltaLog(spark, stage["dir"])
        .snapshot_files()
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
            F.lit(stage["dv_ok"]).alias("dv_ok"),
        )
    )


def q_hudi_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """Hudi MOR KEYED UPSERT (r12) — the third format's edge of the
    upsert triangle (delta_upsert / iceberg_upsert are the others):
    ``HudiTimeline.upsert_records`` tags a batch against the live base
    files by record key on executors; keys {0, 2} already exist, so they
    become ONE AVRO_DATA log block on f1's file group (numUpdateWrites —
    zero-sum in the realtime view), and two NEW keys (+100) land in a
    fresh base file group, all in one deltacommit. Emits per file from
    the REALTIME view (file_kind 'f1.parquet' / 'inserted' — the insert
    file's name is a uuid): f1 keeps the full region count (updates
    rewrite, never add), the insert group carries exactly 2; refused_ok
    pins the default view's unmerged-log refusal; log_ok is
    verify_log_stats' byte recount; merge_equiv_ok decodes the block and
    proves the updated values ride it for exactly the updated keys.
    Staged once per (session, sf)."""
    import os
    import shutil

    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        from onetable_spark.formats.hudi_log import (
            avro_block_records,
            read_log_blocks,
        )

        tbl = os.path.join(base, "hupsert")
        os.makedirs(tbl)
        src = os.path.join(sf, "region.parquet")
        f1 = os.path.join(tbl, "f1.parquet")
        shutil.copy(src, f1)
        schema = spark.read.parquet(src).schema
        tl = HudiTimeline(spark, tbl)
        tl.init_table(
            Table(name="hup", base_path=tbl, table_format=TableFormat.HUDI,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT,
                  record_key_fields=("r_regionkey",))
        )
        tl.commit(adds=build_inventory(spark, [f1], root=tbl),
                  action="deltacommit")
        region = spark.read.parquet(src)
        batch = (
            region.filter(F.col("r_regionkey").isin(0, 2))
            .withColumn("r_name", F.lit("UPDATED"))
            .unionByName(
                region.orderBy("r_regionkey").limit(2).withColumn(
                    "r_regionkey", F.col("r_regionkey") + F.lit(100)
                )
            )
        )
        tl.upsert_records(batch)
        refused = False
        try:
            # driver-ok: refusal probe on the 2-group staged table
            tl.snapshot_files().collect()
        except Exception as e:  # noqa: BLE001 — py4j-wrapped
            refused = "unmerged log" in str(e)
        # driver-ok: one row per log file (exactly 1 in this stage)
        checks = tl.verify_log_stats().collect()
        log_ok = bool(checks) and all(c["log_ok"] for c in checks)
        equiv = False
        if len(checks) == 1:
            blocks = read_log_blocks(checks[0]["path"])
            _, recs = avro_block_records(blocks[0], decode=True)
            equiv = (
                sorted(r["r_regionkey"] for r in recs) == [0, 2]
                and all(r["r_name"] == "UPDATED" for r in recs)
            )
        return {"dir": tbl, "ok": refused and log_ok, "equiv": equiv}

    stage = _staged_once(spark, sf, "otb_hupsert_q", build)
    return (
        HudiTimeline(spark, stage["dir"])
        .snapshot_files(view="realtime")
        .select(
            F.when(
                F.element_at(F.split("path", "/"), -1) == "f1.parquet",
                F.lit("f1.parquet"),
            )
            .otherwise(F.lit("inserted"))
            .alias("file_kind"),
            F.col("record_count"),
            F.lit(stage["ok"]).alias("log_ok"),
            F.lit(stage["equiv"]).alias("merge_equiv_ok"),
        )
    )


def q_iceberg_wap(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg BRANCHES + TAGS / WRITE-AUDIT-PUBLISH (r12, spec §Refs):
    the staged lifecycle tags the seeded table (`v1.0`), stages a second
    file on an `audit` branch via ``commit_overwrite(branch=...)`` —
    main's current-snapshot-id does NOT move, so table readers keep
    seeing one file while ``snapshot_files(ref='audit')`` sees two —
    runs a snapshot-expiry pass proving refs PIN their snapshots past
    the horizon, then ``publish_branch`` fast-forwards main to the
    audited snapshot in one atomic metadata swap. Emits one row per
    read surface AFTER publish: the published table (2 files, 2n rows)
    and the immutable tag, which still time-travels to the pre-publish
    state (1 file, n rows). audit_ok pins the staged-invisibility and
    expiry-pinning checks from the stage. The reference reads
    currentSnapshot only — no ref support. Staged once per (session,
    sf)."""
    import os
    import shutil
    import time as _time

    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        tbl = os.path.join(base, "wap_table")
        os.makedirs(tbl)
        src = os.path.join(sf, "region.parquet")
        shutil.copy(src, os.path.join(tbl, "f1.parquet"))
        schema = spark.read.parquet(src).schema
        ice = IcebergTable(spark, tbl)
        ice.init_table(
            Table(name="wap", base_path=tbl, table_format=TableFormat.ICEBERG,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT)
        )
        ice.commit_overwrite(
            adds=build_inventory(spark, [os.path.join(tbl, "f1.parquet")], root=tbl)
        )
        main_snap = ice.metadata()["current-snapshot-id"]
        ice.create_tag("v1.0")
        shutil.copy(src, os.path.join(tbl, "f2.parquet"))
        staged = ice.commit_overwrite(
            adds=build_inventory(spark, [os.path.join(tbl, "f2.parquet")], root=tbl),
            branch="audit",
        )
        # staged-invisibility: main did not move, the branch sees 2 files
        audit_ok = (
            ice.metadata()["current-snapshot-id"] == main_snap
            and ice.snapshot_files().count() == 1
            and ice.snapshot_files(ref="audit").count() == 2
        )
        # refs pin their snapshots past the expiry horizon
        ice.commit_overwrite(
            properties={"touch": "1"},
            expire_older_than_millis=int(_time.time() * 1000) + 10_000,
        )
        ids = {s["snapshot-id"] for s in ice.metadata()["snapshots"]}
        audit_ok = audit_ok and staged in ids and main_snap in ids
        audit_ok = audit_ok and ice.publish_branch("audit") == staged
        return {"dir": tbl, "ok": audit_ok}

    stage = _staged_once(spark, sf, "otb_wap_q", build)
    ice = IcebergTable(spark, stage["dir"])

    def surface(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("record_count").cast("long").alias("n_records"),
        ).select(
            F.lit(phase).alias("phase"), "n_files", "n_records",
            F.lit(stage["ok"]).alias("audit_ok"),
        )

    return surface(ice.snapshot_files(), "published").unionByName(
        surface(ice.snapshot_files(ref="v1.0"), "tag_v1")
    )


def q_iceberg_manifest_compaction(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg MANIFEST compaction on a v2 MoR table (r12 —
    ``rewrite_manifests``): four single-file append snapshots plus a
    position-delete commit leave five manifests; ``compact_manifests``
    folds the four DATA manifests into one sharded EXISTING manifest
    whose entries carry their ORIGINAL data sequence numbers EXPLICITLY
    (v2 inheritance is ADDED-only — inheriting here would re-scope the
    deletes off), while the DELETE manifest rides verbatim. Emitted per
    file from the post-compaction DEFAULT scan: net counts must be
    BIT-IDENTICAL to pre-compaction (f0 still nets its two position
    deletes — the oracle recomputes from region rows); folded_ok pins
    the manifest-list shape (1 data manifest + 1 delete manifest, floor
    sequence number below the fold's). The reference cannot compact (or
    even read) v2 manifests. Staged once per (session, sf)."""
    import os
    import shutil

    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        from onetable_spark.formats.avro_codec import read_container

        tbl = os.path.join(base, "cm_table")
        os.makedirs(tbl)
        src = os.path.join(sf, "region.parquet")
        schema = spark.read.parquet(src).schema
        ice = IcebergTable(spark, tbl)
        ice.init_table(
            Table(name="cmq", base_path=tbl, table_format=TableFormat.ICEBERG,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT),
            format_version=2,
        )
        for i in range(4):
            f = os.path.join(tbl, f"f{i}.parquet")
            shutil.copy(src, f)
            ice.commit_overwrite(adds=build_inventory(spark, [f], root=tbl))
        ice.commit_position_deletes(
            local_rows_df(
                spark,
                [(os.path.join(tbl, "f0.parquet"), 0),
                 (os.path.join(tbl, "f0.parquet"), 1)],
                "path string, pos long",
            )
        )
        ok = ice.compact_manifests(threshold=2) is not None
        snap = ice.current_snapshot_meta(ice.metadata())
        _, manifests = read_container(snap["manifest-list"])
        data = [m for m in manifests if m.get("content", 0) == 0]
        dels = [m for m in manifests if m.get("content") == 1]
        ok = (
            ok
            and len(data) == 1
            and len(dels) == 1
            and data[0]["existing_files_count"] == 4
            and data[0]["min_sequence_number"] < data[0]["sequence_number"]
        )
        return {"dir": tbl, "ok": ok}

    stage = _staged_once(spark, sf, "otb_icmc_q", build)
    return (
        IcebergTable(spark, stage["dir"])
        .snapshot_files()
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
            F.lit(stage["ok"]).alias("folded_ok"),
        )
    )


def q_delta_v2_checkpoint(spark: SparkSession, sf: str) -> DataFrame:
    """Delta V2 CHECKPOINT WRITING (r12 — the read side landed in r11
    via foreign fixtures): on a deletion-vector table whose protocol
    advertises v2Checkpoint, ``checkpoint(form='v2', parts=2)`` writes
    the file actions as SIDECAR parquet under ``_delta_log/_sidecars/``
    and one tiny uuid-named top-level file carrying protocol + metaData
    + the spec-required checkpointMetadata action + a sidecar action per
    file. The replay from that checkpoint must reconstruct the SAME net
    state (DV descriptors preserved through the verbatim path — the
    executor bitmap check still passes), and a later commit stacks on
    the checkpoint base. Emits per file (file_name, record_count,
    v2_ok): net counts the oracle recomputes from region rows (f2's DV
    kills every odd key; f3 lands AFTER the checkpoint); v2_ok pins the
    uuid naming, sidecar presence, checkpointMetadata version, and the
    no-feature refusal. Staged once per (session, sf)."""
    import json as _json
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.delta_dv import write_dv_file
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        import pyarrow.parquet as pq

        tbl = os.path.join(base, "v2ck_table")
        os.makedirs(tbl)
        src = os.path.join(sf, "region.parquet")
        for name in ("f1.parquet", "f2.parquet"):
            shutil.copy(src, os.path.join(tbl, name))
        schema = spark.read.parquet(tbl).schema
        log = DeltaLog(spark, tbl)
        log.init_table(
            Table(name="v2ck", base_path=tbl, table_format=TableFormat.DELTA,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT)
        )
        log.commit(adds=build_inventory(
            spark, [os.path.join(tbl, n) for n in ("f1.parquet", "f2.parquet")],
            root=tbl,
        ))
        keys = pq.read_table(
            os.path.join(tbl, "f2.parquet"), columns=["r_regionkey"]
        )["r_regionkey"].to_pylist()
        positions = [i for i, k in enumerate(keys) if k % 2 == 1]
        desc = write_dv_file(tbl, positions)
        v = log.latest_version() + 1
        with open(os.path.join(tbl, "_delta_log", f"{v:020d}.json"), "w") as f:
            f.write(_json.dumps({"commitInfo": {"timestamp": 1700000300000,
                                                "operation": "DELETE"}}) + "\n")
            f.write(_json.dumps({"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"]}}) + "\n")
            f.write(_json.dumps({"remove": {
                "path": "f2.parquet", "deletionTimestamp": 1700000300000,
                "dataChange": True}}) + "\n")
            f.write(_json.dumps({"add": {
                "path": "f2.parquet", "partitionValues": {},
                "size": os.path.getsize(os.path.join(tbl, "f2.parquet")),
                "modificationTime": 1700000300000, "dataChange": True,
                "stats": _json.dumps({"numRecords": len(keys)}),
                "deletionVector": desc}}) + "\n")
        # the v2 form refuses until the feature is advertised
        refused = False
        try:
            log.checkpoint(form="v2")
        except ValueError as e:
            refused = "v2Checkpoint" in str(e)
        v = log.latest_version() + 1
        with open(os.path.join(tbl, "_delta_log", f"{v:020d}.json"), "w") as f:
            f.write(_json.dumps({"commitInfo": {"timestamp": 1700000400000,
                                                "operation": "UPGRADE"}}) + "\n")
            f.write(_json.dumps({"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors", "v2Checkpoint"],
                "writerFeatures": ["deletionVectors", "v2Checkpoint"]}}) + "\n")
        log.checkpoint(form="v2", parts=2)
        log_dir = os.path.join(tbl, "_delta_log")
        tops = [
            x for x in os.listdir(log_dir)
            if ".checkpoint." in x and x.endswith(".parquet")
        ]
        sidecars = os.listdir(os.path.join(log_dir, "_sidecars"))
        top_df = spark.read.parquet(os.path.join(log_dir, tops[0]))
        # driver-ok: one checkpointMetadata row in the tiny top-level file
        ck_row = top_df.where(F.col("checkpointMetadata").isNotNull()).first()
        ok = (
            refused
            and len(tops) == 1
            and len(tops[0].split(".")) == 4
            and bool(sidecars)
            and ck_row["checkpointMetadata"]["version"] == log._last_checkpoint()
        )
        # a post-checkpoint commit stacks on the v2 base
        f3 = os.path.join(tbl, "f3.parquet")
        shutil.copy(src, f3)
        DeltaLog(spark, tbl).commit(adds=build_inventory(spark, [f3], root=tbl))
        return {"dir": tbl, "ok": ok}

    stage = _staged_once(spark, sf, "otb_v2ck_q", build)
    return (
        DeltaLog(spark, stage["dir"])
        .snapshot_files()
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
            F.lit(stage["ok"]).alias("v2_ok"),
        )
    )


def q_dv_translation(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-format ROW-DELETE TRANSLATION (r11 capstone): the foreign
    Iceberg MoR fixture's position deletes are translated into REAL Delta
    deletion vectors (sync_iceberg_deletes_to_delta_dv — RoaringBitmap
    .bins authored on executors, raw counts on the adds, protocol
    upgraded), instead of net-count-only metadata. Emits per file
    (file_name, record_count, dv_ok, data_equiv_ok): record_count is what
    the Delta stats plane now reports (descriptor-netted — must equal the
    Iceberg net counts the oracle recomputes from region rows); dv_ok is
    the executor-side bitmap-vs-descriptor decode check; data_equiv_ok
    proves ROW-LEVEL fidelity — the target parquet with DV positions
    dropped returns exactly the rows the Iceberg reader returns (the
    property net-count sync cannot give: a Delta ENGINE on that target
    would resurrect deleted rows); roundtrip_ok closes the loop — the
    DVs translate BACK into a fresh Iceberg v2 table
    (sync_delta_dvs_to_iceberg: raw-count append + a MoR DELETE commit
    whose spec-shaped position-delete parquet round-trips the original
    positions bit-exactly). Staged once per (session, sf)."""
    import os

    from onetable_spark.formats.delta import DeltaLog

    def build(base: str) -> dict:
        import pyarrow.parquet as pq

        from onetable_spark.formats.delta_dv import read_dv
        from onetable_spark.sync.client import sync_iceberg_deletes_to_delta_dv
        from tools.foreign_iceberg import add_position_deletes, write_foreign_iceberg_table

        tbl_dir = os.path.join(base, "region")
        os.makedirs(tbl_dir)
        truth = write_foreign_iceberg_table(
            spark, tbl_dir, os.path.join(sf, "region.parquet")
        )
        truth = add_position_deletes(spark, tbl_dir, truth)
        sync_iceberg_deletes_to_delta_dv(spark, tbl_dir)
        log = DeltaLog(spark, tbl_dir)
        # driver-ok: one row per DV'd file (exactly 1 in this stage)
        checks = log.verify_deletion_vectors().collect()
        dv_ok = bool(checks) and all(c["dv_ok"] for c in checks)
        # row-level fidelity: target parquet minus DV positions == the
        # Iceberg-semantics rows (fixture: B keeps exactly the even keys)
        dv_add = (
            log._live_adds(log._replay_actions())
            .where(F.col("deletionVector").isNotNull())
            .select("path", "deletionVector")
            # driver-ok: one descriptor row from the 2-file staged table
            .collect()
        )
        equiv = False
        if len(dv_add) == 1:
            positions = set(
                read_dv(tbl_dir, dv_add[0]["deletionVector"].asDict())
            )
            p = dv_add[0]["path"]
            if not os.path.isabs(p):
                p = os.path.join(tbl_dir, p)  # log paths are table-relative
            keys = pq.read_table(p, columns=["r_regionkey"])["r_regionkey"].to_pylist()
            survivors = sorted(k for i, k in enumerate(keys) if i not in positions)
            equiv = survivors == sorted(k for k in keys if k % 2 == 0)
        # the loop back: Delta DVs -> fresh Iceberg v2 position deletes;
        # the final reader must net the SAME counts and the delete parquet
        # must hold the SAME positions
        from onetable_spark.formats.iceberg import IcebergTable
        from onetable_spark.sync.client import sync_delta_dvs_to_iceberg

        hop2 = os.path.join(base, "roundtrip")
        sync_delta_dvs_to_iceberg(spark, tbl_dir, hop2)
        back = {
            os.path.basename(r["path"]): r["record_count"]
            # driver-ok: 2-file staged table read-back
            for r in IcebergTable(spark, hop2).snapshot_files().collect()
        }
        fwd = {
            os.path.basename(r["path"]): r["record_count"]
            # driver-ok: 2-file staged table read-back
            for r in log.snapshot_files().collect()
        }
        roundtrip = back == fwd and len(back) == 2
        if roundtrip and len(dv_add) == 1:
            dels = [
                f for f in os.listdir(os.path.join(hop2, "data"))
                if f.startswith("pos-deletes-")
            ]
            roundtrip = len(dels) == 1 and (
                pq.read_table(os.path.join(hop2, "data", dels[0]))["pos"].to_pylist()
                == sorted(positions)
            )
        return {"dir": tbl_dir, "dv_ok": dv_ok, "equiv": equiv and roundtrip}

    stage = _staged_once(spark, sf, "otb_dvx_q", build)
    return (
        DeltaLog(spark, stage["dir"])
        .snapshot_files()
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
            F.lit(stage["dv_ok"]).alias("dv_ok"),
            F.lit(stage["equiv"]).alias("data_equiv_ok"),
        )
    )


def q_hudi_delete_translation(spark: SparkSession, sf: str) -> DataFrame:
    """The THIRD edge of the cross-format delete triangle (r12): the
    foreign Iceberg MoR fixture's position deletes are translated into a
    Hudi target as REAL HoodieLogFormat DELETE blocks
    (sync_iceberg_deletes_to_hudi_logs — record keys READ AT THE DELETED
    POSITIONS on executors, one type-1 block per affected file group,
    byte layout pinned against the reference's real Hudi-0.14 delete
    block), instead of net-count-only metadata. Emits per file
    (file_name, record_count, log_ok, data_equiv_ok): record_count is the
    REALTIME view's netted count (must equal the Iceberg net counts the
    oracle recomputes from region rows); log_ok is verify_log_stats'
    byte-recount of the stat's numDeletes; data_equiv_ok proves ROW-LEVEL
    fidelity — a key-merge over the base parquet (what a real Hudi MOR
    reader does with the block) returns exactly the rows the Iceberg
    reader returns. The default view REFUSES while unmerged delete logs
    exist (probed in the stage) — the reference's Hudi plane never writes
    log files at all (HudiDataFileExtractor.java:344-363). Staged once
    per (session, sf)."""
    import os

    from onetable_spark.formats.hudi import HudiTimeline

    def build(base: str) -> dict:
        import pyarrow.parquet as pq

        from onetable_spark.formats.hudi_log import (
            delete_block_records,
            read_log_blocks,
        )
        from onetable_spark.sync.client import sync_iceberg_deletes_to_hudi_logs
        from tools.foreign_iceberg import add_position_deletes, write_foreign_iceberg_table

        tbl_dir = os.path.join(base, "region")
        os.makedirs(tbl_dir)
        truth = write_foreign_iceberg_table(
            spark, tbl_dir, os.path.join(sf, "region.parquet")
        )
        truth = add_position_deletes(spark, tbl_dir, truth)
        sync_iceberg_deletes_to_hudi_logs(spark, tbl_dir)
        tl = HudiTimeline(spark, tbl_dir)
        # the default view must refuse while unmerged delete logs exist
        refused = False
        try:
            # driver-ok: refusal probe on the 2-file staged table
            tl.snapshot_files().collect()
        except Exception as e:  # noqa: BLE001 — executor raise crosses py4j
            refused = "unmerged log" in str(e)
        # byte-recount: decoded DELETE records must equal the stat's
        # numDeletes (and no data records in a delete-only log)
        # driver-ok: one row per log file (exactly 1 in this stage)
        checks = tl.verify_log_stats().collect()
        log_ok = bool(checks) and all(
            c["log_ok"] and c["decoded_deletes"] == c["stat_num_deletes"]
            for c in checks
        )
        # row-level fidelity: key-merging the DELETE block over the base
        # parquet (a real MOR reader's move) == Iceberg survivor rows
        equiv = False
        if len(checks) == 1:
            blocks = read_log_blocks(checks[0]["path"])
            _, records = delete_block_records(blocks[0])
            dead = {r["recordKey"] for r in records}
            a = pq.read_table(
                os.path.join(tbl_dir, "data", "A.parquet"), columns=["r_regionkey"]
            )["r_regionkey"].to_pylist()
            b = pq.read_table(
                os.path.join(tbl_dir, "data", "B.parquet"), columns=["r_regionkey"]
            )["r_regionkey"].to_pylist()
            survivors = sorted(k for k in a + b if str(k) not in dead)
            expected = sorted(a + [k for k in b if k % 2 == 0])
            equiv = survivors == expected
        return {
            "dir": tbl_dir,
            "ok": refused and log_ok,
            "equiv": equiv,
        }

    stage = _staged_once(spark, sf, "otb_hdx_q", build)
    return (
        HudiTimeline(spark, stage["dir"])
        .snapshot_files(view="realtime")
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
            F.lit(stage["ok"]).alias("log_ok"),
            F.lit(stage["equiv"]).alias("data_equiv_ok"),
        )
    )


def q_hudi_mor_compaction(spark: SparkSession, sf: str) -> DataFrame:
    """MOR COMPACTION (r12): real log bytes — an AVRO_DATA block
    inserting 3 new keys and a DELETE block killing one existing key —
    are MATERIALIZED into a new base parquet by
    HudiTimeline.compact_file_groups (blocks merged in instant order,
    upsert-by-key; the new file keeps its file group's id so the timeline
    window supersedes the old slice). The DEFAULT view then reads clean
    (no unmerged logs → no refusal) and the oracle recomputes the merged
    count from region rows (+3 inserts −1 delete). data_equiv_ok proves
    the DATA plane: the new parquet's own rows contain the inserted keys,
    not the deleted one, and count exactly what the inventory reports —
    the property a netted-count realtime sync cannot give a target
    engine. A second compact_file_groups() is a no-op (idempotence).
    Staged once per (session, sf)."""
    import os

    from onetable_spark.formats.hudi import HudiTimeline

    def build(base: str) -> dict:
        import shutil

        import pyarrow.parquet as pq

        from onetable_spark.formats.hudi import _file_id_for
        from onetable_spark.formats.hudi_log import write_avro_log_block
        from onetable_spark.model import (
            DataLayoutStrategy,
            FILES_SCHEMA,
            Table,
            TableFormat,
        )
        from onetable_spark.sources.parquet_inventory import build_inventory

        tbl = os.path.join(base, "region")
        os.makedirs(tbl)
        f1 = os.path.join(tbl, "f1.parquet")
        shutil.copy(os.path.join(sf, "region.parquet"), f1)
        schema = spark.read.parquet(f1).schema
        tl = HudiTimeline(spark, tbl)
        tl.init_table(
            Table(name="morc", base_path=tbl, table_format=TableFormat.HUDI,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT,
                  record_key_fields=("r_regionkey",))
        )
        i1 = tl.commit(adds=build_inventory(spark, [f1], root=tbl),
                       action="deltacommit")
        gid = _file_id_for("f1.parquet")
        lp = os.path.join(tbl, f".{gid}_{i1}.log.1_0-0-0")
        sch = {"type": "record", "name": "r",
               "fields": [{"name": "r_regionkey", "type": "int"}]}
        write_avro_log_block(
            lp, [{"r_regionkey": k} for k in (100, 101, 102)], sch,
            "20240101000000000",
        )
        tl.commit(
            adds=local_rows_df(
                spark,
                [(lp, "hoodie_log", {}, os.path.getsize(lp), 3, None, None)],
                FILES_SCHEMA,
            ),
            action="deltacommit",
        )
        tl.commit_delete_logs(
            local_rows_df(spark, [(f1, 0)], "path string, pos long")
        )
        instant = tl.compact_file_groups()
        # driver-ok: 1-file staged table read-back for the equivalence probe
        snap = {r["path"]: r["record_count"] for r in tl.snapshot_files().collect()}
        new_path, n = next(iter(snap.items()))
        rows = pq.read_table(new_path, columns=["r_regionkey"])[
            "r_regionkey"
        ].to_pylist()
        k0 = pq.read_table(f1, columns=["r_regionkey"])["r_regionkey"].to_pylist()[0]
        equiv = (
            instant is not None
            and len(snap) == 1
            and len(rows) == n
            and {100, 101, 102} <= set(rows)
            and k0 not in rows
            and tl.compact_file_groups() is None  # idempotent
        )
        return {"dir": tbl, "equiv": equiv}

    stage = _staged_once(spark, sf, "otb_morc_q", build)
    return (
        HudiTimeline(spark, stage["dir"])
        .snapshot_files()
        .select(
            F.lit("compacted").alias("file_name"),
            F.col("record_count"),
            F.lit(stage["equiv"]).alias("data_equiv_ok"),
        )
    )


def q_hudi_mor_views(spark: SparkSession, sf: str) -> DataFrame:
    """Hudi MERGE-ON-READ views (r11): a staged MOR table — base file f1
    (region copy) plus a spec-authored deltacommit whose log write-stat
    carries numInserts = odd-key rows and numDeletes = zero-key rows (the
    HoodieWriteStat fields real MOR writers record) — read through the
    three postures: the DEFAULT snapshot REFUSES (refused_ok; the
    reference reads stale base files silently,
    HudiDataFileExtractor.java:157), view='read_optimized' reports the
    raw base count, view='realtime' nets the log effects into the file
    group. The oracle recomputes every number from region rows. Staged
    once per (session, sf)."""
    import json as _json
    import os
    import shutil

    from onetable_spark.formats.hudi import (
        HudiTimeline,
        _file_id_for,
        instant_to_millis,
        millis_to_instant,
    )
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        import pyarrow.parquet as pq

        tbl = os.path.join(base, "mor")
        os.makedirs(tbl)
        f1 = os.path.join(tbl, "f1.parquet")
        shutil.copy(os.path.join(sf, "region.parquet"), f1)
        schema = spark.read.parquet(tbl).schema
        tl = HudiTimeline(spark, tbl)
        tl.init_table(
            Table(name="mor", base_path=tbl, table_format=TableFormat.HUDI,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT)
        )
        i1 = tl.commit(adds=build_inventory(spark, [f1], root=tbl),
                       action="deltacommit")
        keys = pq.read_table(f1, columns=["r_regionkey"])["r_regionkey"].to_pylist()
        ins = sum(1 for k in keys if k % 2 == 1)
        dels = sum(1 for k in keys if k == 0)
        gid = _file_id_for("f1.parquet")
        i2 = millis_to_instant(instant_to_millis(i1) + 1000)
        hoodie = os.path.join(tbl, ".hoodie")
        open(os.path.join(hoodie, f"{i2}.deltacommit.requested"), "w").close()
        open(os.path.join(hoodie, f"{i2}.deltacommit.inflight"), "w").close()
        with open(os.path.join(hoodie, f"{i2}.deltacommit"), "w") as f:
            _json.dump({
                "partitionToWriteStats": {"": [{
                    "fileId": gid,
                    "path": f".{gid}_0-0-1.log.1",
                    "prevCommit": i1,
                    "numWrites": ins + dels,
                    "numInserts": ins,
                    "numDeletes": dels,
                    "numUpdateWrites": 0,
                    "totalWriteBytes": 2048,
                    "fileSizeInBytes": 2048,
                    "partitionPath": "",
                }]},
                "operationType": "UPSERT",
                "extraMetadata": {},
            }, f)
        refused = False
        try:
            # driver-ok: refusal probe on the 1-file staged table
            tl.snapshot_files().collect()
        except ValueError as e:
            refused = "unmerged log" in str(e)
        return {"dir": tbl, "refused_ok": refused}

    stage = _staged_once(spark, sf, "otb_mor_q", build)
    tl = HudiTimeline(spark, stage["dir"])
    out = None
    for view in ("read_optimized", "realtime"):
        part = tl.snapshot_files(view=view).select(
            F.lit(view).alias("view_name"),
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
            F.lit(stage["refused_ok"]).alias("refused_ok"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def q_sync_inventory(spark: SparkSession, sf: str) -> DataFrame:
    """The metadata plane under the correctness gate: sync a parquet table
    into Delta + Iceberg + Hudi (full lifecycle: init, inventory with
    footer stats, transactional commit, watermark), then read each
    format's snapshot back and report (format, file, record_count). The
    oracle is plain SQL over the source table — so file-count AND
    footer-derived record counts must survive all three commit planes.
    The staged lifecycle builds once per (session, sf) via _staged_once."""
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import TableFormat
    from onetable_spark.sync import SyncClient, source_for, target_for

    def build(b: str) -> str:
        shutil.copy(os.path.join(sf, "region.parquet"), os.path.join(b, "region.parquet"))
        client = SyncClient(spark)
        results = client.sync(
            source_for(spark, TableFormat.PARQUET, b),
            [
                target_for(spark, TableFormat.DELTA, b),
                target_for(spark, TableFormat.ICEBERG, b),
                target_for(spark, TableFormat.HUDI, b),
            ],
        )
        _require(all(r.status.value == "SUCCESS" for r in results.values()), results)
        # regression tripwire: the three freshly-bootstrapped targets must
        # agree with each other on schema/spec/counts/stats
        _validate_staged(spark, b, "DELTA", ("ICEBERG", "HUDI"))
        return b

    base = _staged_once(spark, sf, "otb_sync_q", build)
    readers = {
        "DELTA": DeltaLog(spark, base).snapshot_files(),
        "ICEBERG": IcebergTable(spark, base).snapshot_files(),
        "HUDI": HudiTimeline(spark, base).snapshot_files(),
    }
    out = None
    for fmt, files in readers.items():
        part = files.select(
            F.lit(fmt).alias("fmt"),
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def q_sync_changes(spark: SparkSession, sf: str) -> DataFrame:
    """The CHANGE-SCAN plane under the correctness gate (S2/S7/S11 —
    HudiDataFileExtractor.java:146-255, DeltaSourceClient.java:106-142,
    IcebergSourceClient.java:169-194): full sync of a Delta source into
    Iceberg + Hudi, then a second source commit synced INCREMENTALLY, then
    each format's change scan for its latest commit read back. The result
    is (format, change, file_name, record_count) for the incremental
    commit — the oracle knows exactly what must have happened: every
    format reports ADD of the second file with the source table's row
    count, and nothing removed. File record counts must survive three
    independent commit encodings (Delta stats JSON, Iceberg manifest avro,
    Hudi commit metadata). The two-commit lifecycle is the staged build
    SHARED with sync_time_travel (_two_commit_delta_stage)."""
    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable

    base = _two_commit_delta_stage(spark, sf)["base"]
    log = DeltaLog(spark, base)
    changes = {
        "DELTA": log.changes_for_version(log.latest_version()),
        "ICEBERG": IcebergTable(spark, base).changes_for_snapshot(
            IcebergTable(spark, base).metadata()["current-snapshot-id"]
        ),
        "HUDI": HudiTimeline(spark, base).changes_for_instant(
            HudiTimeline(spark, base).latest_instant()
        ),
    }
    out = None
    for fmt, tc in changes.items():
        part = tc.diff.added.select(
            F.lit(fmt).alias("fmt"),
            F.lit("add").alias("change"),
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
        )
        removed = tc.diff.removed.select(
            F.lit(fmt).alias("fmt"),
            F.lit("remove").alias("change"),
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.lit(None).cast("long").alias("record_count"),
        )
        both = part.unionByName(removed)
        out = both if out is None else out.unionByName(both)
    return out


def q_sync_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """TIME-TRAVEL reads under the correctness gate (the reference proves
    as-of equivalence across formats in its IT matrix,
    core/src/test/java/io/onetable/ITOneTableClient.java:358-419): build a
    Delta source with one file, full-sync to Iceberg + Hudi, capture each
    format's first-commit handle (Delta version, Iceberg snapshot-id, Hudi
    instant), add a second source file, sync INCREMENTALLY — then read
    every format both AS OF its first commit and at latest. The oracle
    knows the exact expected inventory: as-of shows only f1, latest shows
    f1+f2, each with the source table's row count, across all three
    independent time-travel decodings (Delta log replay to version,
    Iceberg snapshot lineage, Hudi timeline as-of filtering). The
    two-commit lifecycle is the staged build SHARED with sync_changes
    (_two_commit_delta_stage), which also captures the handles."""
    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable

    stage = _two_commit_delta_stage(spark, sf)
    base = stage["base"]
    log, ice, hudi = DeltaLog(spark, base), IcebergTable(spark, base), HudiTimeline(spark, base)
    delta_v1, ice_s1, hudi_i1 = stage["delta_v1"], stage["ice_s1"], stage["hudi_i1"]

    reads = {
        "DELTA": {"first": log.snapshot_files(version=delta_v1), "latest": log.snapshot_files()},
        "ICEBERG": {
            "first": ice.snapshot_files(snapshot_id=ice_s1),
            "latest": ice.snapshot_files(),
        },
        "HUDI": {"first": hudi.snapshot_files(instant=hudi_i1), "latest": hudi.snapshot_files()},
    }
    out = None
    for fmt, by_asof in reads.items():
        for asof, files in by_asof.items():
            part = files.select(
                F.lit(fmt).alias("fmt"),
                F.lit(asof).alias("as_of"),
                F.element_at(F.split("path", "/"), -1).alias("file_name"),
                F.col("record_count"),
            )
            out = part if out is None else out.unionByName(part)
    return out


def q_sync_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """SCHEMA-EVOLUTION sync under the correctness gate (K6,
    schema/evolution.py:85 — the reference exercises evolution inside its
    e2e matrix, ITOneTableClient.java schema-evolution sequences): full
    sync of a Delta source, then a second source commit that both ADDS a
    column (r_extra bigint, written in a real parquet file) and appends a
    file, synced INCREMENTALLY to Iceberg + Hudi. Each target's own
    metadata is then read back and the result is every format's final
    (ordinal, column, type) — evolution must append the new column at the
    end through three independent schema encodings (Delta schemaString,
    Iceberg field-id schema JSON, Hudi avro) — plus the per-format total
    record count from the stats plane, which the oracle derives from the
    source table. The staged lifecycle builds once per (session, sf)."""
    import json as _json
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory
    from onetable_spark.sync import SyncClient, source_for, target_for

    def build(base: str) -> str:
        shutil.copy(os.path.join(sf, "region.parquet"), os.path.join(base, "f1.parquet"))
        schema_v1 = spark.read.parquet(os.path.join(base, "f1.parquet")).schema
        log = DeltaLog(spark, base)
        log.init_table(
            Table(name="evo", base_path=base, table_format=TableFormat.DELTA, read_schema=schema_v1)
        )
        log.commit(adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base))

        client = SyncClient(spark)
        source = source_for(spark, TableFormat.DELTA, base)
        targets = [
            target_for(spark, TableFormat.ICEBERG, base),
            target_for(spark, TableFormat.HUDI, base),
        ]
        r1 = client.sync(source, targets)
        _require(all(r.status.value == "SUCCESS" for r in r1.values()), r1)

        # evolve the source: write f2 WITH the new column, commit it together
        # with the new schemaString (a legal add — the K6 gate verifies)
        stage = os.path.join(base, "_stage")
        spark.read.parquet(os.path.join(base, "f1.parquet")).withColumn(
            "r_extra", (F.col("r_regionkey") * 2).cast("long")
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        f2 = os.path.join(base, "f2.parquet")
        shutil.move(os.path.join(stage, part), f2)
        shutil.rmtree(stage)
        schema_v2 = spark.read.parquet(f2).schema
        meta = log.update_configuration({})
        meta["schemaString"] = _json.dumps(schema_v2.jsonValue())
        log.commit(adds=build_inventory(spark, [f2], root=base), metadata=meta)

        r2 = client.sync(source, targets)
        _require(all(r.status.value == "SUCCESS" for r in r2.values()), r2)
        _require(all(r.mode.value == "INCREMENTAL" for r in r2.values()), r2)
        _validate_staged(spark, base, "DELTA", ("ICEBERG", "HUDI"))
        return base

    base = _staged_once(spark, sf, "otb_evo_q", build)
    readers = {
        "DELTA": DeltaLog(spark, base),
        "ICEBERG": IcebergTable(spark, base),
        "HUDI": HudiTimeline(spark, base),
    }
    rows = []
    for fmt, reader in readers.items():
        fields = reader.table_descriptor().read_schema.fields
        # driver-ok: O(files) agg over the metadata inventory (3 files)
        n_rows = (
            reader.snapshot_files().agg(F.sum("record_count").cast("long")).first()[0]
        )
        for i, fld in enumerate(fields):
            rows.append((fmt, i, fld.name, fld.dataType.simpleString(), n_rows))
    return local_rows_df(
        spark, rows, "fmt string, ordinal int, col_name string, col_type string, n_table_rows long"
    )


def q_sync_validation(spark: SparkSession, sf: str) -> DataFrame:
    """The VALIDATION plane under the correctness gate (api/.../model/
    validation/{ValidationCheck,Checker,Result}.java — declared but never
    implemented by the reference; sync/validation.py implements it for
    real): over the shared two-commit sync stage, run all four checks of
    each target's read-back against the Delta source — partition-spec
    parity, schema parity, file/row counts, per-file statistics — and
    report (fmt, check_name, success). The comparisons are DataFrame aggs
    and a full-outer per-file join (driver sees counters only), so the
    same validator runs unchanged on a million-file table. A drift in any
    of the three commit-plane encodings flips a FALSE into the hash."""
    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.sync.validation import SyncValidator

    # the validator's ~12 aggregation jobs over the (deterministic,
    # build-once) stage would otherwise re-execute on every call — compute
    # the plain-value facts once per (session, sf) like the stage itself
    key = ("sync_validation_facts", id(spark), sf)
    if key not in _CORPUS_CACHE:
        base = _two_commit_delta_stage(spark, sf)["base"]
        source = DeltaLog(spark, base)
        validator = SyncValidator()
        rows = []
        for fmt, reader in (
            ("ICEBERG", IcebergTable(spark, base)),
            ("HUDI", HudiTimeline(spark, base)),
        ):
            for check, res in validator.validate(source, reader).items():
                rows.append((fmt, check.value, res.success))
        _CORPUS_CACHE[key] = rows
    return local_rows_df(
        spark, _CORPUS_CACHE[key], "fmt string, check_name string, success boolean"
    )


def q_sync_recovery(spark: SparkSession, sf: str) -> DataFrame:
    """K12 CORRUPT-SNAPSHOT RECOVERY under the correctness gate
    (IcebergClient.java:251-285 / formats/iceberg.py recover_if_corrupt):
    sync a Delta source to Iceberg, then delete the current snapshot's
    manifest list (the crashed-writer / rename-race corruption the
    reference defends against). The watermark read must detect the
    corruption, roll the table back, and clear the sync watermark; the
    next sync must fall back to FULL and re-converge. The output pins the
    observable lifecycle: both syncs' modes, whether the watermark was
    cleared by recovery, and the files/records the recovered table reads
    back — which the oracle derives from the source table, so a recovery
    that loses or duplicates data hash-mismatches."""
    import os

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory
    from onetable_spark.sync import SyncClient, source_for, target_for

    def build(base: str) -> dict:
        import shutil

        shutil.copy(os.path.join(sf, "region.parquet"), os.path.join(base, "f1.parquet"))
        schema = spark.read.parquet(base).schema
        log = DeltaLog(spark, base)
        log.init_table(
            Table(name="rec", base_path=base, table_format=TableFormat.DELTA, read_schema=schema)
        )
        log.commit(adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base))
        client = SyncClient(spark)
        source = source_for(spark, TableFormat.DELTA, base)
        target = target_for(spark, TableFormat.ICEBERG, base)
        r1 = client.sync(source, [target])
        _require(r1[TableFormat.ICEBERG].status.value == "SUCCESS", r1)
        mode1 = r1[TableFormat.ICEBERG].mode.value

        # corrupt: delete the current snapshot's manifest list
        ice = IcebergTable(spark, base)
        os.remove(ice.current_snapshot_meta()["manifest-list"])

        # the watermark read performs the rollback + watermark clear
        watermark_cleared = target.get_sync_metadata() is None
        r2 = client.sync(source, [target])
        _require(r2[TableFormat.ICEBERG].status.value == "SUCCESS", r2)
        _validate_staged(spark, base, "DELTA", ("ICEBERG",))
        return {
            "base": base,
            "mode1": mode1,
            "mode2": r2[TableFormat.ICEBERG].mode.value,
            "watermark_cleared": watermark_cleared,
        }

    stage = _staged_once(spark, sf, "otb_rec_q", build)
    files = IcebergTable(spark, stage["base"]).snapshot_files()
    return files.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("record_count").cast("long").alias("n_records"),
    ).select(
        F.lit(stage["mode1"]).alias("initial_mode"),
        F.lit(stage["mode2"]).alias("recovered_mode"),
        F.lit(stage["watermark_cleared"]).alias("watermark_cleared"),
        "n_files",
        "n_records",
    )


def q_sync_partition_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """K7 PARTITION-SPEC EVOLUTION + K11 Hudi guardrail under the
    correctness gate (IcebergPartitionSpecSync.java:43-68 remove/add-by-
    name with fresh field-ids; HudiTableManager.java:190-240 pinned table
    config): sync the orders table partitioned by VALUE(o_orderpriority),
    then re-sync with MONTH(o_orderdate) — Iceberg must APPEND an
    immutable spec v1 (default moves, spec v0 untouched, new field-id
    above the old), Delta must replay its partitionColumns through the
    generated-column encoding, and the Hudi target must REJECT the change
    (its partition config is pinned at table creation). The output pins
    every observable: per-format final (source_field, transform), the
    Iceberg spec history + field-id monotonicity, the Delta physical
    column name, the Hudi rejection, and the per-format file counts."""
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import (
        PartitionField,
        PartitionTransform,
        Snapshot,
        Table,
        TableFormat,
        TableMetadata,
    )
    from onetable_spark.sources.parquet_inventory import inventory_from_directory
    from onetable_spark.sync import target_for

    def build(base: str) -> dict:
        shutil.copy(os.path.join(sf, "orders.parquet"), os.path.join(base, "o1.parquet"))
        schema = spark.read.parquet(base).schema
        inv = inventory_from_directory(spark, base)

        def snap(pfields):
            return Snapshot(
                table=Table(
                    name="orders",
                    base_path=base,
                    table_format=TableFormat.PARQUET,
                    read_schema=schema,
                    partition_fields=pfields,
                ),
                files=inv,
                version="1",
            )

        v1 = (PartitionField(source_field="o_orderpriority"),)
        v2 = (
            PartitionField(
                source_field="o_orderdate",
                transform=PartitionTransform.MONTH,
                partition_field_name="order_month",
            ),
        )
        ice_t = target_for(spark, TableFormat.ICEBERG, base)
        del_t = target_for(spark, TableFormat.DELTA, base)
        hudi_t = target_for(spark, TableFormat.HUDI, base)
        for t in (ice_t, del_t, hudi_t):
            t.sync_snapshot(snap(v1), TableMetadata(1))
        ice_t.sync_snapshot(snap(v2), TableMetadata(2))
        del_t.sync_snapshot(snap(v2), TableMetadata(2))
        # the guardrail raises ValueError("partition spec change rejected…",
        # sync/client.py HudiTarget._validate_table_config); match it
        # specifically so an UNRELATED Hudi failure surfaces as a query
        # error instead of masquerading as the expected rejection
        hudi_rejected = False
        try:
            hudi_t.sync_snapshot(snap(v2), TableMetadata(2))
        except ValueError as e:
            if "partition spec change rejected" not in str(e):
                raise
            hudi_rejected = True

        # regression tripwire over the FINAL staged state, sourced from
        # Iceberg: Hudi's spec check is skipped because its spec DIVERGING
        # is the very behavior under test (pinned-config rejection); the
        # Delta schema check is skipped because Delta materializes the
        # generated partition column (order_month) as a physical schema
        # field by design (C5) — spec/counts/stats must still agree, and
        # v1/v2 carry the identical file inventory
        _validate_staged(
            spark,
            base,
            "ICEBERG",
            ("DELTA", "HUDI"),
            skip_spec=("HUDI",),
            skip_schema=("DELTA",),
        )

        ice = IcebergTable(spark, base)
        md = ice.metadata()
        old_spec = next(s for s in md["partition-specs"] if s["spec-id"] == 0)
        new_spec = ice._spec_for(md)
        facts = {
            "iceberg_default_spec": str(md["default-spec-id"]),
            "iceberg_n_specs": str(len(md["partition-specs"])),
            "iceberg_spec0_fields": ",".join(f["name"] for f in old_spec["fields"]),
            "iceberg_spec1_fields": ",".join(f["name"] for f in new_spec),
            "iceberg_spec1_transform": new_spec[0]["transform"],
            "iceberg_field_id_monotonic": str(
                new_spec[0]["field-id"] > old_spec["fields"][0]["field-id"]
            ).lower(),
            "iceberg_descriptor": ";".join(
                f"{p.source_field}:{p.transform.value}"
                for p in ice.table_descriptor().partition_fields
            ),
            "delta_partition_columns": ",".join(
                DeltaLog(spark, base).snapshot_info().metadata["partitionColumns"]
            ),
            "delta_descriptor": ";".join(
                f"{p.source_field}:{p.transform.value}"
                for p in DeltaLog(spark, base).table_descriptor().partition_fields
            ),
            "hudi_spec_change_rejected": str(hudi_rejected).lower(),
        }
        return {"base": base, "facts": facts}

    stage = _staged_once(spark, sf, "otb_pspec_q", build)
    rows = sorted(stage["facts"].items())
    return local_rows_df(spark, rows, "item string, value string")


def q_sync_bucket_spec(spark: SparkSession, sf: str) -> DataFrame:
    """BUCKET-TRANSFORM partition spec synced across all three formats
    (r13, C6+C9 BEYOND the reference — IcebergPartitionSpecExtractor.java:
    81-141 throws on bucket/truncate even though bucketing is the most
    common Iceberg layout in practice): stage an Iceberg table
    partitioned ``bucket[4]`` on r_regionkey (spec-true murmur3, pinned
    against the Iceberg spec's Appendix-B vectors in
    tests/test_bucket_transform.py), then sync it into Delta and Hudi,
    where the transform DOWNGRADES to identity on the materialized
    ``rk_bucket`` column — the same fallback Iceberg's own Spark
    integration uses for engine-inexpressible transforms. The output pins
    every observable: the spec string round-trip (``bucket[4]``), the IR
    descriptor (BUCKET:4 on r_regionkey), each target's physical
    partition column, per-bucket record counts matched across ALL THREE
    read surfaces, and bucket assignment recomputed row-by-row against
    the write path. Region always has exactly 5 rows (r_regionkey 0-4),
    so the bucket ids are spec-determined constants the DuckDB oracle
    hardcodes: {0:0, 1:0, 2:0, 3:3, 4:2} → dirs {0, 2, 3}."""
    import os

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import (
        PartitionField,
        PartitionTransform,
        Table,
        TableFormat,
        TableMetadata,
    )
    from onetable_spark.schema.partitions import bucket_column
    from onetable_spark.sources.parquet_inventory import build_inventory
    from onetable_spark.sync import SyncClient, source_for, target_for

    def build(base: str) -> dict:
        tbl = os.path.join(base, "bucket_table")
        os.makedirs(tbl)
        src = spark.read.parquet(os.path.join(sf, "region.parquet"))
        # write-side transform evaluation: one hive dir per present bucket
        (
            src.withColumn("rk_bucket", bucket_column("r_regionkey", 4))
            .repartition("rk_bucket")
            .write.partitionBy("rk_bucket")
            .parquet(tbl, mode="append")
        )
        data_files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(tbl)
            for f in fs
            if f.endswith(".parquet")
        )
        schema = src.schema
        ice = IcebergTable(spark, tbl)
        ice.init_table(
            Table(
                name="bucketed",
                base_path=tbl,
                table_format=TableFormat.ICEBERG,
                read_schema=schema,
                partition_fields=(
                    PartitionField(
                        source_field="r_regionkey",
                        transform=PartitionTransform.BUCKET,
                        partition_field_name="rk_bucket",
                        transform_arg=4,
                    ),
                ),
            )
        )
        ice.commit_overwrite(
            adds=build_inventory(
                spark, data_files, root=tbl, partition_cols=["rk_bucket"]
            )
        )

        client = SyncClient(spark)
        source = source_for(spark, TableFormat.ICEBERG, tbl)
        targets = [
            target_for(spark, TableFormat.DELTA, tbl),
            target_for(spark, TableFormat.HUDI, tbl),
        ]
        results = client.sync(source, targets)
        for fmt, r in results.items():
            _require(r.status.value == "SUCCESS", (fmt, r))

        # regression tripwire: counts/stats must agree; spec checks are
        # skipped because the bucket→identity DOWNGRADE is the behavior
        # under test, and Delta materializes rk_bucket as a schema column
        _validate_staged(
            spark,
            tbl,
            "ICEBERG",
            ("DELTA", "HUDI"),
            skip_spec=("DELTA", "HUDI"),
            skip_schema=("DELTA",),
        )

        # per-bucket record counts from all three read surfaces
        def bucket_counts(files_df) -> dict:
            agg = files_df.groupBy(
                F.col("partition_values")["rk_bucket"].alias("b")
            ).agg(F.sum("record_count").cast("long").alias("n"))
            # driver-ok: ≤4 aggregated rows (one per bucket) by construction
            return {r["b"]: r["n"] for r in agg.collect()}

        ice_counts = bucket_counts(ice.snapshot_files())
        delta_counts = bucket_counts(DeltaLog(spark, tbl).snapshot_files())
        hudi_counts = bucket_counts(HudiTimeline(spark, tbl).snapshot_files())

        # row-level check: every row's physical dir matches a fresh
        # recomputation of its spec bucket (read-side vs write-side)
        # basePath keeps hive-partition inference rooted at the table while
        # reading only the data files (the Iceberg metadata/ dir cohabits)
        mismatches = (
            spark.read.option("basePath", tbl)
            .parquet(*data_files)
            .where(F.col("rk_bucket") != bucket_column("r_regionkey", 4))
            .count()
        )

        # sibling TRUNCATE[2] table on r_name (same lifecycle, C6's other
        # parameterized transform): dirs are the 2-char name prefixes, so
        # the oracle derives them straight from the region data
        from onetable_spark.schema.partitions import transform_column
        from pyspark.sql import types as _T

        pf_t = PartitionField(
            source_field="r_name",
            transform=PartitionTransform.TRUNCATE,
            partition_field_name="name_trunc",
            transform_arg=2,
        )
        ttbl = os.path.join(base, "trunc_table")
        os.makedirs(ttbl)
        (
            src.withColumn("name_trunc", transform_column(pf_t, _T.StringType()))
            .repartition("name_trunc")
            .write.partitionBy("name_trunc")
            .parquet(ttbl, mode="append")
        )
        t_files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(ttbl)
            for f in fs
            if f.endswith(".parquet")
        )
        tice = IcebergTable(spark, ttbl)
        tice.init_table(
            Table(
                name="truncated", base_path=ttbl,
                table_format=TableFormat.ICEBERG, read_schema=schema,
                partition_fields=(pf_t,),
            )
        )
        tice.commit_overwrite(
            adds=build_inventory(
                spark, t_files, root=ttbl, partition_cols=["name_trunc"]
            )
        )
        tdesc = tice.table_descriptor().partition_fields[0]
        t_dir_df = (
            tice.snapshot_files()
            .select(F.col("partition_values")["name_trunc"].alias("d"))
            .distinct()
        )
        # driver-ok: ≤5 aggregated rows (one per 2-char prefix dir)
        t_dirs = sorted(r["d"] for r in t_dir_df.collect())

        md = ice.metadata()
        spec = ice._spec_for(md)
        pf = ice.table_descriptor().partition_fields[0]
        facts = {
            "iceberg_spec_transform": spec[0]["transform"],
            "iceberg_descriptor": (
                f"{pf.source_field}:{pf.transform.value}[{pf.transform_arg}]"
            ),
            "delta_partition_columns": ",".join(
                DeltaLog(spark, tbl).snapshot_info().metadata["partitionColumns"]
            ),
            "hudi_partition_fields": HudiTimeline(spark, tbl).table_properties()[
                "hoodie.table.partition.fields"
            ],
            "bucket_assignment_ok": str(mismatches == 0).lower(),
            "cross_format_counts_ok": str(
                ice_counts == delta_counts == hudi_counts and len(ice_counts) > 0
            ).lower(),
            "bucket_dirs": ",".join(sorted(ice_counts)),
            "n_records": str(sum(ice_counts.values())),
            "truncate_descriptor": (
                f"{tdesc.source_field}:{tdesc.transform.value}[{tdesc.transform_arg}]"
            ),
            "truncate_spec_transform": tice._spec_for(tice.metadata())[0]["transform"],
            "truncate_dirs": ",".join(t_dirs),
        }
        return {"facts": facts}

    stage = _staged_once(spark, sf, "otb_bspec_q", build)
    rows = sorted(stage["facts"].items())
    return local_rows_df(spark, rows, "item string, value string")


def q_sync_bucket_decimal(spark: SparkSession, sf: str) -> DataFrame:
    """BUCKET over a DECIMAL column (r14 — completes C6's Appendix-B type
    coverage; ``sync_bucket_spec``'s sibling): decimals bucket by hashing
    the MINIMAL-length big-endian two's-complement of their unscaled
    value (spec vectors pinned in tests/test_bucket_transform.py — 14.20
    → bytes 05 8C → -500754589). The staged lifecycle derives
    ``r_price = r_regionkey + 0.25`` as DECIMAL(9,2), writes one hive dir
    per bucket[4], registers the Iceberg spec, syncs into Delta and Hudi
    (identity downgrade on the materialized ``price_bucket``), and pins:
    the spec round-trip, per-bucket counts matched across all three read
    surfaces, and row-by-row bucket recomputation. Region is always 5
    rows, so the buckets are spec constants the oracle hardcodes:
    {0.25:3, 1.25:2, 2.25:1, 3.25:3, 4.25:0} → dirs 0,1,2,3."""
    import decimal as _dec
    import os

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import (
        PartitionField,
        PartitionTransform,
        Table,
        TableFormat,
    )
    from onetable_spark.schema.partitions import bucket_column
    from onetable_spark.sources.parquet_inventory import build_inventory
    from onetable_spark.sync import SyncClient, source_for, target_for
    from pyspark.sql import types as _T

    def build(base: str) -> dict:
        tbl = os.path.join(base, "bucket_dec")
        os.makedirs(tbl)
        src = spark.read.parquet(os.path.join(sf, "region.parquet")).withColumn(
            "r_price",
            (F.col("r_regionkey") + F.lit(_dec.Decimal("0.25"))).cast(
                _T.DecimalType(9, 2)
            ),
        )
        (
            src.withColumn("price_bucket", bucket_column("r_price", 4))
            .repartition("price_bucket")
            .write.partitionBy("price_bucket")
            .parquet(tbl, mode="append")
        )
        data_files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(tbl)
            for f in fs
            if f.endswith(".parquet")
        )
        ice = IcebergTable(spark, tbl)
        ice.init_table(
            Table(
                name="bucketed_dec",
                base_path=tbl,
                table_format=TableFormat.ICEBERG,
                read_schema=src.schema,
                partition_fields=(
                    PartitionField(
                        source_field="r_price",
                        transform=PartitionTransform.BUCKET,
                        partition_field_name="price_bucket",
                        transform_arg=4,
                    ),
                ),
            )
        )
        ice.commit_overwrite(
            adds=build_inventory(
                spark, data_files, root=tbl, partition_cols=["price_bucket"]
            )
        )

        client = SyncClient(spark)
        source = source_for(spark, TableFormat.ICEBERG, tbl)
        targets = [
            target_for(spark, TableFormat.DELTA, tbl),
            target_for(spark, TableFormat.HUDI, tbl),
        ]
        results = client.sync(source, targets)
        for fmt, r in results.items():
            _require(r.status.value == "SUCCESS", (fmt, r))
        _validate_staged(
            spark,
            tbl,
            "ICEBERG",
            ("DELTA", "HUDI"),
            skip_spec=("DELTA", "HUDI"),
            skip_schema=("DELTA",),
        )

        def bucket_counts(files_df) -> dict:
            agg = files_df.groupBy(
                F.col("partition_values")["price_bucket"].alias("b")
            ).agg(F.sum("record_count").cast("long").alias("n"))
            # driver-ok: ≤4 aggregated rows (one per bucket)
            return {r["b"]: r["n"] for r in agg.collect()}

        ice_counts = bucket_counts(ice.snapshot_files())
        delta_counts = bucket_counts(DeltaLog(spark, tbl).snapshot_files())
        hudi_counts = bucket_counts(HudiTimeline(spark, tbl).snapshot_files())
        mismatches = (
            spark.read.option("basePath", tbl)
            .parquet(*data_files)
            .where(F.col("price_bucket") != bucket_column("r_price", 4))
            .count()
        )
        pf = ice.table_descriptor().partition_fields[0]
        facts = {
            "iceberg_spec_transform": ice._spec_for(ice.metadata())[0]["transform"],
            "iceberg_descriptor": (
                f"{pf.source_field}:{pf.transform.value}[{pf.transform_arg}]"
            ),
            "delta_partition_columns": ",".join(
                DeltaLog(spark, tbl).snapshot_info().metadata["partitionColumns"]
            ),
            "hudi_partition_fields": HudiTimeline(spark, tbl).table_properties()[
                "hoodie.table.partition.fields"
            ],
            "bucket_assignment_ok": str(mismatches == 0).lower(),
            "cross_format_counts_ok": str(
                ice_counts == delta_counts == hudi_counts and len(ice_counts) > 0
            ).lower(),
            "bucket_dirs": ",".join(sorted(ice_counts)),
            "n_records": str(sum(ice_counts.values())),
        }
        return {"facts": facts}

    stage = _staged_once(spark, sf, "otb_bdec_q", build)
    rows = sorted(stage["facts"].items())
    return local_rows_df(spark, rows, "item string, value string")


def _ice_chlog_stage(spark: SparkSession, sf: str) -> dict:
    """ONE staged Iceberg v2 changelog lifecycle shared by
    ``iceberg_changelog`` (bare delete+insert parity) and
    ``iceberg_changelog_updates`` (identifier-paired, r14): seed region,
    keyed upsert on keys 0-1 plus new key 91, then a changelog-invisible
    REPLACE compaction."""
    import os
    import shutil

    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = os.path.join(base, "chlog_table")
        os.makedirs(tbl)
        src = os.path.join(sf, "region.parquet")
        shutil.copy(src, os.path.join(tbl, "f1.parquet"))
        schema = spark.read.parquet(src).schema
        ice = IcebergTable(spark, tbl)
        ice.init_table(
            Table(name="chlog", base_path=tbl, table_format=TableFormat.ICEBERG,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT),
            format_version=2,
        )
        ice.commit_overwrite(
            adds=build_inventory(spark, [os.path.join(tbl, "f1.parquet")], root=tbl)
        )
        # upsert batch: keys 0,1 renamed 'X_' || r_name, plus new key 91
        t = pq.read_table(src)
        upd = t.filter(pc.is_in(t["r_regionkey"], value_set=pa.array([0, 1])))
        upd = upd.set_column(
            upd.schema.get_field_index("r_name"),
            "r_name",
            pc.binary_join_element_wise(
                pa.array(["X_"] * len(upd)), upd["r_name"].combine_chunks(), ""
            ),
        )
        newrow = pa.table(
            {"r_regionkey": pa.array([91], type=t["r_regionkey"].type),
             "r_name": pa.array(["NEWLAND"])}
        ).select([f.name for f in t.schema])
        batch = pa.concat_tables([upd, newrow])
        out = os.path.join(tbl, "u1.parquet")
        pq.write_table(batch, out)
        ice.commit_upsert(build_inventory(spark, [out], root=tbl), ["r_regionkey"])
        # compaction publishes a REPLACE snapshot — changelog-invisible
        ice.rewrite_data_files(apply_equality_deletes=True)
        return {"dir": tbl}

    return _staged_once(spark, sf, "otb_chlog_q", build)


def q_iceberg_changelog(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg ROW-LEVEL CHANGELOG scan (r13 — the ``create_changelog_
    view`` procedure; the Delta sibling is ``delta_cdf``): the staged v2
    lifecycle seeds region (snapshot 1 — 5 inserts), runs a Flink-style
    keyed upsert on keys 0 and 1 with derivably-renamed rows plus a new
    key 91 (snapshot 2 — the equality delete kills the two OLD rows,
    the data file adds three new ones; Iceberg emits them as delete +
    insert, update pairing needs identifier fields its own procedure
    also leaves off by default — see ``iceberg_changelog_updates`` for
    the paired mode), then compacts with ``rewrite_data_files(apply_
    equality_deletes=True)`` — a REPLACE snapshot the changelog must
    emit NOTHING for (compaction is not a logical change). The full
    ``changelog()`` therefore replays exactly: ordinal 0 = region
    verbatim as inserts; ordinal 1 = the two old rows as deletes (read
    AT their killed positions through the data-assisted equality scan)
    + three inserts. Every output row is a pure function of the region
    table. The reference has only a FILE-level change scan
    (IcebergSourceClient.java:169-194). Staged once per (session, sf)."""
    from onetable_spark.formats.iceberg import IcebergTable as _IT

    stage = _ice_chlog_stage(spark, sf)
    return (
        _IT(spark, stage["dir"])
        .changelog()
        .select(
            F.col("_change_type").alias("change_type"),
            F.col("_change_ordinal").cast("int").alias("ordinal"),
            F.col("r_regionkey").cast("long").alias("r_regionkey"),
            "r_name",
        )
        .orderBy("ordinal", "change_type", "r_regionkey")
    )


def q_iceberg_changelog_updates(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg changelog with IDENTIFIER-PAIRED updates (r14 —
    create_changelog_view's identifier-columns mode /
    ChangelogIterator.computeUpdates): same staged lifecycle as
    ``iceberg_changelog``, read with ``identifier_fields=['r_regionkey']``
    (the record key the upsert was keyed on — the repo round-trips record
    keys as Iceberg identifier-field-ids, C3). The upsert's same-key
    delete+insert pairs become ``update_preimage``/``update_postimage``;
    the genuinely-new key 91 stays a bare insert. One extra shuffle on
    (ordinal, key) over the bare scan. Every row is region-derived."""
    from onetable_spark.formats.iceberg import IcebergTable as _IT

    stage = _ice_chlog_stage(spark, sf)
    return (
        _IT(spark, stage["dir"])
        .changelog(identifier_fields=["r_regionkey"])
        .select(
            F.col("_change_type").alias("change_type"),
            F.col("_change_ordinal").cast("int").alias("ordinal"),
            F.col("r_regionkey").cast("long").alias("r_regionkey"),
            "r_name",
        )
        .orderBy("ordinal", "change_type", "r_regionkey")
    )


def q_iceberg_changelog_net(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg changelog in NET-CHANGES mode (r14 —
    create_changelog_view's net_changes /
    ChangelogIterator.removeNetCarryovers): same staged lifecycle as
    ``iceberg_changelog``, read with ``net_changes=True``. The seed rows
    the upsert killed (keys 0-1, original names) cancel against their
    own ordinal-0 inserts — only the NET change per row content
    survives, which here is exactly the final table state, each row at
    the ordinal that produced it. One shuffle on the full row content.
    Every row is region-derived."""
    from onetable_spark.formats.iceberg import IcebergTable as _IT

    stage = _ice_chlog_stage(spark, sf)
    return (
        _IT(spark, stage["dir"])
        .changelog(net_changes=True)
        .select(
            F.col("_change_type").alias("change_type"),
            F.col("_change_ordinal").cast("int").alias("ordinal"),
            F.col("r_regionkey").cast("long").alias("r_regionkey"),
            "r_name",
        )
        .orderBy("ordinal", "change_type", "r_regionkey")
    )


def _hudi_chlog_stage(spark: SparkSession, sf: str) -> dict:
    """ONE staged MOR changelog lifecycle shared by ``hudi_changelog``
    (batch) and ``streaming_hudi_rows`` (r14 row stream): seed region as
    a deltacommit, keyed upsert (X_ renames on keys 0-1 + new key 92),
    then compaction (changelog/stream-invisible)."""
    import os
    import shutil

    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        tbl = os.path.join(base, "hchlog")
        os.makedirs(tbl)
        src = os.path.join(sf, "region.parquet")
        f1 = os.path.join(tbl, "f1.parquet")
        shutil.copy(src, f1)
        schema = spark.read.parquet(src).schema
        tl = HudiTimeline(spark, tbl)
        tl.init_table(
            Table(name="hcl", base_path=tbl, table_format=TableFormat.HUDI,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT,
                  record_key_fields=("r_regionkey",))
        )
        tl.commit(adds=build_inventory(spark, [f1], root=tbl), action="deltacommit")
        region = spark.read.parquet(src)
        batch = (
            region.filter(F.col("r_regionkey") <= 1)
            .withColumn("r_name", F.concat(F.lit("X_"), F.col("r_name")))
            .unionByName(
                local_rows_df(spark, [(92, "NEWLAND")], region.schema)
            )
        )
        tl.upsert_records(batch)
        tl.compact_file_groups()
        return {"dir": tbl}

    return _staged_once(spark, sf, "otb_hchlog_q", build)


def q_hudi_changelog(spark: SparkSession, sf: str) -> DataFrame:
    """Hudi ROW-LEVEL CHANGELOG (r13 — the third edge of the CDC
    triangle; siblings ``delta_cdf`` and ``iceberg_changelog``): the
    staged MOR lifecycle seeds region as an external-registration
    deltacommit (5 'i' rows), upserts keys 0 and 1 with derivably-renamed
    rows plus a new key 92 via ``upsert_records`` (the updates land as an
    AVRO_DATA log block decoded through the byte-certified codec → 'u'
    after-images; the new key lands in a fresh file group → 'i'), then
    compacts — the COMPACT instant must emit NOTHING. Ops use Hudi's own
    CDC vocabulary ('i'/'u'/'d'); every output row is a pure function of
    the region table. The reference reads only file-level commit
    metadata. Staged once per (session, sf)."""
    from onetable_spark.formats.hudi import HudiTimeline

    stage = _hudi_chlog_stage(spark, sf)
    return (
        HudiTimeline(spark, stage["dir"])
        .changelog()
        .select(
            F.col("_change_operation").alias("op"),
            F.col("r_regionkey").cast("long").alias("r_regionkey"),
            "r_name",
        )
        .orderBy("op", "r_regionkey", "r_name")
    )


def _hudi_chupd_stage(spark: SparkSession, sf: str) -> dict:
    """ONE staged replacecommit lifecycle shared by
    ``hudi_changelog_updates`` (batch, identifier-paired) and
    ``streaming_hudi_replace`` (r15 row stream): seed region as a
    deltacommit, then a REPLACECOMMIT keyed rewrite (full region with
    keys 0-1 derivably renamed plus new key 93) replacing the seed
    file group."""
    import os
    import shutil

    from onetable_spark.formats.hudi import HudiTimeline, _file_id_for
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        tbl = os.path.join(base, "hchupd")
        os.makedirs(tbl)
        src = os.path.join(sf, "region.parquet")
        f1 = os.path.join(tbl, "f1.parquet")
        shutil.copy(src, f1)
        schema = spark.read.parquet(src).schema
        tl = HudiTimeline(spark, tbl)
        tl.init_table(
            Table(name="hcu", base_path=tbl, table_format=TableFormat.HUDI,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT,
                  record_key_fields=("r_regionkey",))
        )
        tl.commit(adds=build_inventory(spark, [f1], root=tbl), action="deltacommit")
        region = spark.read.parquet(src)
        rewrite = (
            region.withColumn(
                "r_name",
                F.when(
                    F.col("r_regionkey") <= 1,
                    F.concat(F.lit("X_"), F.col("r_name")),
                ).otherwise(F.col("r_name")),
            )
            .unionByName(local_rows_df(spark, [(93, "NEWLAND")], region.schema))
        )
        stage_dir = os.path.join(base, "_rw_stage")
        rewrite.coalesce(1).write.parquet(stage_dir)
        part = next(
            f for f in os.listdir(stage_dir)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        f2 = os.path.join(tbl, "f2.parquet")
        shutil.move(os.path.join(stage_dir, part), f2)
        # operationType=UPSERT (the default): a KEYED rewrite is a logical
        # change — CLUSTER would make the changelog skip it by contract
        tl.commit(
            adds=build_inventory(spark, [f2], root=tbl),
            replace_file_ids={"": [_file_id_for("f1.parquet")]},
        )
        return {"dir": tbl}

    return _staged_once(spark, sf, "otb_hchupd_q", build)


def q_hudi_changelog_updates(spark: SparkSession, sf: str) -> DataFrame:
    """Hudi changelog with IDENTIFIER-PAIRED updates (r14 — the
    cross-format twin of ``iceberg_changelog_updates``): the shared
    ``_hudi_chupd_stage`` seeds region as a deltacommit, then a
    REPLACECOMMIT keyed rewrite (full region with keys 0-1 derivably
    renamed plus new key 93) replaces the seed file group — the shape
    clustering-style keyed rewrites produce. The bare changelog derives
    the replaced group's prior rows as 'd' and the new file's rows as
    'i'; with ``identifier_fields=['r_regionkey']`` every same-key
    'd'+'i' within the instant pairs into
    ``update_preimage``/``update_postimage`` (carried-over keys 2-4 pair
    with identical values — create_changelog_view's computeUpdates does
    the same), and the genuinely-new key stays a bare 'i'. Instants map
    to dense ordinals driver-side (two timeline strings). Every value is
    region-derived."""
    from onetable_spark.formats.hudi import HudiTimeline

    stage = _hudi_chupd_stage(spark, sf)
    tl = HudiTimeline(spark, stage["dir"])
    instants = [i for i, _ in tl.completed_instants()]
    ord_col = F.lit(None).cast("int")
    for n, inst in enumerate(sorted(instants)):
        ord_col = F.when(F.col("_commit_instant") == inst, n).otherwise(ord_col)
    return (
        tl.changelog(identifier_fields=["r_regionkey"])
        .select(
            F.col("_change_operation").alias("op"),
            ord_col.alias("ordinal"),
            F.col("r_regionkey").cast("long").alias("r_regionkey"),
            "r_name",
        )
        .orderBy("ordinal", "op", "r_regionkey", "r_name")
    )


def q_streaming_hudi_rows(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING row-level Hudi reads (r14 — the third edge of the
    streaming triangle; siblings ``streaming_cdf`` and
    ``streaming_iceberg_appends``): a file stream over the timeline's
    completed commit markers, each instant's rows derived on executors
    with the batch changelog's per-file-group rules — base inserts as
    'i', AVRO_DATA log blocks as 'u' after-images through the
    byte-certified codec, DELETE blocks as 'd' keys; COMPACT instants
    invisible; replacecommits FAIL the stream (prior-state resolution is
    the batch changelog's job). Shares the staged MOR lifecycle with
    ``hudi_changelog``; every value region-derived. The reference has no
    streaming surface."""
    from onetable_spark.streaming.cdc import read_hudi_row_stream
    from onetable_spark.streaming.events import run_available_now

    stage = _hudi_chlog_stage(spark, sf)
    stream = read_hudi_row_stream(spark, stage["dir"])
    agg = stream.groupBy("_change_operation", "r_regionkey", "r_name").count()
    out = run_available_now(agg, f"hrow_{_sf_tag(sf)}", shuffle_partitions=4)
    return out.select(
        F.col("_change_operation").alias("op"),
        F.col("r_regionkey").cast("long").alias("r_regionkey"),
        "r_name",
        F.col("count").cast("long").alias("n"),
    ).orderBy("op", "r_regionkey", "r_name")


def q_streaming_hudi_replace(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING Hudi REPLACECOMMITS (r15 — VERDICT r14 missing #2): the
    r14 row stream refused any replacecommit with
    ``partitionToReplaceFileIds``, so clustering-heavy tables could not
    stream at all. The r15 source derives them: the planning task
    replays the timeline's own tiny commit JSONs
    (``read_optimized_files_before`` — pure Python, metadata only) to
    find each replaced file group's PRIOR base file, emits its rows as
    'd', and the rewrite's new base rows stream as 'i' — identical to
    the batch changelog's file-level derivation (real Hudi's
    incremental read skips clustering instants wholesale; this engine
    is strictly richer and matches its own batch semantics). Shares the
    staged replacecommit lifecycle with ``hudi_changelog_updates``;
    instants map to dense ordinals driver-side; every value
    region-derived. The reference has no streaming surface."""
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.streaming.cdc import read_hudi_row_stream
    from onetable_spark.streaming.events import run_available_now

    stage = _hudi_chupd_stage(spark, sf)
    tl = HudiTimeline(spark, stage["dir"])
    instants = [i for i, _ in tl.completed_instants()]
    stream = read_hudi_row_stream(spark, stage["dir"])
    out = run_available_now(
        stream.select(
            "_change_operation", "_commit_instant", "r_regionkey", "r_name"
        ),
        f"hrepl_{_sf_tag(sf)}",
        output_mode="append",
        shuffle_partitions=4,
    )
    ord_col = F.lit(None).cast("int")
    for n, inst in enumerate(sorted(instants)):
        ord_col = F.when(F.col("_commit_instant") == inst, n).otherwise(ord_col)
    return (
        out.select(
            F.col("_change_operation").alias("op"),
            ord_col.alias("ordinal"),
            F.col("r_regionkey").cast("long").alias("r_regionkey"),
            "r_name",
        )
        .orderBy("ordinal", "op", "r_regionkey", "r_name")
    )


def q_hudi_cdc_feed(spark: SparkSession, sf: str) -> DataFrame:
    """Hudi SUPPLEMENTAL CDC LOG end-to-end (r14 — RFC-51 /
    ``hoodie.table.cdc.enabled``; VERDICT r13 #8): the staged lifecycle
    seeds region as a deltacommit, flips the cdc table property on, then
    runs a keyed ``upsert_records`` — which now AUTHORS a real ``-cdc``
    log file (CDC_DATA block, op='u' records with BEFORE and after
    images as JSON strings per HoodieCDCUtils' data_before_after schema,
    advertised via the write stat's ``cdcStats``) — and compacts (the
    COMPACT instant must emit nothing). ``cdc_feed()`` then serves
    Hudi's CDC-query shape (CDCRelation.FULL_CDC_SPARK_SCHEMA): the
    upsert's 'u' rows come off the cdc block VERBATIM with exact
    before-images; the seed rows and the upsert's new key derive as 'i'
    via RFC-51's BASE_FILE_INSERT inference (after image only). Every
    value is region-derived; ts_ms (the commit instant's epoch millis)
    is asserted present as a boolean. The reference has no CDC surface;
    prior rounds' Hudi changelog emitted after-images only. Staged once
    per (session, sf)."""
    import os
    import shutil

    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        tbl = os.path.join(base, "hcdc")
        os.makedirs(tbl)
        src = os.path.join(sf, "region.parquet")
        f1 = os.path.join(tbl, "f1.parquet")
        shutil.copy(src, f1)
        schema = spark.read.parquet(src).schema
        tl = HudiTimeline(spark, tbl)
        tl.init_table(
            Table(name="hcdc", base_path=tbl, table_format=TableFormat.HUDI,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT,
                  record_key_fields=("r_regionkey",))
        )
        tl.commit(adds=build_inventory(spark, [f1], root=tbl), action="deltacommit")
        tl.set_table_properties({"hoodie.table.cdc.enabled": "true"})
        region = spark.read.parquet(src)
        batch = (
            region.filter(F.col("r_regionkey") <= 1)
            .withColumn("r_name", F.concat(F.lit("X_"), F.col("r_name")))
            .unionByName(
                local_rows_df(spark, [(91, "NEWLAND")], region.schema)
            )
        )
        tl.upsert_records(batch)
        tl.compact_file_groups()
        return {"dir": tbl}

    stage = _staged_once(spark, sf, "otb_hcdcfeed_q", build)
    feed = HudiTimeline(spark, stage["dir"]).cdc_feed()
    return feed.select(
        "op",
        F.coalesce(
            F.get_json_object("after", "$.r_regionkey"),
            F.get_json_object("before", "$.r_regionkey"),
        ).cast("long").alias("r_regionkey"),
        F.get_json_object("before", "$.r_name").alias("before_name"),
        F.get_json_object("after", "$.r_name").alias("after_name"),
        F.col("ts_ms").isNotNull().alias("ts_ok"),
    ).orderBy("op", "r_regionkey")


def _cdf_stage(spark: SparkSession, sf: str) -> dict:
    """ONE staged CDF lifecycle shared by ``delta_cdf`` (batch reader)
    and ``streaming_cdf`` (file stream over _change_data/): seed a
    CDF-enabled Delta table from region, then one MERGE-shaped keyed
    upsert that writes the row-level cdc files."""
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.model import Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        tbl = os.path.join(base, "cdf_table")
        os.makedirs(tbl)
        shutil.copy(os.path.join(sf, "region.parquet"), os.path.join(tbl, "f1.parquet"))
        src = spark.read.parquet(os.path.join(tbl, "f1.parquet"))
        log = DeltaLog(spark, tbl)
        log.init_table(
            Table(name="cdf", base_path=tbl, table_format=TableFormat.DELTA,
                  read_schema=src.schema),
            configuration={"delta.enableChangeDataFeed": "true"},
        )
        log.commit(
            adds=build_inventory(spark, [os.path.join(tbl, "f1.parquet")], root=tbl)
        )
        # the upsert batch: keys 0 and 1 renamed (derivably: 'X_' prefix),
        # plus one brand-new key 90
        batch = (
            src.where("r_regionkey <= 1")
            .withColumn("r_name", F.concat(F.lit("X_"), F.col("r_name")))
            .unionByName(
                local_rows_df(spark, [(90, "NEWLAND")], src.schema)
            )
        )
        stage_dir = os.path.join(base, "_batch_stage")
        batch.coalesce(1).write.parquet(stage_dir)
        part = next(
            f for f in os.listdir(stage_dir)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        f2 = os.path.join(tbl, "f2.parquet")
        shutil.move(os.path.join(stage_dir, part), f2)
        v = log.upsert_by_key(
            build_inventory(spark, [f2], root=tbl), key_fields=["r_regionkey"]
        )
        # r14: a post-enable PLAIN APPEND (v3) — authors NO cdc files, so
        # both the batch reader and the streaming feed must DERIVE its
        # rows as inserts (delta-spark readChangeFeed's behavior; before
        # r14 the stream tailed only _change_data/ and lost these rows)
        app = (
            src.where("r_regionkey >= 3")
            .withColumn(
                "r_regionkey",
                (F.col("r_regionkey") + 200).cast(src.schema["r_regionkey"].dataType),
            )
            .withColumn("r_name", F.concat(F.lit("APP_"), F.col("r_name")))
        )
        app_stage = os.path.join(base, "_app_stage")
        app.coalesce(1).write.parquet(app_stage)
        part3 = next(
            f for f in os.listdir(app_stage)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        f3 = os.path.join(tbl, "f3.parquet")
        shutil.move(os.path.join(app_stage, part3), f3)
        v3 = log.commit(adds=build_inventory(spark, [f3], root=tbl))
        # r14: a MIXED overwrite commit (v4) — remove f3 and add f4 in
        # ONE commit with no cdc files (the INSERT OVERWRITE shape;
        # delta-spark's CDCReader derives removes as 'delete' + adds as
        # 'insert' for such commits, and r13's refusal was stricter than
        # delta-spark). f3's bytes stay on disk (no vacuum), so the
        # delete preimages read back exactly.
        ovr = (
            src.where("r_regionkey >= 3")
            .withColumn(
                "r_regionkey",
                (F.col("r_regionkey") + 300).cast(src.schema["r_regionkey"].dataType),
            )
            .withColumn("r_name", F.concat(F.lit("OVR_"), F.col("r_name")))
        )
        ovr_stage = os.path.join(base, "_ovr_stage")
        ovr.coalesce(1).write.parquet(ovr_stage)
        part4 = next(
            f for f in os.listdir(ovr_stage)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        f4 = os.path.join(tbl, "f4.parquet")
        shutil.move(os.path.join(ovr_stage, part4), f4)
        v4 = log.commit(
            adds=build_inventory(spark, [f4], root=tbl),
            removes=build_inventory(spark, [f3], root=tbl),
        )
        # the cdc files are authoritative for v2: exactly 2 preimages +
        # 2 postimages + 1 insert must come off _change_data, and the
        # protocol must now advertise the writer feature
        feats = set(log.snapshot_info().protocol.get("writerFeatures") or [])
        return {"dir": tbl, "upsert_version": v, "append_version": v3,
                "overwrite_version": v4,
                "feature_ok": "changeDataFeed" in feats}

    return _staged_once(spark, sf, "otb_cdf_q", build)


def q_delta_cdf(spark: SparkSession, sf: str) -> DataFrame:
    """Delta CHANGE DATA FEED authored and read back (r13, PROTOCOL.md
    "Add CDC File" / delta-spark's ``delta.enableChangeDataFeed``): the
    staged lifecycle seeds a CDF-enabled table from region (v1 — an
    add-only commit the reader derives as file-level ``insert`` rows,
    delta-spark's same fallback), then runs a MERGE-shaped keyed upsert
    (v2) that writes REAL row-level cdc files under ``_change_data/``:
    ``update_preimage`` rows read at the matched positions on executors,
    ``update_postimage`` for the new versions of matched keys, and
    ``insert`` for the unmatched new key. A v3 PLAIN APPEND (r14) writes
    no cdc files and derives as inserts; a v4 MIXED overwrite (r14,
    remove f3 + add f4 in one non-cdc commit — the INSERT OVERWRITE
    shape) derives BOTH legs, removes as ``delete`` preimages and adds
    as ``insert`` rows, delta-spark CDCReader parity where the r13
    reader refused. ``change_feed(1)`` then serves the exact row
    history — the oracle reconstructs every row from the region table
    (the upsert's new names are a pure function of the old:
    ``'X_' || r_name``; the append's are ``'APP_' || r_name`` on keys
    shifted +200; the overwrite's ``'OVR_' || r_name`` on keys shifted
    +300). The protocol upgrades to writerFeatures
    changeDataFeed the first time a cdc file lands. The reference has no
    CDC surface at all; our prior streaming CDC was file-granularity.
    Staged once per (session, sf)."""
    from onetable_spark.formats.delta import DeltaLog

    stage = _cdf_stage(spark, sf)
    feed = DeltaLog(spark, stage["dir"]).change_feed(1)
    return feed.select(
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").cast("long").alias("commit_version"),
        F.col("r_regionkey").cast("long").alias("r_regionkey"),
        "r_name",
        F.lit(stage["feature_ok"]).alias("feature_ok"),
    ).orderBy("commit_version", "change_type", "r_regionkey")


def q_streaming_cdf(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING row-level CDC (r13; r14 closes the append hole): the
    union of a file stream over the CDF table's ``_change_data/`` dir and
    a LOG-DERIVED stream for commits that author no cdc files
    (streaming/cdc.py ``read_cdf_stream`` — delta-spark streaming
    ``readChangeFeed`` parity). The staged lifecycle's v1 seed and v3
    PLAIN APPEND never write cdc files, so their rows arrive as derived
    ``insert``s read off the added parquet on executors; the v4 MIXED
    overwrite derives BOTH legs (removed f3's rows as ``delete``, added
    f4's as ``insert`` — delta-spark CDCReader parity, where before r14
    the mixed commit failed the stream); the v2 upsert's exact
    preimage/postimage/insert rows come off the cdc files. AvailableNow
    drains both legs; every VALUE is region-derived — full hash
    parity."""
    from onetable_spark.streaming.cdc import read_cdf_stream
    from onetable_spark.streaming.events import run_available_now

    stage = _cdf_stage(spark, sf)
    stream = read_cdf_stream(spark, stage["dir"])
    agg = stream.groupBy("_change_type", "r_regionkey", "r_name").count()
    out = run_available_now(agg, f"cdf_{_sf_tag(sf)}", shuffle_partitions=4)
    return out.select(
        F.col("_change_type").alias("change_type"),
        F.col("r_regionkey").cast("long").alias("r_regionkey"),
        "r_name",
        F.col("count").cast("long").alias("n"),
    ).orderBy("change_type", "r_regionkey")


def q_streaming_iceberg_appends(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING row-level Iceberg reads (r14 — real Iceberg's Spark
    streaming source / SparkMicroBatchStream semantics, APPEND-ONLY by
    contract): a file stream over ``metadata/snap-*.avro`` where each
    arriving snapshot's ADDED data files are read on executors. The
    staged lifecycle seeds region (append), runs a keyed upsert
    (operation=overwrite — SKIPPED via skip_overwrite_snapshots, the
    ``streaming-skip-overwrite-snapshots`` option; without the flag the
    stream FAILS, Iceberg parity), appends keys+500 with 'S_' names
    (append — streams), then compacts (replace — invisible). The feed
    must contain exactly the two appends' rows; the upsert's rows never
    stream (row-level deletes need the batch ``changelog()``). Every
    value region-derived. The reference has no streaming surface."""
    import os
    import shutil

    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory
    from onetable_spark.streaming.cdc import read_iceberg_append_stream
    from onetable_spark.streaming.events import run_available_now

    def build(base: str) -> dict:
        tbl = os.path.join(base, "iapp")
        os.makedirs(tbl)
        src = os.path.join(sf, "region.parquet")
        f1 = os.path.join(tbl, "f1.parquet")
        shutil.copy(src, f1)
        schema = spark.read.parquet(src).schema
        ice = IcebergTable(spark, tbl)
        ice.init_table(
            Table(name="iapp", base_path=tbl, table_format=TableFormat.ICEBERG,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT),
            format_version=2,
        )
        ice.commit_overwrite(adds=build_inventory(spark, [f1], root=tbl))
        region = spark.read.parquet(src)
        up = (
            region.filter(F.col("r_regionkey") <= 1)
            .withColumn("r_name", F.concat(F.lit("X_"), F.col("r_name")))
        )
        up_stage = os.path.join(base, "_up")
        up.coalesce(1).write.parquet(up_stage)
        part = next(
            f for f in os.listdir(up_stage)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        f2 = os.path.join(tbl, "f2.parquet")
        shutil.move(os.path.join(up_stage, part), f2)
        ice.commit_upsert(
            build_inventory(spark, [f2], root=tbl), ["r_regionkey"]
        )
        app = (
            region.withColumn(
                "r_regionkey",
                (F.col("r_regionkey") + 500).cast(
                    region.schema["r_regionkey"].dataType
                ),
            )
            .withColumn("r_name", F.concat(F.lit("S_"), F.col("r_name")))
        )
        app_stage = os.path.join(base, "_app")
        app.coalesce(1).write.parquet(app_stage)
        part3 = next(
            f for f in os.listdir(app_stage)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        f3 = os.path.join(tbl, "f3.parquet")
        shutil.move(os.path.join(app_stage, part3), f3)
        ice.commit_overwrite(adds=build_inventory(spark, [f3], root=tbl))
        ice.rewrite_data_files(apply_equality_deletes=True)
        return {"dir": tbl}

    stage = _staged_once(spark, sf, "otb_iapp_q", build)
    stream = read_iceberg_append_stream(
        spark, stage["dir"], skip_overwrite_snapshots=True
    )
    agg = stream.groupBy("r_regionkey", "r_name").count()
    out = run_available_now(agg, f"iapp_{_sf_tag(sf)}", shuffle_partitions=4)
    return out.select(
        F.col("r_regionkey").cast("long").alias("r_regionkey"),
        "r_name",
        F.col("count").cast("long").alias("n"),
    ).orderBy("r_regionkey", "r_name")


def q_sync_safety_fallback(spark: SparkSession, sf: str) -> DataFrame:
    """S8/S9 HISTORY-CLEANUP SAFETY under the correctness gate
    (DeltaSourceClient safety probe / sync/client.py DeltaSource.
    is_incremental_sync_safe_from + the planner's FULL fallback,
    OneTableClient.java:84-139): sync a Delta source to Iceberg, advance
    the source three commits, then CHECKPOINT and CLEAN the log with zero
    retention — the commits the target's watermark points into are gone.
    The safety probe (in-commit timestamps, not file mtimes) must report
    the incremental path unsafe, and the next sync must fall back to a
    FULL snapshot re-sync that still converges the target to the exact
    source inventory (replayed from the checkpoint). Output pins the
    lifecycle: both sync modes, the safety verdict, commits surviving the
    clean, and the recovered table's files/records (oracle-derived from
    the source table)."""
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory
    from onetable_spark.sync import SyncClient, source_for, target_for

    def build(base: str) -> dict:
        import time as _time

        shutil.copy(os.path.join(sf, "region.parquet"), os.path.join(base, "f1.parquet"))
        schema = spark.read.parquet(base).schema
        log = DeltaLog(spark, base)
        log.init_table(
            Table(name="safe", base_path=base, table_format=TableFormat.DELTA, read_schema=schema)
        )
        log.commit(adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base))
        client = SyncClient(spark)
        source = source_for(spark, TableFormat.DELTA, base)
        target = target_for(spark, TableFormat.ICEBERG, base)
        r1 = client.sync(source, [target])
        _require(r1[TableFormat.ICEBERG].status.value == "SUCCESS", r1)
        watermark = target.get_sync_metadata().last_instant_synced_millis

        # source advances 3 commits, then history maintenance removes the
        # pre-checkpoint commit files the watermark points into
        for i in (2, 3, 4):
            _time.sleep(0.05)  # distinct in-commit timestamps
            f = os.path.join(base, f"f{i}.parquet")
            shutil.copy(os.path.join(sf, "region.parquet"), f)
            log.commit(adds=build_inventory(spark, [f], root=base))
        log.checkpoint()
        n_cleaned = log.clean_log(retention_hours=0)
        _require(n_cleaned > 0, "log cleanup removed nothing — staging is broken")

        safe = source.is_incremental_sync_safe_from(watermark)
        r2 = client.sync(source, [target])
        _require(r2[TableFormat.ICEBERG].status.value == "SUCCESS", r2)
        _validate_staged(spark, base, "DELTA", ("ICEBERG",))
        return {
            "base": base,
            "mode1": r1[TableFormat.ICEBERG].mode.value,
            "safe_after_cleanup": safe,
            "mode2": r2[TableFormat.ICEBERG].mode.value,
        }

    stage = _staged_once(spark, sf, "otb_safe_q", build)
    files = IcebergTable(spark, stage["base"]).snapshot_files()
    return files.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("record_count").cast("long").alias("n_records"),
    ).select(
        F.lit(stage["mode1"]).alias("initial_mode"),
        F.lit(stage["safe_after_cleanup"]).alias("safe_after_cleanup"),
        F.lit(stage["mode2"]).alias("fallback_mode"),
        "n_files",
        "n_records",
    )


def q_sync_catchup(spark: SparkSession, sf: str) -> DataFrame:
    """Out-of-sync-target convergence under the correctness gate
    (ITOneTableClient.java:549-596 parity — the reference's
    testOutOfSyncIncrementalSyncs, the last unported IT scenario): sync a
    Delta source's first commit to Iceberg ONLY, advance the source two
    commits, then add a never-synced Hudi target and run ONE sync() over
    both. The planner must converge them in that single call — Iceberg
    replays its two missed commits INCREMENTALLY (per-target mode planning
    + commit pruning, OneTableClient.java:149-173 / TableFormatSync.java:
    135-144) while Hudi, having no watermark, falls back to a FULL
    bootstrap — and both watermarks must land on the same source head.
    Output pins each target's catch-up mode, its post-sync inventory
    (files + records, oracle-derived from the staged source lifecycle),
    and the watermark-convergence boolean; a planner that re-applied or
    skipped a commit changes n_files/n_records, one that picked the wrong
    mode changes catchup_mode — either flips the hash."""
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory
    from onetable_spark.sync import SyncClient, source_for, target_for

    def build(base: str) -> dict:
        import time as _time

        shutil.copy(os.path.join(sf, "region.parquet"), os.path.join(base, "f1.parquet"))
        schema = spark.read.parquet(base).schema
        log = DeltaLog(spark, base)
        log.init_table(
            Table(
                name="catchup", base_path=base, table_format=TableFormat.DELTA, read_schema=schema
            )
        )
        log.commit(adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base))

        client = SyncClient(spark)
        source = source_for(spark, TableFormat.DELTA, base)
        iceberg = target_for(spark, TableFormat.ICEBERG, base)
        hudi = target_for(spark, TableFormat.HUDI, base)

        # commit 1 reaches Iceberg only — the Hudi target does not exist yet
        r1 = client.sync(source, [iceberg])
        _require(r1[TableFormat.ICEBERG].status.value == "SUCCESS", r1)

        # source advances 2 commits: Iceberg is stale by 2, Hudi by all 3
        for i in (2, 3):
            _time.sleep(0.05)  # distinct in-commit timestamps
            f = os.path.join(base, f"f{i}.parquet")
            shutil.copy(os.path.join(sf, "region.parquet"), f)
            log.commit(adds=build_inventory(spark, [f], root=base))

        # ONE sync call over both targets converges them
        r2 = client.sync(source, [iceberg, hudi])
        _require(all(r.status.value == "SUCCESS" for r in r2.values()), r2)
        converged = (
            iceberg.get_sync_metadata().last_instant_synced_millis
            == hudi.get_sync_metadata().last_instant_synced_millis
        )
        _validate_staged(spark, base, "DELTA", ("ICEBERG", "HUDI"))
        return {
            "base": base,
            "modes": {
                "ICEBERG": r2[TableFormat.ICEBERG].mode.value,
                "HUDI": r2[TableFormat.HUDI].mode.value,
            },
            "converged": bool(converged),
        }

    stage = _staged_once(spark, sf, "otb_catchup_q", build)
    readers = {
        "ICEBERG": lambda p: IcebergTable(spark, p),
        "HUDI": lambda p: HudiTimeline(spark, p),
    }
    out = None
    for fmt, mk in readers.items():
        files = mk(stage["base"]).snapshot_files()
        part = files.agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("record_count").cast("long").alias("n_records"),
        ).select(
            F.lit(fmt).alias("fmt"),
            F.lit(stage["modes"][fmt]).alias("catchup_mode"),
            "n_files",
            "n_records",
            F.lit(stage["converged"]).alias("watermarks_converged"),
        )
        out = part if out is None else out.unionByName(part)
    return out


FOREIGN_FIXTURES = "/root/reference/demo/data/db"


def q_sync_foreign_table(spark: SparkSession, sf: str) -> DataFrame:
    """FOREIGN-TABLE conformance under the correctness gate (the
    reference's equivalence oracle, ITOneTableClient.java:716-813, run in
    reverse): the native planes read metadata they did NOT write. The
    reference ships two genuine real-runtime fixture tables —
    demo/data/db/delta_dimGeography (real delta-spark 3.2 ``_delta_log``)
    and demo/data/db/hudi_dimCustomer (real Hudi 0.14: pretty-printed
    commit JSON, Avro schema in extraMetadata, HFILE metadata table,
    full 3-file timeline). Each is copied to scratch, opened with the
    native DeltaLog/HudiTimeline reader, synced into the other two
    formats, and ALL THREE formats' snapshot read-backs are emitted as
    (tbl, fmt, file_name, record_count, validation_ok) where
    validation_ok ANDs the four SyncValidator checks of each target
    against its foreign source. The oracle is DuckDB counting rows of
    the SAME parquet files directly — our record counts come only from
    decoding the foreign metadata (Delta stats JSON / Hudi write stats)
    and surviving our own three commit planes, so the hash is a genuine
    cross-engine conformance check. sf-independent by construction (the
    fixtures are fixed); staged once per session."""
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import TableFormat
    from onetable_spark.sync import SyncClient, source_for, target_for
    from onetable_spark.sync.validation import SyncValidator

    def build(base: str) -> list[tuple]:
        dd = os.path.join(base, "delta_dimGeography")
        hd = os.path.join(base, "hudi_dimCustomer")
        shutil.copytree(os.path.join(FOREIGN_FIXTURES, "delta_dimGeography"), dd)
        shutil.copytree(os.path.join(FOREIGN_FIXTURES, "hudi_dimCustomer"), hd)
        client = SyncClient(spark)
        r1 = client.sync(
            source_for(spark, TableFormat.DELTA, dd),
            [target_for(spark, TableFormat.ICEBERG, dd), target_for(spark, TableFormat.HUDI, dd)],
        )
        r2 = client.sync(
            source_for(spark, TableFormat.HUDI, hd),
            [target_for(spark, TableFormat.DELTA, hd), target_for(spark, TableFormat.ICEBERG, hd)],
        )
        for r in list(r1.values()) + list(r2.values()):
            if r.status.value != "SUCCESS":
                raise RuntimeError(f"foreign-table sync failed: {r}")
        validator = SyncValidator()
        validation_ok: dict[tuple[str, str], bool] = {}
        for tbl, path, src_fmt in (
            ("dimGeography", dd, "DELTA"),
            ("dimCustomer", hd, "HUDI"),
        ):
            readers = {
                "DELTA": DeltaLog(spark, path),
                "ICEBERG": IcebergTable(spark, path),
                "HUDI": HudiTimeline(spark, path),
            }
            for fmt, reader in readers.items():
                validation_ok[(tbl, fmt)] = fmt == src_fmt or all(
                    v.success
                    for v in validator.validate(readers[src_fmt], reader).values()
                )
        return {"delta": dd, "hudi": hd, "ok": validation_ok}

    stage = _staged_once(spark, sf, "otb_foreign_q", build)
    out = None
    for tbl, path in (("dimGeography", stage["delta"]), ("dimCustomer", stage["hudi"])):
        for fmt, reader in (
            ("DELTA", DeltaLog(spark, path)),
            ("ICEBERG", IcebergTable(spark, path)),
            ("HUDI", HudiTimeline(spark, path)),
        ):
            part = reader.snapshot_files().select(
                F.lit(tbl).alias("tbl"),
                F.lit(fmt).alias("fmt"),
                F.element_at(F.split("path", "/"), -1).alias("file_name"),
                F.col("record_count"),
                F.lit(stage["ok"][(tbl, fmt)]).alias("validation_ok"),
            )
            out = part if out is None else out.unionByName(part)
    return out


def q_sync_foreign_iceberg(spark: SparkSession, sf: str) -> DataFrame:
    """ICEBERG foreign-table conformance WITHOUT an Iceberg runtime (the
    r10 closure of the last self-certification hole): the source table's
    v2 metadata — metadata.json, deflate-compressed manifest list and
    manifests with v2-only fields and real Appendix-D column bounds — is
    authored by tools/foreign_iceberg.py through the Apache Avro REFERENCE
    implementation (org.apache.avro on the JVM), so not one metadata byte
    comes from this repo's codec or writer. The native Iceberg plane reads
    it (2 snapshots, carried EXISTING entries, identifier-field-ids →
    record keys), syncs it into Delta + Hudi, and all three formats emit
    (fmt, file_name, record_count, min_rk, max_rk, validation_ok) where
    the bounds surface ONLY from decoding the foreign manifests (source
    rows) and validation_ok ANDs the four SyncValidator checks per target.
    The oracle recomputes every number from the region table itself — the
    data files are true r_regionkey<2 / >=2 row-subsets — so record counts
    AND decoded bounds are cross-engine checked (ITOneTableClient.java:
    716-813 equivalence with the write side replaced by an independent
    author). sf-correct by construction; staged once per session."""
    import os

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import TableFormat
    from onetable_spark.sync import SyncClient, source_for, target_for
    from onetable_spark.sync.validation import SnapshotReaderAdapter, SyncValidator

    def build(base: str) -> dict:
        from tools.foreign_iceberg import write_foreign_iceberg_table

        tbl_dir = os.path.join(base, "region")
        os.makedirs(tbl_dir)
        write_foreign_iceberg_table(spark, tbl_dir, os.path.join(sf, "region.parquet"))
        client = SyncClient(spark)
        source = source_for(spark, TableFormat.ICEBERG, tbl_dir)
        targets = [
            target_for(spark, TableFormat.DELTA, tbl_dir),
            target_for(spark, TableFormat.HUDI, tbl_dir),
        ]
        results = client.sync(source, targets)
        for r in results.values():
            if r.status.value != "SUCCESS":
                raise RuntimeError(f"foreign-iceberg sync failed: {r}")
        validator = SyncValidator()
        ok: dict[str, bool] = {"ICEBERG": True}
        for fmt, reader in (
            ("DELTA", DeltaLog(spark, tbl_dir)),
            ("HUDI", HudiTimeline(spark, tbl_dir)),
        ):
            ok[fmt] = all(
                v.success
                for v in validator.validate(SnapshotReaderAdapter(source), reader).values()
            )
        return {"dir": tbl_dir, "ok": ok}

    stage = _staged_once(spark, sf, "otb_fice_q", build)
    rk_stat = F.filter("column_stats", lambda s: s["field"] == F.lit("r_regionkey"))
    out = None
    for fmt, reader in (
        ("ICEBERG", IcebergTable(spark, stage["dir"])),
        ("DELTA", DeltaLog(spark, stage["dir"])),
        ("HUDI", HudiTimeline(spark, stage["dir"])),
    ):
        part = reader.snapshot_files().select(
            F.lit(fmt).alias("fmt"),
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
            (
                F.element_at(rk_stat, 1)["min_value"]
                if fmt == "ICEBERG"
                else F.lit(None).cast("string")
            ).alias("min_rk"),
            (
                F.element_at(rk_stat, 1)["max_value"]
                if fmt == "ICEBERG"
                else F.lit(None).cast("string")
            ).alias("max_rk"),
            F.lit(stage["ok"][fmt]).alias("validation_ok"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def q_sync_foreign_iceberg_deletes(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg v2 MERGE-ON-READ conformance (r11): the foreign fixture
    gains a snapshot-3 position-delete file (authored by
    tools/foreign_iceberg.add_position_deletes through pyarrow + the
    reference Avro implementation — zero repo-codec bytes) deleting every
    odd r_regionkey row of B.parquet. The native plane APPLIES the deletes
    — distributed delete-parquet read, sequence-number rule, distinct
    (path, pos) count joined onto the inventory — and syncs NET record
    counts into Delta + Hudi. The reference CANNOT do this: its
    IcebergSourceClient.java:169-194 ignores delete files and would
    resurrect the deleted rows; equality deletes still refuse loudly.
    Emits (fmt, file_name, record_count, validation_ok) for all three
    formats; the oracle recomputes the net counts from the region rows
    themselves (A = r_regionkey < 2 raw; B = even keys >= 2 — exactly the
    rows the position deletes leave alive). Staged once per session."""
    import os

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import TableFormat
    from onetable_spark.sync import SyncClient, source_for, target_for
    from onetable_spark.sync.validation import SnapshotReaderAdapter, SyncValidator

    def build(base: str) -> dict:
        from tools.foreign_iceberg import add_position_deletes, write_foreign_iceberg_table

        tbl_dir = os.path.join(base, "region")
        os.makedirs(tbl_dir)
        truth = write_foreign_iceberg_table(
            spark, tbl_dir, os.path.join(sf, "region.parquet")
        )
        add_position_deletes(spark, tbl_dir, truth)
        client = SyncClient(spark)
        source = source_for(spark, TableFormat.ICEBERG, tbl_dir)
        targets = [
            target_for(spark, TableFormat.DELTA, tbl_dir),
            target_for(spark, TableFormat.HUDI, tbl_dir),
        ]
        results = client.sync(source, targets)
        for r in results.values():
            if r.status.value != "SUCCESS":
                raise RuntimeError(f"foreign-iceberg-deletes sync failed: {r}")
        validator = SyncValidator()
        ok: dict[str, bool] = {"ICEBERG": True}
        for fmt, reader in (
            ("DELTA", DeltaLog(spark, tbl_dir)),
            ("HUDI", HudiTimeline(spark, tbl_dir)),
        ):
            ok[fmt] = all(
                v.success
                for v in validator.validate(SnapshotReaderAdapter(source), reader).values()
            )
        return {"dir": tbl_dir, "ok": ok}

    stage = _staged_once(spark, sf, "otb_ficedel_q", build)
    out = None
    for fmt, reader in (
        ("ICEBERG", IcebergTable(spark, stage["dir"])),
        ("DELTA", DeltaLog(spark, stage["dir"])),
        ("HUDI", HudiTimeline(spark, stage["dir"])),
    ):
        part = reader.snapshot_files().select(
            F.lit(fmt).alias("fmt"),
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
            F.lit(stage["ok"][fmt]).alias("validation_ok"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def q_sync_delta_dv(spark: SparkSession, sf: str) -> DataFrame:
    """Delta DELETION VECTORS end-to-end (r11): a spec-authored DV table —
    f1 + f2 are region copies; version 2 upgrades the protocol
    (minReaderVersion 3, readerFeatures [deletionVectors]) and puts a real
    DV on f2 (z85-encoded uuid payload, portable RoaringBitmapArray bytes
    with CRC, formats/delta_dv.py) deleting every odd-r_regionkey
    position. The log replay nets the descriptor cardinality out of the
    counts (same-version remove+add tiebreak), verify_deletion_vectors
    decodes the BITMAP distributed and cross-checks it against the
    descriptor, and the net counts sync into Iceberg + Hudi. The r10
    engine refused DV tables; the reference predates the feature. Emits
    (fmt, file_name, record_count, dv_ok); the oracle recomputes net
    counts from region rows (f2 keeps exactly the even keys)."""
    import json as _json
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.delta_dv import write_dv_file
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory
    from onetable_spark.sync import SyncClient, source_for, target_for

    def build(base: str) -> dict:
        import pyarrow.parquet as pq

        tbl = os.path.join(base, "dv_table")
        os.makedirs(tbl)
        for name in ("f1.parquet", "f2.parquet"):
            shutil.copy(os.path.join(sf, "region.parquet"), os.path.join(tbl, name))
        schema = spark.read.parquet(tbl).schema
        log = DeltaLog(spark, tbl)
        log.init_table(
            Table(name="dv", base_path=tbl, table_format=TableFormat.DELTA,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT)
        )
        log.commit(adds=build_inventory(
            spark, [os.path.join(tbl, n) for n in ("f1.parquet", "f2.parquet")],
            root=tbl,
        ))
        keys = pq.read_table(
            os.path.join(tbl, "f2.parquet"), columns=["r_regionkey"]
        )["r_regionkey"].to_pylist()
        positions = [i for i, k in enumerate(keys) if k % 2 == 1]
        desc = write_dv_file(tbl, positions)
        v = log.latest_version() + 1
        with open(os.path.join(tbl, "_delta_log", f"{v:020d}.json"), "w") as f:
            f.write(_json.dumps({"commitInfo": {"timestamp": 1700000300000,
                                                "operation": "DELETE"}}) + "\n")
            f.write(_json.dumps({"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"]}}) + "\n")
            f.write(_json.dumps({"remove": {
                "path": "f2.parquet", "deletionTimestamp": 1700000300000,
                "dataChange": True}}) + "\n")
            f.write(_json.dumps({"add": {
                "path": "f2.parquet", "partitionValues": {},
                "size": os.path.getsize(os.path.join(tbl, "f2.parquet")),
                "modificationTime": 1700000300000, "dataChange": True,
                "stats": _json.dumps({
                    "numRecords": len(keys),
                    "minValues": {"r_regionkey": str(min(keys))},
                    "maxValues": {"r_regionkey": str(max(keys))},
                    "nullCount": {"r_regionkey": 0}}),
                "deletionVector": desc}}) + "\n")

        client = SyncClient(spark)
        source = source_for(spark, TableFormat.DELTA, tbl)
        results = client.sync(source, [
            target_for(spark, TableFormat.ICEBERG, tbl),
            target_for(spark, TableFormat.HUDI, tbl),
        ])
        for r in results.values():
            if r.status.value != "SUCCESS":
                raise RuntimeError(f"delta-dv sync failed: {r}")
        # bitmap-vs-descriptor cross-check, decoded on executors
        # driver-ok: one row per DV'd live file (exactly 1 in this stage)
        checks = DeltaLog(spark, tbl).verify_deletion_vectors().collect()
        dv_ok = bool(checks) and all(c["dv_ok"] for c in checks)
        return {"dir": tbl, "dv_ok": dv_ok}

    stage = _staged_once(spark, sf, "otb_dv_q", build)
    out = None
    for fmt, reader in (
        ("DELTA", DeltaLog(spark, stage["dir"])),
        ("ICEBERG", IcebergTable(spark, stage["dir"])),
        ("HUDI", HudiTimeline(spark, stage["dir"])),
    ):
        part = reader.snapshot_files().select(
            F.lit(fmt).alias("fmt"),
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("record_count"),
            F.lit(stage["dv_ok"]).alias("dv_ok"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def q_zorder_compaction(spark: SparkSession, sf: str) -> DataFrame:
    """OPTIMIZE ZORDER end-to-end under the correctness gate (r10: the
    zorder_layout Morton key composed into compact_table): four staged
    Delta files each spanning the FULL (user_id, event_id) domain — the
    worst case for stats pruning, every file intersects every range
    predicate — are rewritten in ONE transactional Delta commit into two
    files covering DISJOINT Morton-key ranges. Emits the read-back plus
    in-plan layout contract booleans: n_records (summed from the Delta
    stats plane, never a data re-read), files_after (snapshot read-back),
    zspans_disjoint_ok (the output z ranges do not overlap),
    span_tightened_ok (summed per-file z-span < half the before layout,
    where each file covered ~the whole curve), prune_improved_ok (a small
    value box that intersected ALL four before-files prunes at least one
    after-file on its min/max stats). The oracle recomputes n_records from
    events and pins the deterministic layout facts. Staged once per
    (session, sf)."""
    import os

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.operators.maintenance import compact_table, morton_key
    from onetable_spark.sources.parquet_inventory import build_inventory

    def z_bounds(paths: list[str]) -> dict[str, tuple[int, int]]:
        # one distributed job for all files: group per input file
        df = (
            spark.read.parquet(*paths)
            .select(
                F.element_at(F.split(F.input_file_name(), "/"), -1).alias("f"),
                morton_key(["user_id", "event_id"]).alias("z"),
            )
            .groupBy("f")
            .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        )
        # driver-ok: one row per data file of a 4-file staged table
        return {r["f"]: (r["lo"], r["hi"]) for r in df.collect()}

    def build(base: str) -> dict:
        import shutil as _sh

        tbl = os.path.join(base, "ztbl")
        os.makedirs(tbl)
        events = load_table(spark, sf, "events").select("user_id", "event_id")
        paths = []
        for i in range(4):
            # row-number slices: every file spans the full value domain
            p = os.path.join(tbl, f"slice{i}.parquet")
            events.where((F.col("event_id") % 4) == i).coalesce(1).write.parquet(p + ".d")
            part = next(f for f in os.listdir(p + ".d") if f.endswith(".parquet"))
            os.replace(os.path.join(p + ".d", part), p)
            _sh.rmtree(p + ".d", ignore_errors=True)
            paths.append(p)
        log = DeltaLog(spark, tbl)
        log.init_table(
            Table(
                name="ztbl",
                base_path=tbl,
                table_format=TableFormat.DELTA,
                read_schema=spark.read.parquet(paths[0]).schema,
                layout=DataLayoutStrategy.FLAT,
            )
        )
        log.commit(adds=build_inventory(spark, paths, root=tbl))
        before = z_bounds(paths)
        total = sum(os.path.getsize(p) for p in paths)
        result = compact_table(
            spark,
            TableFormat.DELTA,
            tbl,
            target_bytes=(total // 2) + 1,  # two disjoint z-range files
            zorder_by=("user_id", "event_id"),
        )
        # driver-ok: bounded file inventory (commit-payload order)
        after_paths = [r["path"] for r in log.snapshot_files().collect()]
        after = z_bounds(after_paths)
        spans = sorted(after.values())
        disjoint = all(hi1 < lo2 for (_, hi1), (lo2, _) in zip(spans, spans[1:]))
        span_of = lambda b: sum(hi - lo for lo, hi in b.values())  # noqa: E731
        tightened = span_of(after) < span_of(before) / 2
        # probe = the lowest after-file's own z range: by disjointness it
        # hits exactly ONE after-file, while every before-file (a
        # row-number slice of the same distribution, so each spans ~the
        # whole curve) must intersect it — the pruning win stated on the
        # exact min/max stats a scan would use, scale-independent
        lo1, hi1 = spans[0]
        hit_before = sum(
            1 for lo, hi in before.values() if not (hi < lo1 or lo > hi1)
        )
        pruned = hit_before == len(before) and len(after) >= 2
        return {
            "dir": tbl,
            "files_removed": result["files_removed"],
            "disjoint": disjoint,
            "tightened": tightened,
            "pruned": pruned,
        }

    stage = _staged_once(spark, sf, "otb_zord_q", build)
    files = DeltaLog(spark, stage["dir"]).snapshot_files()
    return files.agg(
        F.sum("record_count").cast("long").alias("n_records"),
        F.lit(stage["files_removed"]).alias("files_before"),
        F.count(F.lit(1)).cast("int").alias("files_after"),
        F.lit(stage["disjoint"]).alias("zspans_disjoint_ok"),
        F.lit(stage["tightened"]).alias("span_tightened_ok"),
        F.lit(stage["pruned"]).alias("prune_improved_ok"),
    )


def q_vacuum_orphans(spark: SparkSession, sf: str) -> DataFrame:
    """Orphan-file VACUUM under the correctness gate (r10 — the Delta
    VACUUM / Iceberg remove_orphan_files shape, completing the
    clean/archive/expiry/log-retention maintenance plane): a staged Delta
    table holds two referenced region files plus two orphans — one aged
    past the retention window, one fresh. vacuum_table lists the table
    distributed (directories fan out, never a driver file list), anti-
    joins against EVERY log version's referenced paths, deletes the aged
    orphan inside the executors, and classifies the rest. Emits one row
    per scanned file (file_name, status, on_disk, n_live_records) where
    n_live_records comes from the surviving table's stats plane — proof
    the vacuum touched nothing referenced. The oracle pins the literal
    classification and recomputes the record total from region."""
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.operators.maintenance import vacuum_table
    from onetable_spark.sources.parquet_inventory import build_inventory

    def build(base: str) -> dict:
        tbl = os.path.join(base, "vtbl")
        os.makedirs(tbl)
        paths = []
        for name in ("f1.parquet", "f2.parquet"):
            p = os.path.join(tbl, name)
            shutil.copy(os.path.join(sf, "region.parquet"), p)
            paths.append(p)
        schema = spark.read.parquet(paths[0]).schema
        log = DeltaLog(spark, tbl)
        log.init_table(
            Table(name="vtbl", base_path=tbl, table_format=TableFormat.DELTA,
                  read_schema=schema, layout=DataLayoutStrategy.FLAT)
        )
        log.commit(adds=build_inventory(spark, paths, root=tbl))
        old_orphan = os.path.join(tbl, "orphan_old.parquet")
        new_orphan = os.path.join(tbl, "orphan_new.parquet")
        shutil.copy(os.path.join(sf, "region.parquet"), old_orphan)
        shutil.copy(os.path.join(sf, "region.parquet"), new_orphan)
        os.utime(old_orphan, (946684800, 946684800))  # 2000-01-01
        statuses = {
            os.path.basename(r["path"]): r["status"]
            for r in vacuum_table(
                spark, TableFormat.DELTA, tbl, retention_hours=1, reader=log
                # driver-ok: one row per scanned file of a 4-file staged table
            ).collect()
        }
        _require(statuses.get("orphan_old.parquet") == "removed", statuses)
        return {"dir": tbl, "statuses": sorted(statuses.items())}

    stage = _staged_once(spark, sf, "otb_vac_q", build)
    live = DeltaLog(spark, stage["dir"]).snapshot_files().agg(
        F.sum("record_count").cast("long").alias("n_live_records")
    )
    rows = local_rows_df(spark, stage["statuses"], "file_name string, status string")
    return rows.crossJoin(F.broadcast(live)).withColumn(
        "on_disk",
        F.col("status") != F.lit("removed"),
    )


def q_streaming_sink_inventory(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly-once streaming ingestion under the correctness gate: the
    events stream is written through the foreachBatch sinks into native
    Delta, Iceberg, AND Hudi tables (streaming/table_sinks.py), then each
    format's own snapshot metadata is read back and the per-file record
    counts summed. Every format must account for exactly the source row
    count — duplicated or dropped micro-batch commits would show up as a
    wrong total. The record counts come from the commit metadata (Delta
    stats JSON, Iceberg manifests, Hudi write stats), not from re-reading
    data files, so the stats plane is what is being verified. The staged
    stream-drain builds once per (session, sf)."""
    import os

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import TableFormat
    from onetable_spark.streaming.events import read_event_stream
    from onetable_spark.streaming.table_sinks import write_stream_to_table

    readers = {
        TableFormat.DELTA: lambda p: DeltaLog(spark, p),
        TableFormat.ICEBERG: lambda p: IcebergTable(spark, p),
        TableFormat.HUDI: lambda p: HudiTimeline(spark, p),
    }

    def build(base: str) -> str:
        # start all three sinks before awaiting any: the streams are
        # independent, so wall-clock is the slowest sink, not the sum
        running = []
        for fmt in readers:
            path = os.path.join(base, fmt.value.lower())
            os.makedirs(path, exist_ok=True)
            q = write_stream_to_table(
                read_event_stream(spark, sf).select("event_id", "user_id", "event_type"),
                fmt,
                path,
                os.path.join(base, f"ckpt_{fmt.value}"),
            )
            running.append(q)
        for q in running:
            q.awaitTermination()
        return base

    base = _staged_once(spark, sf, "otb_sink_q", build)
    out = None
    for fmt in readers:
        files = readers[fmt](os.path.join(base, fmt.value.lower())).snapshot_files()
        part = files.agg(F.sum("record_count").cast("long").alias("n_records")).select(
            F.lit(fmt.value).alias("fmt"), "n_records"
        )
        out = part if out is None else out.unionByName(part)
    return out


def q_streaming_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING KEYED UPSERT under the correctness gate (r12): a 2-file
    CDC input (batch 0 = full region; batch 1 = keys {0, 2} re-sent with
    updated values) streams through the real foreachBatch upsert sinks
    — one micro-batch per file (maxFilesPerTrigger=1, mtime-ordered) —
    into BOTH a native Delta table (``upsert_by_key``: deletion vectors
    on the seed file) and a native Iceberg v2 table (``commit_upsert``:
    an equality-delete file per batch). Each format's own metadata then
    reads back per-batch net counts: the seed nets to n−2, the update
    file holds 2, so the logical state is one row per key with the
    latest value — duplicated or dropped merges would break the totals.
    The Iceberg read-back is the data-assisted eq-delete scan. Staged
    once per (session, sf)."""
    import os
    import shutil as _sh

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import TableFormat
    from onetable_spark.streaming.table_sinks import write_upsert_stream_to_table

    def build(base: str) -> dict:
        src = spark.read.parquet(os.path.join(sf, "region.parquet")).select(
            "r_regionkey", "r_name"
        )
        in_dir = os.path.join(base, "cdc_in")
        os.makedirs(in_dir)
        # batch 0: the full seed; batch 1: keys {0,2} with updated values
        b0, b1 = os.path.join(base, "_b0"), os.path.join(base, "_b1")
        src.coalesce(1).write.parquet(b0)
        src.filter(F.col("r_regionkey").isin(0, 2)).withColumn(
            "r_name", F.upper("r_name")
        ).coalesce(1).write.parquet(b1)
        for i, d in enumerate((b0, b1)):
            part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
            dst = os.path.join(in_dir, f"{i}.parquet")
            _sh.copy(os.path.join(d, part), dst)
            # one micro-batch per file IN ORDER: the file source orders
            # by modification time, so pin strictly increasing mtimes
            os.utime(dst, (1700000000 + i, 1700000000 + i))
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        running = []
        for fmt in (TableFormat.DELTA, TableFormat.ICEBERG):
            path = os.path.join(base, fmt.value.lower())
            os.makedirs(path, exist_ok=True)
            running.append(
                write_upsert_stream_to_table(
                    stream, fmt, path,
                    os.path.join(base, f"ckpt_{fmt.value}"),
                    ["r_regionkey"],
                )
            )
        for q in running:
            q.awaitTermination()
        return {"base": base}

    stage = _staged_once(spark, sf, "otb_supsert_q", build)
    base = stage["base"]
    batch_kind = F.regexp_extract("path", r"(batch=\d+)", 1).alias("batch_kind")
    delta = (
        DeltaLog(spark, os.path.join(base, "delta"))
        .snapshot_files()
        .groupBy(batch_kind)
        .agg(F.sum("record_count").cast("long").alias("n_records"))
        .select(F.lit("DELTA").alias("fmt"), "batch_kind", "n_records")
    )
    iceberg = (
        IcebergTable(spark, os.path.join(base, "iceberg"))
        .snapshot_files(apply_equality_deletes=True)
        .groupBy(batch_kind)
        .agg(F.sum("record_count").cast("long").alias("n_records"))
        .select(F.lit("ICEBERG").alias("fmt"), "batch_kind", "n_records")
    )
    return delta.unionByName(iceberg)


def q_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """Audio decode plumbing: mapInPandas stub decode (sample rate + 8-dim
    feature from the content digest) — deterministic, reproduced exactly by
    the SQL oracle's sha-chain."""
    from onetable_spark.functions.multimodal import decode_audio, synth_media_table

    media = synth_media_table(spark, 200).filter(F.col("kind") == "audio")
    feats = decode_audio(media)
    return feats.select(
        "media_id",
        "sample_rate",
        "duration_ms",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 4).alias("feature_sum"),
    )


def q_image_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed nearest-neighbor resize to 32×32: REAL vectorized index-
    map resize over the deterministic stub raster; the oracle recomputes
    the same gather arithmetic in SQL (exact — the mean divides by a power
    of two, so no float rounding)."""
    from onetable_spark.functions.multimodal import resize_images, synth_media_table

    media = synth_media_table(spark, 200).filter(F.col("kind") == "image")
    return resize_images(media, width=32, height=32)


def q_video_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video frame-sampling plumbing: JVM-side timestamp grid (sequence +
    explode) → per-frame stub decode in mapInPandas → per-video feature
    rollup. Bytes never pass through the groupBy."""
    from onetable_spark.functions.multimodal import sample_video_frames, synth_media_table

    media = synth_media_table(spark, 200).filter(F.col("kind") == "video")
    frames = sample_video_frames(media, every_ms=1000)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.round(F.sum(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x)), 4).alias(
            "feature_mass"
        ),
    )


def q_streaming_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming exact dedup: watermarked state-backed dropDuplicates over
    the event stream (first occurrence per (user, type) key), run through
    real Structured Streaming execution; oracle twin is SELECT DISTINCT."""
    from onetable_spark.streaming.events import dedup_stream, read_event_stream, run_available_now

    stream = dedup_stream(read_event_stream(spark, sf))
    return run_available_now(
        stream, f"sdedup_{_sf_tag(sf)}", output_mode="append", shuffle_partitions=4
    )


def q_streaming_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream interval join through real streaming execution:
    purchases attributed to same-user clicks in the preceding 4 hours;
    watermarks + two-sided time bounds keep join state bounded."""
    from onetable_spark.streaming.events import attribution_join_stream, read_event_stream, run_available_now

    stream = attribution_join_stream(read_event_stream(spark, sf))
    return run_available_now(
        stream, f"sjoin_{_sf_tag(sf)}", output_mode="append", shuffle_partitions=4
    )


def q_streaming_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user session windows via Spark's native ``session_window``
    stateful operator, run through Structured Streaming; the oracle derives
    identical session boundaries with a lag/running-sum in SQL."""
    from onetable_spark.streaming.events import read_event_stream, run_available_now, sessionize_stream

    stream = sessionize_stream(read_event_stream(spark, sf), gap="30 minutes")
    out = run_available_now(stream, f"sess_{_sf_tag(sf)}", shuffle_partitions=4)
    return out.select(
        "user_id",
        F.col("sess_start").cast("timestamp").cast("long").alias("sess_start_s"),
        F.col("sess_end").cast("timestamp").cast("long").alias("sess_end_s"),
        "n_events",
        "session_value",
    )


# --- formerly rows-only queries, now under the full hash gate --------------
# Round 7 closed the `no_oracle` gap: the LSH/IVF queries emit their exact,
# oracle-expressible ground truth plus constant booleans asserting the
# probabilistic structure's quality bounds (subset-of-exact, pinned-seed
# recall) computed IN-PLAN — so the driver's value-hash gate now covers the
# probabilistic layer too. SimHash needed no contract at all: its chunk
# pigeonhole candidates are EXACT for hamming ≤ 3, so switching the token
# hash to an md5-derived 64-bit value (computable in DuckDB) gives full
# value parity on the real pair output.


def q_minhash_lsh_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    Driver-gated via an IN-PLAN deterministic contract (no more rows-only
    check): the output is the EXACT 3-gram-Jaccard ≥ 0.4 pair set (shared
    with ngram_jaccard/dedup_clusters through ``_corpus_neardup_pairs``;
    oracle = the ngram_jaccard SQL) plus two constant booleans from the
    LSH run — ``lsh_subset_ok`` (every LSH pair is a true pair: candidates
    are exact-Jaccard-verified, so this is an invariant) and
    ``lsh_recall_ok`` (the 16-band/4-row banding recovers ≥ 80% of the
    exact set at the pinned signature seed; measured 1.0 at
    sf0.001/0.01/0.1 — the corpus' planted dups sit far above the 0.4
    banding knee). A broken signature, banding, or verification join flips
    a boolean and fails the driver's hash gate."""
    from onetable_spark.functions.dedup import minhash_lsh_dedup_pairs

    exact = _corpus_neardup_pairs(spark, sf, threshold=0.4)
    lsh = minhash_lsh_dedup_pairs(
        load_table(spark, sf, "documents"),
        threshold=0.4,
        sh=_corpus_shingles(spark, sf),
    )
    contract = _subset_recall_contract(exact, lsh, "lsh", bound=0.8)
    return exact.select("id_a", "id_b", "jaccard").crossJoin(F.broadcast(contract))


def q_simhash_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3 of 64 bits) — full value parity.

    The 16-bit-chunk candidate scheme is EXACT for hamming ≤ 3 (pigeonhole:
    3 flipped bits corrupt at most 3 of 4 chunks), so the pair output is a
    deterministic function of the token hashes — the only oracle blocker
    was xxhash64, which DuckDB lacks. This query therefore derives each
    token's 64-bit hash from md5 (top 16 hex chars → two conv'd 32-bit
    halves packed into a long), which DuckDB reproduces bit-for-bit as a
    64-char binary string (verified identical on sample tokens), making
    the whole near-dup report hash-comparable. Any 64-bit hash family
    serves SimHash equally; the library form (``functions.dedup.simhash64``)
    keeps the faster xxhash64 for non-oracle use.

    Parity scope: exactness (and therefore the oracle contract) holds
    while no identical-signature group or chunk bucket exceeds
    ``max_bucket`` (default 1024) — above the cap the Spark side
    deliberately trades completeness for skew bounds (star pairs /
    anchored sub-buckets, see ``simhash_near_dup_pairs``), which the
    oracle's exhaustive SQL does not model. The gate corpora sit far
    below the cap; a production corpus expected to exceed it should
    raise ``max_bucket`` when hash-auditing against an exhaustive
    reference."""
    from onetable_spark.functions.dedup import simhash_near_dup_pairs
    from onetable_spark.functions.text import tokens

    docs = load_table(spark, sf, "documents")
    # two chained selects so `m` is a plain attribute when the packing
    # transform consumes it — md5 runs ONCE per token, and an inlined
    # computed array would re-evaluate per element (the documented
    # O(n²) trap, see dedup._gram_hash_col)
    # (r15 continuation: a spread_if_narrow before this chain was
    # prototyped and measured NEUTRAL under interleaved same-session
    # min-of-N — the md5/conv build is ~0.5 s either way and the round-
    # robin exchange eats the fan-out gain at this corpus size — so the
    # single-scan form stays; tools/profile_simhash_legs.py reproduces)
    md5s = docs.select(
        F.col("doc_id").alias("id"),
        F.transform(tokens("text"), lambda t: F.md5(t)).alias("m"),
    )
    pack = lambda h: F.shiftleft(  # noqa: E731
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), 32
    ) + F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    th = md5s.select("id", F.transform("m", pack).alias("th"))
    return simhash_near_dup_pairs(docs, max_hamming=3, th=th).withColumn(
        "hamming", F.col("hamming").cast("int")
    )


def q_ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH bucket probe.

    Driver-gated via an IN-PLAN deterministic contract (no more rows-only
    check): the output is the EXACT brute-force top-10 (oracle = the
    embedding_topk SQL) plus a constant boolean from the LSH probe —
    ``lsh_planted_recall_ok``: multi-probe LSH (4 probes) over the corpus
    spiked with 10 planted near-copies of the query retrieves ≥ 8 of them
    (measured 10/10 at sf0.001/0.01/0.1). High-cosine retrieval is the
    promise LSH actually makes — the raw corpus is near-random (best
    cosine ≈ 0.33), the regime where bucket probing makes no recall claim.
    A broken hyperplane signature or probe enumeration flips the boolean
    and fails the driver's hash gate."""
    from onetable_spark.functions.similarity import ann_lsh_topk

    emb = load_table(spark, sf, "embeddings")
    # driver-ok: single-row query-vector fetch
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = _exact_embedding_topk(corpus, query)
    spiked = corpus.select("vec_id", "embedding").unionByName(
        _planted_near_dups(spark, query)
    )
    planted_ok = _planted_recall_flag(
        ann_lsh_topk(spiked, query, k=10, probes=4), "lsh_planted_recall_ok"
    )
    return exact.crossJoin(F.broadcast(planted_ok))


def q_multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing: synthetic media table → mapInPandas decode →
    feature aggregation (decode itself is a deterministic stub)."""
    from onetable_spark.functions.multimodal import decode_images, synth_media_table

    media = synth_media_table(spark, 200)
    feats = decode_images(media.filter(F.col("kind") == "image"))
    return feats.select(
        "media_id", "width", "height", F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 4).alias("feature_sum")
    )


def q_multimodal_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """``binaryFile`` INGESTION under the correctness gate (SURVEY §2.5's
    "binary-file data source" promise): the synthetic media corpus is
    materialized as REAL files in a hive-partitioned directory
    (``kind=image/42.bin``, written executor-side), then ingested with
    ``spark.read.format("binaryFile")`` — pathGlobFilter (a ``_staging.tmp``
    decoy per dir must be skipped), hive partition discovery for ``kind``,
    media_id parsed from the file name — and the image subset decoded with
    the same mapInPandas codec as multimodal_decode. Output carries the
    decoded features PLUS file_bytes (binaryFile's length column must
    equal the 64-byte payload) and n_ingested (all 200 files across the
    three kind partitions — a glob or discovery miss changes the
    constant). The kind filter partition-prunes at file listing; no
    driver-side per-file work anywhere in the read path."""
    from onetable_spark.functions.multimodal import (
        decode_images,
        ingest_media,
        synth_media_table,
        write_media_corpus,
    )

    def build(base: str) -> str:
        write_media_corpus(synth_media_table(spark, 200), base)
        return base

    base = _staged_once(spark, sf, "otb_media_q", build)
    media = ingest_media(spark, base)
    n_ingested = media.groupBy().agg(F.count(F.lit(1)).alias("n_ingested"))
    images = media.filter(F.col("kind") == "image")
    feats = decode_images(images)
    return (
        feats.select(
            "media_id",
            "width",
            "height",
            F.round(
                F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 4
            ).alias("feature_sum"),
        )
        .join(images.select("media_id", "kind", "file_bytes"), "media_id")
        .crossJoin(F.broadcast(n_ingested))
    )


def q_streaming_cdc_feed(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming CDC from the NATIVE Delta log: the reference replays
    `deltaLog.getChanges(versionToStartFrom)` as a batch pull loop
    (DeltaIncrementalChangesState.java:53-69); here the same per-version
    add/remove feed is a Structured Streaming file source over
    ``_delta_log`` itself (streaming/cdc.py) — Spark's checkpointed
    seen-files ledger IS the incremental offset, so restarts resume like
    the reference resumes from ``lastSyncedInstant``. The staged lifecycle
    commits add(f1), add(f2), then remove(f1); the feed must surface all
    four actions with the stats-plane record counts (never a data-file
    re-read) and the versions recovered from the commit file names."""
    import os

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.model import Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory
    from onetable_spark.streaming.cdc import read_delta_log_stream
    from onetable_spark.streaming.events import run_available_now

    def build(base: str) -> str:
        import shutil

        shutil.copy(os.path.join(sf, "region.parquet"), os.path.join(base, "f1.parquet"))
        schema = spark.read.parquet(base).schema
        log = DeltaLog(spark, base)
        log.init_table(
            Table(name="cdc", base_path=base, table_format=TableFormat.DELTA, read_schema=schema)
        )
        f1_inv = build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base)
        log.commit(adds=f1_inv)
        f2 = os.path.join(base, "f2.parquet")
        shutil.copy(os.path.join(sf, "region.parquet"), f2)
        log.commit(adds=build_inventory(spark, [f2], root=base))
        log.commit(removes=f1_inv, operation="DELETE")
        return base

    base = _staged_once(spark, sf, "otb_cdc_q", build)
    # stateless projection feed → append mode; one micro-batch via
    # AvailableNow drains the staged log exactly once
    return run_available_now(
        read_delta_log_stream(spark, base), output_mode="append", shuffle_partitions=4
    )


def q_streaming_cdc_hudi(spark: SparkSession, sf: str) -> DataFrame:
    """Rich streaming CDC from the HUDI timeline (streaming/cdc.py
    read_hudi_change_stream): per-file adds with stats-plane record counts
    parsed from the commit JSON (HoodieCommitMetadata — what
    HudiDataFileExtractor consumes batch-side), multiLine-tolerant of real
    Hudi's pretty-printed form. Instants are wall-clock timestamps, so the
    output pins their ORDER (dense_rank → commit_seq) rather than their
    values; the staged lifecycle commits f1 then f2 and the feed must
    surface exactly those two adds in commit order."""
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.model import Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory
    from onetable_spark.streaming.cdc import read_hudi_change_stream
    from onetable_spark.streaming.events import run_available_now

    def build(base: str) -> str:
        import os as _os
        import shutil as _shutil

        _shutil.copy(_os.path.join(sf, "region.parquet"), _os.path.join(base, "f1.parquet"))
        schema = spark.read.parquet(base).schema
        tl = HudiTimeline(spark, base)
        tl.init_table(
            Table(name="hcdc", base_path=base, table_format=TableFormat.HUDI, read_schema=schema)
        )
        tl.commit(
            adds=build_inventory(spark, [_os.path.join(base, "f1.parquet")], root=base),
            schema=schema,
        )
        f2 = _os.path.join(base, "f2.parquet")
        _shutil.copy(_os.path.join(sf, "region.parquet"), f2)
        tl.commit(adds=build_inventory(spark, [f2], root=base))
        return base

    base = _staged_once(spark, sf, "otb_hcdc_q", build)
    feed = run_available_now(
        read_hudi_change_stream(spark, base), output_mode="append", shuffle_partitions=4
    )
    return feed.select(
        F.dense_rank().over(Window.orderBy("instant")).alias("commit_seq"),
        "change",
        "file_name",
        "record_count",
    )


def q_sync_continuous(spark: SparkSession, sf: str) -> DataFrame:
    """CONTINUOUS sync under the correctness gate (sync/continuous.py):
    the reference runs RunSync from cron; here the CDC stream over the
    source's _delta_log triggers the same idempotent incremental sync the
    moment a commit lands. Staged lifecycle: drain 1 FULL-bootstraps both
    targets from the f1 commit; f2 lands; drain 2 (a NEW service instance
    resuming the SAME checkpoint) must trigger exactly once with exactly
    one action and replay INCREMENTALLY. Output pins each drain's
    (n_commits, per-format status+mode) plus the targets' final inventory
    — a service that re-delivered a commit, missed one, or FULL-resynced
    flips the hash."""
    import os
    import shutil

    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory
    from onetable_spark.sync.continuous import ContinuousSync

    def build(base: str) -> dict:
        shutil.copy(os.path.join(sf, "region.parquet"), os.path.join(base, "f1.parquet"))
        schema = spark.read.parquet(base).schema
        log = DeltaLog(spark, base)
        log.init_table(
            Table(
                name="csvc", base_path=base, table_format=TableFormat.DELTA, read_schema=schema
            )
        )
        log.commit(adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base))

        ckpt = os.path.join(base, "_watch_ckpt")
        targets = (TableFormat.ICEBERG, TableFormat.HUDI)
        j1 = ContinuousSync(spark, base, targets, ckpt, validate=True).run_available_now()
        _require(len(j1) == 1, j1)

        f2 = os.path.join(base, "f2.parquet")
        shutil.copy(os.path.join(sf, "region.parquet"), f2)
        log.commit(adds=build_inventory(spark, [f2], root=base))
        j2 = ContinuousSync(spark, base, targets, ckpt, validate=True).run_available_now()
        _require(len(j2) == 1, j2)
        return {"base": base, "drains": [j1[0], j2[0]]}

    stage = _staged_once(spark, sf, "otb_csvc_q", build)
    readers = {
        "ICEBERG": lambda p: IcebergTable(spark, p),
        "HUDI": lambda p: HudiTimeline(spark, p),
    }
    out = None
    for fmt, mk in readers.items():
        files = mk(stage["base"]).snapshot_files()
        inv = files.agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("record_count").cast("long").alias("n_records"),
        )
        for phase, drain in enumerate(stage["drains"], start=1):
            status, mode = drain["results"][fmt]
            part = inv.select(
                F.lit(phase).alias("drain"),
                F.lit(fmt).alias("fmt"),
                F.lit(status).alias("status"),
                F.lit(mode).alias("sync_mode"),
                F.lit(drain["n_commits"]).cast("long").alias("n_commits"),
                "n_files",
                "n_records",
            )
            out = part if out is None else out.unionByName(part)
    return out


def q_token_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Tokens-per-byte cost calibration: per-source ordinary least squares
    of whitespace-token count on character count — the model a 100 TB
    pipeline uses to budget tokenizer cost from raw byte sizes before
    decoding anything. Spark-first linear algebra: the five sufficient
    statistics (n, Σx, Σy, Σxy, Σx², Σy²) are ONE partial-aggregable
    groupBy in exact DECIMAL(38,0) arithmetic (map-side combine, no second
    pass over the data, no MLlib, no driver matrix); slope/intercept/r²
    come from the closed form on the per-group statistics. Exact integer
    sums make the result bit-identical across engines; only the final
    division is floating point (then the decimal-hop round, see
    _QUALITY_SQL's note)."""
    docs = load_table(spark, sf, "documents")
    from onetable_spark.functions.text import token_count

    dec = "decimal(38,0)"
    # per-row products stay in LONG (documents are < 2^26 chars, so x*y,
    # x², y² are < 2^53); only the corpus-scale SUMS go through
    # decimal(38,0), where a 100 TB corpus still has ~18 digits of headroom
    x = F.col("n_chars").cast("long")
    y = token_count("text").cast("long")
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum((x * y).cast(dec)).alias("sxy"),
        F.sum((x * x).cast(dec)).alias("sxx"),
        F.sum((y * y).cast(dec)).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy"))
    var_x = (n * sxx - sx * sx).cast("double")
    cov = (n * sxy - sx * sy).cast("double")
    var_y = (n * syy - sy * sy).cast("double")
    return stats.select(
        "source",
        n.cast("long").alias("n_docs"),
        F.round(cov / var_x, 6).alias("slope"),
        F.round((sy * sxx - sx * sxy).cast("double") / var_x, 6).alias("intercept"),
        F.round(cov * cov / (var_x * var_y), 6).alias("r2"),
    )


def q_bpe_pair_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-training statistics (functions/bpe.py): the corpus
    collapses to DISTINCT words × frequency, then frequency-weighted
    adjacent CHARACTER-pair counts — the sufficient statistic for the
    first BPE merge decision (Sennrich et al. 2016). Two aggregations
    total, both over the vocabulary (not the corpus); top-50 with a fully
    deterministic (cnt desc, a, b) tiebreak so the would-be merge order is
    reproducible across partitionings. tests/test_bpe.py drives the full
    iterative merge LOOP against a pure-Python reference."""
    from onetable_spark.functions.bpe import pair_stats, word_frequencies

    docs = load_table(spark, sf, "documents")
    vocab = word_frequencies(docs).withColumn("syms", F.split("word", ""))
    return pair_stats(vocab).orderBy(F.desc("cnt"), "a", "b").limit(50)


def q_compaction_bins(spark: SparkSession, sf: str) -> DataFrame:
    """OPTIMIZE-style compaction planning (operators/maintenance.py): bin
    small files into ~32 KB rewrite groups per partition via the
    fixed-stride cumulative-sum relaxation — one window + one same-keyed
    groupBy, no sequential scan. The documents table stands in as the file
    inventory at volume (doc_id≡path, n_chars≡size, source≡partition);
    tests/test_maintenance.py applies the identical planner to a real
    ``snapshot_files()`` inventory and feeds a planned bin through the
    Hudi replace-commit writer (the consumer the reference reads back,
    HudiDataFileExtractor.java:181-198)."""
    from onetable_spark.operators.maintenance import plan_compaction_bins

    docs = load_table(spark, sf, "documents")
    return plan_compaction_bins(
        docs.select("source", "doc_id", "n_chars"),
        target_bytes=32768,
        part_cols=("source",),
        size_col="n_chars",
        order_col="doc_id",
    )


_LANG_SQL_VOTES = """
            len(list_filter(string_split(text, ' '), x -> x IN ('the','and','of','to','is'))) AS v_en,
            len(list_filter(string_split(text, ' '), x -> x IN ('der','die','und','das','nicht'))) AS v_de,
            len(list_filter(string_split(text, ' '), x -> x IN ('le','les','une','est','dans'))) AS v_fr,
            len(list_filter(string_split(text, ' '), x -> x IN ('el','los','una','que','por'))) AS v_es
"""

# NB: DuckDB's RE2 lacks \\uXXXX escapes — the CJK range is embedded as
# literal characters (Spark-side rlike uses the \\u form; same range)
_LANG_SQL_PRED = f"""
        CASE WHEN regexp_matches(text, '[{chr(0x4E00)}-{chr(0x9FFF)}]') THEN 'zh'
             WHEN greatest(v_en, v_de, v_fr, v_es) = 0 THEN 'und'
             WHEN v_en = greatest(v_en, v_de, v_fr, v_es) THEN 'en'
             WHEN v_de = greatest(v_en, v_de, v_fr, v_es) THEN 'de'
             WHEN v_fr = greatest(v_en, v_de, v_fr, v_es) THEN 'fr'
             ELSE 'es' END
"""

# double→DECIMAL(18,10)→round(4)→double: DuckDB's plain ROUND(double) rounds
# the binary value (0.53375 → 0.5337); the decimal hop reproduces Spark's
# HALF_UP-on-shortest-repr semantics (→ 0.5338)
_QUALITY_SQL = """
        CAST(ROUND(CAST(
            0.5 * least(1.0, (len(list_filter(string_split(text, ' '), x -> x IN ('the','and','of','to','is')))
                              / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 5)
          + 0.3 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100)
          + 0.2 * (1.0 - least(1.0, ((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                                     / CAST(length(text) AS DOUBLE)) * 10))
        AS DECIMAL(18,10)), 4) AS DOUBLE)
"""

_COS_SQL = """
        list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
           * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
"""

# hex-pair → byte value (DuckDB has no blob byte indexing; digest bytes are
# recovered from the sha256 hex string with digit arithmetic)
_HEXBYTE = (
    "(16*(strpos('0123456789abcdef', h[2*i-1])-1)"
    " + strpos('0123456789abcdef', h[2*i])-1)"
)
# one stub feature element: byte/255 stored as float32 then summed as double,
# matching the Pandas-UDF fake decode exactly
_STUB_FEAT = f"CAST(CAST({_HEXBYTE}/255.0 AS REAL) AS DOUBLE)"

ORACLE_SQL: dict[str, str] = {
    "multimodal_decode": f"""
        WITH d AS (
            SELECT range AS media_id,
                   sha256(sha256(CAST(range AS VARCHAR))) AS h
            FROM range(200) WHERE range % 3 = 0
        )
        SELECT media_id,
               CAST(64 + 16*(strpos('0123456789abcdef', h[1])-1)
                       + strpos('0123456789abcdef', h[2])-1 AS INT) AS width,
               CAST(64 + 16*(strpos('0123456789abcdef', h[3])-1)
                       + strpos('0123456789abcdef', h[4])-1 AS INT) AS height,
               CAST(ROUND(CAST(list_sum(list_transform(range(3, 11), i -> {_STUB_FEAT}))
                   AS DECIMAL(18,10)), 4) AS DOUBLE) AS feature_sum
        FROM d
    """,
    # same stub-decode contract as multimodal_decode, plus the binaryFile
    # plumbing facts: 64-byte payloads (hex digest as utf8), kind from
    # partition discovery, and all 200 files seen by the glob
    "multimodal_ingest": f"""
        WITH d AS (
            SELECT range AS media_id,
                   sha256(sha256(CAST(range AS VARCHAR))) AS h
            FROM range(200) WHERE range % 3 = 0
        )
        SELECT media_id,
               CAST(64 + 16*(strpos('0123456789abcdef', h[1])-1)
                       + strpos('0123456789abcdef', h[2])-1 AS INT) AS width,
               CAST(64 + 16*(strpos('0123456789abcdef', h[3])-1)
                       + strpos('0123456789abcdef', h[4])-1 AS INT) AS height,
               CAST(ROUND(CAST(list_sum(list_transform(range(3, 11), i -> {_STUB_FEAT}))
                   AS DECIMAL(18,10)), 4) AS DOUBLE) AS feature_sum,
               'image' AS kind,
               CAST(64 AS BIGINT) AS file_bytes,
               CAST(200 AS BIGINT) AS n_ingested
        FROM d
    """,
    "audio_features": f"""
        WITH d AS (
            SELECT range AS media_id,
                   range * 1000 % 10000 AS duration_ms,
                   sha256('audio:' || sha256(CAST(range AS VARCHAR))) AS h
            FROM range(200) WHERE range % 3 = 1
        )
        SELECT media_id,
               CAST(CASE (16*(strpos('0123456789abcdef', h[1])-1)
                          + strpos('0123456789abcdef', h[2])-1) % 4
                    WHEN 0 THEN 8000 WHEN 1 THEN 16000
                    WHEN 2 THEN 22050 ELSE 44100 END AS INT) AS sample_rate,
               duration_ms,
               CAST(ROUND(CAST(list_sum(list_transform(range(2, 10), i -> {_STUB_FEAT}))
                   AS DECIMAL(18,10)), 4) AS DOUBLE) AS feature_sum
        FROM d
    """,
    "image_resize": """
        WITH d AS (
            SELECT range AS media_id,
                   sha256(sha256(CAST(range AS VARCHAR))) AS hh
            FROM range(200) WHERE range % 3 = 0
        ),
        dims AS (
            SELECT media_id, hh,
                   64 + 16*(strpos('0123456789abcdef', hh[1])-1)
                      + strpos('0123456789abcdef', hh[2])-1 AS w,
                   64 + 16*(strpos('0123456789abcdef', hh[3])-1)
                      + strpos('0123456789abcdef', hh[4])-1 AS h
            FROM d
        ),
        pix AS (
            SELECT media_id, hh,
                   ((((r.range * h) // 32) * w + ((c.range * w) // 32)) % 32) AS p
            FROM dims, range(32) r, range(32) c
        )
        SELECT media_id,
               CAST(32 AS INT) AS out_width, CAST(32 AS INT) AS out_height,
               AVG(CAST(16*(strpos('0123456789abcdef', hh[2*p+1])-1)
                        + strpos('0123456789abcdef', hh[2*p+2])-1 AS DOUBLE)) AS mean_intensity
        FROM pix GROUP BY media_id
    """,
    "video_frame_sample": f"""
        WITH media AS (
            SELECT range AS media_id, range*1000 % 10000 AS duration_ms
            FROM range(200) WHERE range % 3 = 2
        ),
        frames AS (
            SELECT media_id,
                   sha256(sha256(CAST(media_id AS VARCHAR)) || CAST(ts AS VARCHAR)) AS h
            FROM media, unnest(range(0, duration_ms + 1, 1000)) AS t(ts)
        )
        SELECT media_id, COUNT(*) AS n_frames,
               CAST(ROUND(CAST(SUM(list_sum(list_transform(range(1, 9), i -> {_STUB_FEAT})))
                   AS DECIMAL(18,10)), 4) AS DOUBLE) AS feature_mass
        FROM frames GROUP BY media_id
    """,
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
    "tpch_q4": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 30)
        GROUP BY o_orderpriority
    """,
    "tpch_q6": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    "tpch_q7": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    "tpch_q13": """
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
              FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey)
        GROUP BY c_count
    """,
    "tpch_q15": """
        WITH rev AS (
            SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    "tpch_q17": """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN (SELECT l_partkey AS ap_key, AVG(l_quantity) * 0.5 AS half_avg
              FROM lineitem GROUP BY l_partkey) a ON l_partkey = ap_key
        WHERE p_brand = 'Brand#1' AND l_quantity < half_avg
    """,
    "tpch_q10": """
        SELECT c_custkey, c_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, orders, customer, nation
        WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
    "tpch_q14": """
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    "tpch_q18": """
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_date, o_totalprice,
               ROUND(total_qty, 2) AS total_qty
        FROM (SELECT l_orderkey, SUM(l_quantity) AS total_qty
              FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
    "tpch_q22": """
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_nationkey
    """,
    "tpch_q2": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS supplycost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        cand AS (
            SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
                   ps.supplycost,
                   MIN(ps.supplycost) OVER (PARTITION BY p.p_partkey) AS min_cost
            FROM ps
            JOIN part p ON ps.l_partkey = p.p_partkey
                       AND p.p_size < 15 AND p.p_type = 'LARGE'
            JOIN supplier s ON ps.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               ROUND(supplycost, 4) AS supplycost
        FROM cand WHERE supplycost = min_cost
    """,
    "tpch_q8": """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               ROUND(SUM(CASE WHEN sn.n_name = 'NATION_3'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN orders ON l_orderkey = o_orderkey
             AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        GROUP BY year(o_orderdate)
    """,
    "tpch_q9": """
        SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY n_name, year(o_orderdate)
    """,
    "tpch_q11": """
        WITH national AS (
            SELECT l_partkey, l_extendedprice * l_quantity AS v
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
        )
        SELECT l_partkey, ROUND(SUM(v), 2) AS value
        FROM national GROUP BY l_partkey
        HAVING SUM(v) > 0.001 * (SELECT SUM(v) FROM national)
    """,
    "tpch_q12": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
    """,
    "tpch_q16": """
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON ps.l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%' AND p_size <= 10
          AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    "tpch_q19": """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q20": """
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_11'
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small%'
            GROUP BY l_suppkey HAVING SUM(l_quantity) > 50)
    """,
    "tpch_q21": """
        WITH failed AS (
            SELECT DISTINCT l_orderkey, l_suppkey
            FROM lineitem
            WHERE l_returnflag = 'R'
              AND l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        )
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM failed f
        JOIN supplier ON f.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_5'
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = f.l_orderkey
                        AND l2.l_suppkey <> f.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = f.l_orderkey
                            AND l3.l_suppkey <> f.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
    """,
    "dedup_exact": """
        SELECT md5(text) AS content_hash,
               CAST(MIN(doc_id) AS BIGINT) AS keep_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "fingerprint_dedup": """
        SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
               CAST(MIN(doc_id) AS BIGINT) AS keep_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    """,
    "text_features": f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               {_QUALITY_SQL} AS quality,
               {_LANG_SQL_PRED} AS lang_pred
        FROM (SELECT doc_id, text, {_LANG_SQL_VOTES} FROM documents)
    """,
    "langid_counts": f"""
        SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM (SELECT lang, {_LANG_SQL_PRED} AS lang_pred
              FROM (SELECT lang, text, {_LANG_SQL_VOTES} FROM documents))
        GROUP BY lang, lang_pred
    """,
    "ngram_jaccard": """
        WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(t) - 1),
                                 i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.4
    """,
    "dedup_clusters": """
        WITH RECURSIVE sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(t) - 1),
                                 i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        ),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.4
        ),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        reach(n, m) AS (
            SELECT a, a FROM edges
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
        ),
        comp AS (SELECT n, MIN(m) AS component FROM reach GROUP BY n)
        SELECT component AS cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(MAX(n) AS BIGINT) AS max_member
        FROM comp GROUP BY component
    """,
    "embedding_topk": f"""
        SELECT b.vec_id, ROUND({_COS_SQL}, 4) AS cos_sim
        FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) a
        WHERE b.vec_id <> 0
        ORDER BY cos_sim DESC, b.vec_id ASC LIMIT 10
    """,
    "embedding_near_dups": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_COS_SQL}, 4) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE ROUND({_COS_SQL}, 4) >= 0.45
    """,
    "sessionize": """
        SELECT user_id,
               CAST(MAX(sess_id) AS BIGINT) AS n_sessions,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM (
            SELECT user_id, value,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
            FROM (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                                 OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                            THEN 1 ELSE 0 END AS new_sess
                FROM events))
        GROUP BY user_id
    """,
    "token_stats": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS bpe_tokens,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ' '),
                                      t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT))),
                   (acc, h) -> (acc * 31 + h) % 2147483647) AS rolling_fp
        FROM documents
    """,
    "corpus_curation": f"""
        WITH scored AS (
            SELECT doc_id, text,
                   {_LANG_SQL_PRED} AS lang,
                   {_QUALITY_SQL} AS quality,
                   CAST(len(string_split(text, ' ')) AS INT) AS toks
            FROM (SELECT doc_id, text, {_LANG_SQL_VOTES} FROM documents)
        ),
        kept AS (
            SELECT * FROM scored
            WHERE lang IN ('en','de','fr','es') AND quality >= 0.2
        ),
        dedup AS (
            SELECT MIN(doc_id) AS doc_id, MIN(toks) AS toks, MIN(lang) AS lang
            FROM kept GROUP BY md5(text)
        ),
        sampled AS (
            SELECT * FROM dedup
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 1000 < 500
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS total_tokens
        FROM sampled GROUP BY lang
    """,
    "deterministic_sample": """
        SELECT doc_id,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
                    % 1000 AS INT) AS sample_bucket
        FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 1000 < 130
    """,
    "token_packing": """
        WITH toks AS (
            SELECT doc_id, doc_id % 32 AS shard,
                   len(string_split(text, ' ')) AS tokens
            FROM documents
        ),
        packed AS (
            SELECT shard,
                   CAST(FLOOR((SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                               - tokens) / 2000.0) AS BIGINT) AS batch_id,
                   tokens
            FROM toks
        )
        SELECT shard, batch_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(tokens) AS BIGINT) AS batch_tokens
        FROM packed GROUP BY shard, batch_id
    """,
    "pivot_events": """
        SELECT user_id,
               CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
               CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error
        FROM events GROUP BY user_id
    """,
    "unpivot_stats": """
        SELECT c_nationkey, metric, value
        FROM (SELECT c_nationkey,
                     ROUND(SUM(c_acctbal), 2) AS total_bal,
                     -- decimal hop: match Spark's HALF_UP-on-decimal-repr
                     CAST(ROUND(CAST(AVG(c_acctbal) AS DECIMAL(18,10)), 2) AS DOUBLE) AS avg_bal,
                     CAST(COUNT(*) AS DOUBLE) AS n_custs
              FROM customer GROUP BY c_nationkey)
        UNPIVOT (value FOR metric IN (total_bal, avg_bal, n_custs))
    """,
    "intersect_keys": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    """,
    "full_outer_balance": """
        SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey, cust_bal, supp_bal
        FROM (SELECT c_nationkey AS nationkey, ROUND(SUM(c_acctbal), 2) AS cust_bal
              FROM customer GROUP BY 1) c
        FULL OUTER JOIN
             (SELECT s_nationkey AS nationkey, ROUND(SUM(s_acctbal), 2) AS supp_bal
              FROM supplier GROUP BY 1) s
          ON c.nationkey = s.nationkey
    """,
    "rollup_agg": """
        SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "cube_agg": """
        SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "percentile_agg": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
               ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
               ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    "window_agg": """
        SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS w_start_s,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "hopping_window": """
        SELECT CAST(epoch(ws) AS BIGINT) AS w_start_s, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM (SELECT event_type,
                     unnest([time_bucket(INTERVAL '30 minutes', ts),
                             time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
              FROM events)
        GROUP BY 1, 2
    """,
    "asof_join": """
        WITH o AS (
            SELECT o_custkey AS user_id, o_orderdate,
                   MAX(o_orderkey) AS o_orderkey,
                   arg_max(o_totalprice, o_orderkey) AS o_totalprice
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id,
               CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
               o.o_orderkey, o.o_totalprice
        FROM events e
        ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
    """,
    "range_join": """
        SELECT band, CAST(COUNT(*) AS BIGINT) AS n_parts,
               ROUND(AVG(p_retailprice), 2) AS avg_price
        FROM part p
        JOIN (VALUES ('budget', 0.0, 925.0), ('mid', 925.0, 950.0),
                     ('premium', 950.0, 975.0), ('luxury', 975.0, 10000000.0))
             b(band, lo, hi)
          ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
        GROUP BY band
    """,
    # streaming twins: same ANSI semantics — the STREAMING execution path is
    # what differs, and it must hash-match the SQL result
    "streaming_window_agg": """
        SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS w_start_s,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "sync_inventory": """
        SELECT fmt, 'region.parquet' AS file_name,
               CAST(COUNT(*) AS BIGINT) AS record_count
        FROM region CROSS JOIN (VALUES ('DELTA'), ('ICEBERG'), ('HUDI')) f(fmt)
        GROUP BY fmt
    """,
    # DuckDB counts the REAL-runtime-written fixture parquet directly;
    # the Spark side must reproduce those counts purely from decoding the
    # foreign Delta log / Hudi commit metadata (and from our own targets'
    # re-encodings of it) — a genuine cross-engine conformance oracle.
    "sync_foreign_table": """
        SELECT 'dimGeography' AS tbl, fmt,
               'part-00000-6ccb71bc-9cc1-4226-a7b5-f752edbedee6-c000.snappy.parquet'
                   AS file_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM read_parquet(
                   '/root/reference/demo/data/db/delta_dimGeography/*.parquet'))
                   AS record_count,
               TRUE AS validation_ok
        FROM (VALUES ('DELTA'), ('ICEBERG'), ('HUDI')) f(fmt)
        UNION ALL
        SELECT 'dimCustomer' AS tbl, fmt,
               'b1ee44c7-255b-47bf-b788-1e7017790326-0_0-80-172_20231105172136406.parquet'
                   AS file_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM read_parquet(
                   '/root/reference/demo/data/db/hudi_dimCustomer/*.parquet'))
                   AS record_count,
               TRUE AS validation_ok
        FROM (VALUES ('DELTA'), ('ICEBERG'), ('HUDI')) f(fmt)
    """,
    # the staged VACUUM lifecycle is deterministic: 2 referenced region
    # copies, one aged orphan (removed), one fresh orphan (kept); the
    # surviving table's stats-plane record total = 2x region
    "vacuum_orphans": """
        SELECT f.file_name, f.status,
               f.status <> 'removed' AS on_disk,
               (SELECT CAST(2 * COUNT(*) AS BIGINT) FROM region) AS n_live_records
        FROM (VALUES ('f1.parquet', 'referenced'),
                     ('f2.parquet', 'referenced'),
                     ('orphan_new.parquet', 'kept_recent'),
                     ('orphan_old.parquet', 'removed')) f(file_name, status)
    """,
    # the staged ZORDER lifecycle is deterministic: 4 row-number slices of
    # events -> one OPTIMIZE ZORDER commit -> 2 disjoint z-range files;
    # the layout contract booleans are computed in-plan from real file
    # bounds, the record total from the Delta stats plane
    "zorder_compaction": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
               4 AS files_before,
               2 AS files_after,
               TRUE AS zspans_disjoint_ok,
               TRUE AS span_tightened_ok,
               TRUE AS prune_improved_ok
        FROM events
    """,
    # the foreign fixture's data files are exact row-subsets of region
    # (A: r_regionkey < 2, B: >= 2), so DuckDB recomputes the counts AND
    # the manifest bounds the Spark side decodes from reference-written
    # Avro; bounds surface only on the ICEBERG (source-read) rows
    "sync_foreign_iceberg": """
        WITH per_file AS (
            SELECT CASE WHEN r_regionkey < 2 THEN 'A.parquet'
                        ELSE 'B.parquet' END AS file_name,
                   CAST(COUNT(*) AS BIGINT) AS record_count,
                   CAST(MIN(r_regionkey) AS VARCHAR) AS min_rk,
                   CAST(MAX(r_regionkey) AS VARCHAR) AS max_rk
            FROM region GROUP BY 1
        )
        SELECT fmt, file_name, record_count,
               CASE WHEN fmt = 'ICEBERG' THEN min_rk END AS min_rk,
               CASE WHEN fmt = 'ICEBERG' THEN max_rk END AS max_rk,
               TRUE AS validation_ok
        FROM per_file
        CROSS JOIN (VALUES ('ICEBERG'), ('DELTA'), ('HUDI')) f(fmt)
    """,
    # the position deletes remove every ODD r_regionkey row from B
    # (r_regionkey >= 2); A (r_regionkey < 2) is untouched — so the net
    # counts are recomputable from the region rows alone
    "sync_foreign_iceberg_deletes": """
        WITH per_file AS (
            SELECT 'A.parquet' AS file_name, CAST(COUNT(*) AS BIGINT) AS record_count
            FROM region WHERE r_regionkey < 2
            UNION ALL
            SELECT 'B.parquet', CAST(COUNT(*) AS BIGINT)
            FROM region WHERE r_regionkey >= 2 AND r_regionkey % 2 = 0
        )
        SELECT fmt, file_name, record_count, TRUE AS validation_ok
        FROM per_file
        CROSS JOIN (VALUES ('ICEBERG'), ('DELTA'), ('HUDI')) f(fmt)
    """,
    # the translated Delta table's stats plane must report the same net
    # counts the Iceberg reader computes: A raw, B = even keys only
    "dv_translation": """
        SELECT 'A.parquet' AS file_name, CAST(COUNT(*) AS BIGINT) AS record_count,
               TRUE AS dv_ok, TRUE AS data_equiv_ok
        FROM region WHERE r_regionkey < 2
        UNION ALL
        SELECT 'B.parquet', CAST(COUNT(*) AS BIGINT), TRUE, TRUE
        FROM region WHERE r_regionkey >= 2 AND r_regionkey % 2 = 0
    """,
    # pos deletes kill odd keys of B; eq deletes kill {3,4} (3 overlaps,
    # counts once) — B keeps the even keys except 4; A (keys < 2) is
    # untouched
    "iceberg_eq_deletes": """
        SELECT 'A.parquet' AS file_name, CAST(COUNT(*) AS BIGINT) AS record_count,
               TRUE AS refused_ok
        FROM region WHERE r_regionkey < 2
        UNION ALL
        SELECT 'B.parquet', CAST(COUNT(*) AS BIGINT), TRUE
        FROM region WHERE r_regionkey >= 2 AND r_regionkey % 2 = 0
                      AND r_regionkey <> 4
    """,
    # v2 checkpoint replay: f1 raw, f2 nets its odd-key DV, f3 landed
    # after the checkpoint and stacks on the sidecar base
    "delta_v2_checkpoint": """
        SELECT 'f1.parquet' AS file_name, CAST(COUNT(*) AS BIGINT) AS record_count,
               TRUE AS v2_ok
        FROM region
        UNION ALL
        SELECT 'f2.parquet', CAST(COUNT(*) AS BIGINT), TRUE
        FROM region WHERE r_regionkey % 2 = 0
        UNION ALL
        SELECT 'f3.parquet', CAST(COUNT(*) AS BIGINT), TRUE FROM region
    """,
    # manifest compaction must not move counts: f0 still nets its two
    # position deletes through the folded manifest's explicit seqs
    "iceberg_manifest_compaction": """
        SELECT 'f0.parquet' AS file_name,
               CAST(COUNT(*) - 2 AS BIGINT) AS record_count, TRUE AS folded_ok
        FROM region
        UNION ALL
        SELECT 'f1.parquet', CAST(COUNT(*) AS BIGINT), TRUE FROM region
        UNION ALL
        SELECT 'f2.parquet', CAST(COUNT(*) AS BIGINT), TRUE FROM region
        UNION ALL
        SELECT 'f3.parquet', CAST(COUNT(*) AS BIGINT), TRUE FROM region
    """,
    # WAP: the published table holds both region copies; the immutable
    # tag still time-travels to the pre-publish single-file state
    "iceberg_wap": """
        SELECT 'published' AS phase, CAST(2 AS BIGINT) AS n_files,
               CAST(2 * COUNT(*) AS BIGINT) AS n_records, TRUE AS audit_ok
        FROM region
        UNION ALL
        SELECT 'tag_v1', CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT), TRUE
        FROM region
    """,
    # MOR keyed upsert: updates are zero-sum in the realtime view (f1
    # keeps the full count), the fresh insert group carries exactly 2
    "hudi_upsert": """
        SELECT 'f1.parquet' AS file_kind, CAST(COUNT(*) AS BIGINT) AS record_count,
               TRUE AS log_ok, TRUE AS merge_equiv_ok
        FROM region
        UNION ALL
        SELECT 'inserted', CAST(2 AS BIGINT), TRUE, TRUE
    """,
    # streaming keyed upsert: batch 0 seeds region, batch 1 re-sends
    # keys {0,2} — per-batch nets agree in BOTH formats
    "streaming_upsert": """
        SELECT 'DELTA' AS fmt, 'batch=0' AS batch_kind,
               CAST(COUNT(*) AS BIGINT) AS n_records
        FROM region WHERE r_regionkey NOT IN (0, 2)
        UNION ALL
        SELECT 'DELTA', 'batch=1', CAST(COUNT(*) AS BIGINT)
        FROM region WHERE r_regionkey IN (0, 2)
        UNION ALL
        SELECT 'ICEBERG', 'batch=0', CAST(COUNT(*) AS BIGINT)
        FROM region WHERE r_regionkey NOT IN (0, 2)
        UNION ALL
        SELECT 'ICEBERG', 'batch=1', CAST(COUNT(*) AS BIGINT)
        FROM region WHERE r_regionkey IN (0, 2)
    """,
    # keyed DV merge: u1 upserted keys {0,2}, u2 re-upserted {0}
    # (netting u1's copy via the replaced descriptor's union)
    "delta_upsert": """
        SELECT 'f1.parquet' AS file_name, CAST(COUNT(*) AS BIGINT) AS record_count,
               TRUE AS dv_ok
        FROM region WHERE r_regionkey NOT IN (0, 2)
        UNION ALL
        SELECT 'u1.parquet', CAST(COUNT(*) AS BIGINT), TRUE
        FROM region WHERE r_regionkey = 2
        UNION ALL
        SELECT 'u2.parquet', CAST(COUNT(*) AS BIGINT), TRUE
        FROM region WHERE r_regionkey = 0
    """,
    # CDC upsert: u1 upserted keys {0,2}, u2 re-upserted {0} (netting
    # u1's copy), a pure eq delete killed {4} — f1 keeps the rest
    "iceberg_upsert": """
        SELECT 'f1.parquet' AS file_name, CAST(COUNT(*) AS BIGINT) AS record_count,
               TRUE AS refused_ok
        FROM region WHERE r_regionkey NOT IN (0, 2, 4)
        UNION ALL
        SELECT 'u1.parquet', CAST(COUNT(*) AS BIGINT), TRUE
        FROM region WHERE r_regionkey = 2
        UNION ALL
        SELECT 'u2.parquet', CAST(COUNT(*) AS BIGINT), TRUE
        FROM region WHERE r_regionkey = 0
    """,
    # REORG APPLY (PURGE): f1 untouched (all region rows), the purged
    # parquet holds f2's survivors — the DV deleted every odd key
    "delta_dv_purge": """
        SELECT 'f1.parquet' AS file_kind, CAST(COUNT(*) AS BIGINT) AS record_count,
               TRUE AS data_equiv_ok, TRUE AS time_travel_ok,
               TRUE AS no_dv_ok, TRUE AS idempotent_ok
        FROM region
        UNION ALL
        SELECT 'purged', CAST(COUNT(*) AS BIGINT), TRUE, TRUE, TRUE, TRUE
        FROM region WHERE r_regionkey % 2 = 0
    """,
    # rewrite_data_files materializes the deletes away: A (keys < 2)
    # carried untouched, the rewritten parquet holds B's survivors (even
    # keys except 4 — pos deletes kill odds, eq deletes kill {3, 4})
    "iceberg_rewrite_files": """
        SELECT 'A.parquet' AS file_kind, CAST(COUNT(*) AS BIGINT) AS record_count,
               TRUE AS data_equiv_ok, TRUE AS time_travel_ok, TRUE AS idempotent_ok
        FROM region WHERE r_regionkey < 2
        UNION ALL
        SELECT 'rewritten', CAST(COUNT(*) AS BIGINT), TRUE, TRUE, TRUE
        FROM region WHERE r_regionkey >= 2 AND r_regionkey % 2 = 0
                      AND r_regionkey <> 4
    """,
    # compaction materializes +3 inserted keys and -1 deleted key into
    # the new base parquet; the default view's count recomputes from
    # region rows
    "hudi_mor_compaction": """
        SELECT 'compacted' AS file_name,
               CAST(COUNT(*) + 2 AS BIGINT) AS record_count,
               TRUE AS data_equiv_ok
        FROM region
    """,
    # the DELETE log blocks net the odd keys of B out of the realtime
    # view: A (keys < 2) raw, B = even keys only — same nets as the
    # Iceberg reader's (dv_translation's twin, third triangle edge)
    "hudi_delete_translation": """
        SELECT 'A.parquet' AS file_name, CAST(COUNT(*) AS BIGINT) AS record_count,
               TRUE AS log_ok, TRUE AS data_equiv_ok
        FROM region WHERE r_regionkey < 2
        UNION ALL
        SELECT 'B.parquet', CAST(COUNT(*) AS BIGINT), TRUE, TRUE
        FROM region WHERE r_regionkey >= 2 AND r_regionkey % 2 = 0
    """,
    # log effects derive from region rows: inserts = odd keys, deletes =
    # zero keys; realtime = base + ins - del
    "hudi_mor_views": """
        WITH c AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN r_regionkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ins,
                   CAST(SUM(CASE WHEN r_regionkey = 0 THEN 1 ELSE 0 END) AS BIGINT) AS del
            FROM region
        )
        SELECT 'read_optimized' AS view_name, 'f1.parquet' AS file_name,
               n AS record_count, TRUE AS refused_ok
        FROM c
        UNION ALL
        SELECT 'realtime', 'f1.parquet', n + ins - del, TRUE FROM c
    """,
    # the DV deletes every ODD r_regionkey position from f2 (a full
    # region copy); f1 stays raw — net counts recompute from region rows
    "sync_delta_dv": """
        WITH per_file AS (
            SELECT 'f1.parquet' AS file_name, CAST(COUNT(*) AS BIGINT) AS record_count
            FROM region
            UNION ALL
            SELECT 'f2.parquet', CAST(COUNT(*) AS BIGINT)
            FROM region WHERE r_regionkey % 2 = 0
        )
        SELECT fmt, file_name, record_count, TRUE AS dv_ok
        FROM per_file
        CROSS JOIN (VALUES ('DELTA'), ('ICEBERG'), ('HUDI')) f(fmt)
    """,
    "streaming_approx_reach": """
        SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS w_start_s,
               event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS within_bound
        FROM events GROUP BY 1, 2
    """,
    "streaming_sink_inventory": """
        SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_records
        FROM events CROSS JOIN (VALUES ('DELTA'), ('ICEBERG'), ('HUDI')) f(fmt)
        GROUP BY fmt
    """,
    # the staged CDC lifecycle is deterministic: v1 add f1, v2 add f2
    # (both region copies, so the stats-plane record counts equal the
    # region row count), v3 remove f1 (no stats on removes)
    "streaming_cdc_feed": """
        SELECT CAST(1 AS BIGINT) AS version, 'add' AS change,
               'f1.parquet' AS file_name, CAST(COUNT(*) AS BIGINT) AS record_count
        FROM region
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'add', 'f2.parquet', CAST(COUNT(*) AS BIGINT)
        FROM region
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'remove', 'f1.parquet', CAST(NULL AS BIGINT)
    """,
    # staged lifecycle: f1 then f2 (region copies) — the feed surfaces
    # exactly those adds in commit order with stats-plane record counts
    "streaming_cdc_hudi": """
        SELECT CAST(s AS INT) AS commit_seq, 'add' AS change,
               'f' || s || '.parquet' AS file_name,
               CAST((SELECT COUNT(*) FROM region) AS BIGINT) AS record_count
        FROM (VALUES (1), (2)) t(s)
    """,
    # deterministic lifecycle: drain1 FULL-bootstraps after 2 marker files
    # (v0 init + v1 add f1 — the trigger watches RAW commit markers so
    # metadata-only commits count too), drain2 INCREMENTAL after 1 (v2 add
    # f2); final inventory = 2 region copies
    "sync_continuous": """
        SELECT d.drain, f.fmt, 'SUCCESS' AS status, d.sync_mode,
               CAST(d.n_commits AS BIGINT) AS n_commits,
               CAST(2 AS BIGINT) AS n_files,
               CAST(2 * (SELECT COUNT(*) FROM region) AS BIGINT) AS n_records
        FROM (VALUES (1, 'FULL', 2), (2, 'INCREMENTAL', 1)) d(drain, sync_mode, n_commits)
        CROSS JOIN (VALUES ('ICEBERG'), ('HUDI')) f(fmt)
    """,
    "token_calibration": """
        WITH s AS (
            SELECT source,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sx,
                   CAST(SUM(CAST(len(string_split(text, ' ')) AS HUGEINT)) AS HUGEINT) AS sy,
                   CAST(SUM(CAST(n_chars AS HUGEINT) * len(string_split(text, ' '))) AS HUGEINT) AS sxy,
                   CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS sxx,
                   CAST(SUM(CAST(len(string_split(text, ' ')) AS HUGEINT) * len(string_split(text, ' '))) AS HUGEINT) AS syy
            FROM documents GROUP BY source)
        SELECT source, CAST(n AS BIGINT) AS n_docs,
               CAST(ROUND(CAST(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
                    AS DECIMAL(18,10)), 6) AS DOUBLE) AS slope,
               CAST(ROUND(CAST(CAST(sy*sxx - sx*sxy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
                    AS DECIMAL(18,10)), 6) AS DOUBLE) AS intercept,
               CAST(ROUND(CAST(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
                    / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
                    AS DECIMAL(18,10)), 6) AS DOUBLE) AS r2
        FROM s
    """,
    # ORDER BY is part of the contract (top-50 with deterministic ties) —
    # the driver compare is order-insensitive but the LIMIT depends on it
    "bpe_pair_counts": """
        WITH w AS (
            SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
            WHERE t <> '' GROUP BY t),
        c AS (SELECT freq, string_split(word, '') AS cs FROM w),
        p AS (
            SELECT freq, unnest(list_zip(cs[1:len(cs)-1], cs[2:len(cs)])) AS z
            FROM c WHERE len(cs) >= 2)
        SELECT z[1] AS a, z[2] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM p GROUP BY z[1], z[2]
        ORDER BY cnt DESC, a, b LIMIT 50
    """,
    "compaction_bins": """
        WITH f AS (
            SELECT source, doc_id, n_chars FROM documents WHERE n_chars < 32768),
        b AS (
            SELECT source, doc_id, n_chars,
                   CAST(FLOOR(COALESCE(SUM(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     / CAST(32768 AS DOUBLE)) AS BIGINT) AS bin_id
            FROM f)
        SELECT source, bin_id, CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
               MIN(doc_id) AS first_file, MAX(doc_id) AS last_file
        FROM b GROUP BY source, bin_id HAVING COUNT(*) >= 2
    """,
    "sync_changes": """
        SELECT fmt, 'add' AS change, 'f2.parquet' AS file_name,
               CAST(COUNT(*) AS BIGINT) AS record_count
        FROM region CROSS JOIN (VALUES ('DELTA'), ('ICEBERG'), ('HUDI')) f(fmt)
        GROUP BY fmt
    """,
    "sync_time_travel": """
        SELECT fmt, as_of, file_name, CAST(COUNT(*) AS BIGINT) AS record_count
        FROM region CROSS JOIN (VALUES
            ('DELTA', 'first', 'f1.parquet'),
            ('DELTA', 'latest', 'f1.parquet'),
            ('DELTA', 'latest', 'f2.parquet'),
            ('ICEBERG', 'first', 'f1.parquet'),
            ('ICEBERG', 'latest', 'f1.parquet'),
            ('ICEBERG', 'latest', 'f2.parquet'),
            ('HUDI', 'first', 'f1.parquet'),
            ('HUDI', 'latest', 'f1.parquet'),
            ('HUDI', 'latest', 'f2.parquet')
        ) t(fmt, as_of, file_name)
        GROUP BY fmt, as_of, file_name
    """,
    "sync_schema_evolution": """
        WITH rc AS (SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_table_rows FROM region)
        SELECT fmt, ordinal, col_name, col_type, n_table_rows
        FROM (VALUES ('DELTA'), ('ICEBERG'), ('HUDI')) f(fmt)
        CROSS JOIN (VALUES
            (0, 'r_regionkey', 'int'),
            (1, 'r_name', 'string'),
            (2, 'r_extra', 'bigint')
        ) c(ordinal, col_name, col_type)
        CROSS JOIN rc
    """,
    "stateful_running_totals": """
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY user_id
    """,
    "streaming_dedup": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    "streaming_join": """
        SELECT a.event_id AS purchase_id, b.event_id AS click_id
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'purchase' AND b.event_type = 'click'
         AND b.ts BETWEEN a.ts - INTERVAL 4 HOUR AND a.ts
    """,
    "winnow_fingerprint": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ), g AS (
            SELECT doc_id, i,
                   md5(concat_ws(' ', tk[i], tk[i+1], tk[i+2])) AS gh,
                   len(tk) - 2 AS n_grams
            FROM t, LATERAL unnest(generate_series(1, len(tk) - 2)) AS u(i)
            WHERE len(tk) >= 6
        ), w AS (
            SELECT doc_id, i, n_grams,
                   min(gh) OVER (PARTITION BY doc_id ORDER BY i
                                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM g
        )
        SELECT doc_id,
               CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fp,
               MIN(fp) AS fp_min,
               MAX(fp) AS fp_max
        FROM w WHERE i <= n_grams - 3
        GROUP BY doc_id
    """,
    "winnow_near_dups": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ), g AS (
            SELECT doc_id, i,
                   md5(concat_ws(' ', tk[i], tk[i+1], tk[i+2])) AS gh,
                   len(tk) - 2 AS n_grams
            FROM t, LATERAL unnest(generate_series(1, len(tk) - 2)) AS u(i)
            WHERE len(tk) >= 6
        ), w AS (
            SELECT doc_id, i, n_grams,
                   min(gh) OVER (PARTITION BY doc_id ORDER BY i
                                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM g
        ), fps AS (
            SELECT DISTINCT doc_id, fp FROM w WHERE i <= n_grams - 3
        ), kept AS (
            SELECT doc_id, fp FROM fps
            QUALIFY COUNT(*) OVER (PARTITION BY fp) <= 64
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS shared_fp
        FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= 3
    """,
    "gap_fill": """
        WITH span AS (
            SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
        ), days AS (
            SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 day)) AS DATE) AS day FROM span
        ), types AS (
            SELECT DISTINCT event_type FROM events
        ), counts AS (
            SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT CAST(d.day AS VARCHAR) AS day, t.event_type,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
        FROM days d CROSS JOIN types t
        LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
    """,
    "moving_avg": """
        WITH span AS (
            SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
        ), days AS (
            SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 day)) AS DATE) AS day FROM span
        ), types AS (
            SELECT DISTINCT event_type FROM events
        ), counts AS (
            SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ), daily AS (
            SELECT CAST(d.day AS VARCHAR) AS day, t.event_type,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
            FROM days d CROSS JOIN types t
            LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
        )
        SELECT day, event_type, n_events,
               ROUND(AVG(n_events) OVER (PARTITION BY event_type ORDER BY day
                                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg_7d
        FROM daily
    """,
    "repetition_filter": """
        WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), bg AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
            FROM tk WHERE len(t) >= 2
        ), topbg AS (
            SELECT doc_id, MAX(c) AS max_bg
            FROM (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2)
            GROUP BY 1
        )
        SELECT k.doc_id,
               CAST(len(k.t) AS BIGINT) AS n_tokens,
               ROUND(1.0 - len(list_distinct(k.t)) / CAST(len(k.t) AS DOUBLE), 4) AS dup_token_frac,
               ROUND(CASE WHEN len(k.t) >= 2
                          THEN COALESCE(b.max_bg, 0) / CAST(len(k.t) - 1 AS DOUBLE)
                          ELSE 0.0 END, 4) AS top_bigram_frac,
               (ROUND(CASE WHEN len(k.t) >= 2
                           THEN COALESCE(b.max_bg, 0) / CAST(len(k.t) - 1 AS DOUBLE)
                           ELSE 0.0 END, 4) <= 0.18) AS kept
        FROM tk k LEFT JOIN topbg b USING (doc_id)
    """,
    "event_transitions": """
        WITH seq AS (
            SELECT user_id, event_type AS next_type,
                   LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
            FROM events
        ), pairs AS (
            SELECT prev_type, next_type, COUNT(*) AS n_trans
            FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT prev_type, next_type, CAST(n_trans AS BIGINT) AS n_trans,
               ROUND(n_trans / CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS DOUBLE), 4) AS p_next
        FROM pairs
    """,
    "approx_distinct": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS within_5pct
        FROM events GROUP BY 1
    """,
    "approx_quantiles": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 4) AS p50,
               ROUND(quantile_cont(value, 0.95), 4) AS p95,
               ROUND(quantile_cont(value, 0.99), 4) AS p99,
               TRUE AS rank_within_1pct
        FROM events GROUP BY 1
    """,
    "tfidf_top_terms": """
        WITH tf AS (
            SELECT doc_id, term, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
            GROUP BY 1, 2
        ), dl AS (
            SELECT doc_id, SUM(c) AS n_tok FROM tf GROUP BY 1
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), n AS (
            SELECT COUNT(*) AS n_docs FROM documents
        ), scored AS (
            SELECT tf.doc_id, tf.term,
                   ROUND((tf.c / CAST(dl.n_tok AS DOUBLE))
                         * ln(n.n_docs / CAST(dfreq.df AS DOUBLE)), 4) AS tfidf
            FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN n
        ), ranked AS (
            SELECT doc_id, term, tfidf,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, term ASC) AS rk
            FROM scored
        )
        SELECT doc_id, term, tfidf, CAST(rk AS INT) AS rk
        FROM ranked WHERE rk <= 3
    """,
    "source_mixture": """
        WITH per_source AS (
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY 1
        ), shared AS (
            SELECT source, n_docs, n_tokens,
                   n_tokens / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS share_raw
            FROM per_source
        )
        SELECT source, n_docs, n_tokens,
               ROUND(share_raw, 4) AS share,
               ROUND(pow(share_raw, 0.7) / SUM(pow(share_raw, 0.7)) OVER (), 4) AS weight_a07
        FROM shared
    """,
    "unigram_logprob": """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        ), vocab AS (
            SELECT term, COUNT(*) AS c FROM toks GROUP BY 1
        ), lm AS (
            SELECT term, ln(c / CAST((SELECT SUM(c) FROM vocab) AS DOUBLE)) AS logp
            FROM vocab
        )
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(AVG(l.logp), 4) AS avg_logprob
        FROM toks t JOIN lm l USING (term)
        GROUP BY 1
    """,
    "zorder_layout": """
        WITH z AS (
            SELECT event_id, user_id,
                   (user_id & 255) AS x, (event_id & 255) AS y
            FROM events
        )
        SELECT event_id, user_id, CAST(
               (((x >> 0) & 1) << 0)  + (((y >> 0) & 1) << 1)  +
               (((x >> 1) & 1) << 2)  + (((y >> 1) & 1) << 3)  +
               (((x >> 2) & 1) << 4)  + (((y >> 2) & 1) << 5)  +
               (((x >> 3) & 1) << 6)  + (((y >> 3) & 1) << 7)  +
               (((x >> 4) & 1) << 8)  + (((y >> 4) & 1) << 9)  +
               (((x >> 5) & 1) << 10) + (((y >> 5) & 1) << 11) +
               (((x >> 6) & 1) << 12) + (((y >> 6) & 1) << 13) +
               (((x >> 7) & 1) << 14) + (((y >> 7) & 1) << 15)
               AS BIGINT) AS zval
        FROM z
        ORDER BY zval ASC, event_id ASC
        LIMIT 100
    """,
    "heavy_hitters": """
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY n_occurrences DESC, token ASC
        LIMIT 20
    """,
    "bm25_search": """
        WITH base AS (
            SELECT doc_id, len(string_split(text, ' ')) AS dl,
                   len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS tf_spark,
                   len(list_filter(string_split(text, ' '), x -> x = 'table')) AS tf_table,
                   len(list_filter(string_split(text, ' '), x -> x = 'hash'))  AS tf_hash
            FROM documents
        ), stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl,
                   CAST(SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_spark,
                   CAST(SUM(CASE WHEN tf_table > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_table,
                   CAST(SUM(CASE WHEN tf_hash  > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_hash
            FROM base
        )
        SELECT doc_id, ROUND(
              ln(1.0 + (n_docs - df_spark + 0.5) / (df_spark + 0.5))
                * CAST(tf_spark AS DOUBLE) * 2.2
                / (CAST(tf_spark AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))
            + ln(1.0 + (n_docs - df_table + 0.5) / (df_table + 0.5))
                * CAST(tf_table AS DOUBLE) * 2.2
                / (CAST(tf_table AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))
            + ln(1.0 + (n_docs - df_hash + 0.5) / (df_hash + 0.5))
                * CAST(tf_hash AS DOUBLE) * 2.2
                / (CAST(tf_hash AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS bm25
        FROM base, stats
        ORDER BY bm25 DESC, doc_id ASC LIMIT 20
    """,
    "incremental_dedup": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ), grams AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, len(tk) - 1),
                       i -> md5(array_to_string(tk[i:i+2], ' '))))) AS gh
            FROM t WHERE len(tk) >= 3
        ), sz AS (
            SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
        ), ov AS (
            SELECT b.doc_id AS new_id, c.doc_id AS dup_of, COUNT(*) AS ov
            FROM (SELECT * FROM grams WHERE doc_id % 10 = 0) b
            JOIN (SELECT * FROM grams WHERE doc_id % 10 <> 0) c USING (gh)
            GROUP BY 1, 2
        )
        SELECT new_id, dup_of,
               ROUND(ov / CAST(sn.sz + se.sz - ov AS DOUBLE), 4) AS jaccard
        FROM ov JOIN sz sn ON ov.new_id = sn.doc_id
                JOIN sz se ON ov.dup_of = se.doc_id
        WHERE ROUND(ov / CAST(sn.sz + se.sz - ov AS DOUBLE), 4) >= 0.4
    """,
    "knn_label_vote": f"""
        WITH pairs AS (
            SELECT a.vec_id AS vid, a.label AS tl, b.vec_id AS nid, b.label AS nl,
                   ROUND({_COS_SQL}, 4) AS cs
            FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        ), topk AS (
            SELECT vid, tl, nl FROM (
                SELECT vid, tl, nl,
                       row_number() OVER (PARTITION BY vid ORDER BY cs DESC, nid ASC) AS rn
                FROM pairs) WHERE rn <= 5
        ), votes AS (
            SELECT vid, tl, nl, COUNT(*) AS nv FROM topk GROUP BY vid, tl, nl
        )
        SELECT vid AS vec_id, CAST(tl AS INT) AS true_label,
               CAST(nl AS INT) AS pred_label, CAST(nv AS BIGINT) AS n_votes
        FROM (SELECT *, row_number() OVER (PARTITION BY vid ORDER BY nv DESC, nl ASC) AS rn2
              FROM votes)
        WHERE rn2 = 1
    """,
    "centroid_similarity": """
        WITH dims AS (
            SELECT CAST(label AS INT) AS lbl, vec_id,
                   CAST(unnest(embedding) AS DOUBLE) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ), cent AS (
            SELECT lbl, pos, AVG(val) AS cval FROM dims GROUP BY lbl, pos
        ), percos AS (
            SELECT d.lbl, d.vec_id,
                   SUM(d.val * c.cval)
                   / (sqrt(SUM(d.val * d.val)) * sqrt(SUM(c.cval * c.cval))) AS cs
            FROM dims d JOIN cent c ON d.lbl = c.lbl AND d.pos = c.pos
            GROUP BY d.lbl, d.vec_id
        )
        SELECT lbl AS label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
               ROUND(AVG(cs), 4) AS avg_cos, ROUND(MIN(cs), 4) AS min_cos
        FROM percos GROUP BY lbl
    """,
    "decontam_overlap": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ), grams AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, len(tk) - 1),
                       i -> md5(array_to_string(tk[i:i+2], ' '))))) AS gh
            FROM t WHERE len(tk) >= 3
        ), bench AS (
            SELECT DISTINCT gh FROM grams WHERE doc_id % 97 = 0
        ), train AS (
            SELECT doc_id, gh FROM grams WHERE doc_id % 97 <> 0
        ), tot AS (
            SELECT doc_id, COUNT(*) AS n_grams FROM train GROUP BY doc_id
        ), hit AS (
            SELECT t.doc_id, COUNT(*) AS n_contaminated
            FROM train t JOIN bench b USING (gh) GROUP BY t.doc_id
        )
        SELECT h.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
               CAST(h.n_contaminated AS BIGINT) AS n_contaminated,
               ROUND(h.n_contaminated / CAST(t.n_grams AS DOUBLE), 4) AS contaminated_ratio
        FROM hit h JOIN tot t USING (doc_id)
    """,
    "stratified_sample": """
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 1000
                              < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 300
                                          WHEN 'fr' THEN 550 WHEN 'es' THEN 800
                                          ELSE 50 END
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM documents GROUP BY lang, source
    """,
    "chunk_dedup": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ), chunks AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(0, CAST(ceil(len(tk) / 16.0) AS INT)),
                       i -> md5(array_to_string(tk[(i*16+1):(i*16+16)], ' ')))) AS ch
            FROM t
        ), occ AS (
            SELECT doc_id, ch, COUNT(*) OVER (PARTITION BY ch) AS n_occ FROM chunks
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
               ROUND(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 4) AS dup_ratio
        FROM occ GROUP BY doc_id
    """,
    "substring_dedup": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ), w AS (
            SELECT doc_id,
                   unnest(list_transform(range(0, len(tk) - 7),
                       i -> struct_pack(pos := i,
                                        wh := md5(array_to_string(tk[(i+1):(i+8)], ' '))))) AS s
            FROM t WHERE len(tk) >= 8
        ), wh AS (
            SELECT doc_id, s.pos AS pos, s.wh AS wh FROM w
        ), df AS (
            SELECT wh, COUNT(DISTINCT doc_id) AS ndocs FROM wh GROUP BY 1
        ), keep AS (
            SELECT w.* FROM wh w JOIN df USING (wh) WHERE ndocs <= 20
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa, a.pos - b.pos AS diag
            FROM keep a JOIN keep b ON a.wh = b.wh AND a.doc_id < b.doc_id
        ), isl AS (
            SELECT id_a, id_b, diag, pa,
                   pa - row_number() OVER (PARTITION BY id_a, id_b, diag ORDER BY pa) AS grp
            FROM pairs
        ), runs AS (
            SELECT id_a, id_b, diag, grp, COUNT(*) AS run FROM isl GROUP BY 1, 2, 3, 4
        )
        SELECT id_a, id_b,
               CAST(MAX(run) + 7 AS BIGINT) AS max_span,
               CAST(SUM(run) AS BIGINT) AS n_windows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM wh)
                 - (SELECT CAST(COUNT(*) AS BIGINT) FROM keep)
                 AS windows_dropped_by_df_cap
        FROM runs GROUP BY 1, 2
        HAVING MAX(run) + 7 >= 20
    """,
    "funnel_steps": """
        WITH per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT CAST(COUNT(t_view) AS BIGINT) AS n_view_users,
               CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_view,
               CAST(SUM(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        FROM per_user
    """,
    "cohort_retention": """
        WITH first AS (
            SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
        )
        SELECT CAST(CAST(f.first_ts AS DATE) AS VARCHAR) AS cohort_date,
               CAST(date_diff('day', CAST(f.first_ts AS DATE), CAST(e.ts AS DATE)) AS INT) AS day_offset,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM events e JOIN first f USING (user_id)
        GROUP BY 1, 2
    """,
    "streaming_hopping": """
        SELECT CAST(epoch(ws) AS BIGINT) AS w_start_s, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM (SELECT event_type,
                     unnest([time_bucket(INTERVAL '30 minutes', ts),
                             time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
              FROM events)
        GROUP BY 1, 2
    """,
    "streaming_sessionize": """
        SELECT user_id,
               CAST(floor(epoch(MIN(ts))) AS BIGINT) AS sess_start_s,
               CAST(floor(epoch(MAX(ts))) AS BIGINT) + 1800 AS sess_end_s,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS session_value
        FROM (
            SELECT user_id, ts, value,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
            FROM (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                                 OR date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800000000
                            THEN 1 ELSE 0 END AS new_sess
                FROM events))
        GROUP BY user_id, sess_id
    """,
    # --- round-6 additions ---
    "pii_redaction": r"""
        WITH seeded AS (
            SELECT lang,
                   text
                   || CASE WHEN doc_id % 7 = 0
                           THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                           ELSE '' END
                   || CASE WHEN doc_id % 11 = 0
                           THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 logged'
                           ELSE '' END AS s
            FROM documents
        ), st AS (
            SELECT lang,
                   len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_em,
                   len(regexp_extract_all(s, '\d+\.\d+\.\d+\.\d+')) AS n_ip,
                   length(s) - length(
                       regexp_replace(
                           regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                           '\d+\.\d+\.\d+\.\d+', '<IP>', 'g')) AS chars_delta
            FROM seeded
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_em + n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
               CAST(SUM(n_em) AS BIGINT) AS n_emails,
               CAST(SUM(n_ip) AS BIGINT) AS n_ips,
               CAST(SUM(chars_delta) AS BIGINT) AS chars_delta
        FROM st GROUP BY lang
    """,
    "contamination_span": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ), g AS (
            SELECT doc_id, unnest(range(1, len(tk) - 1)) AS i, tk
            FROM t WHERE len(tk) >= 3
        ), grams AS (
            SELECT doc_id, i - 1 AS pos, md5(array_to_string(tk[i:i+2], ' ')) AS gh FROM g
        ), bench AS (
            SELECT DISTINCT gh FROM grams WHERE doc_id % 97 = 0
        ), hits AS (
            SELECT g.doc_id, g.pos FROM grams g JOIN bench b USING (gh)
            WHERE g.doc_id % 97 <> 0
        ), runs AS (
            SELECT doc_id, pos,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM hits
        ), spans AS (
            SELECT doc_id, grp, COUNT(*) AS span FROM runs GROUP BY 1, 2
        )
        SELECT doc_id, CAST(SUM(span) AS BIGINT) AS n_hits,
               CAST(MAX(span) AS BIGINT) AS max_span,
               (MAX(span) >= 5) AS flagged
        FROM spans GROUP BY doc_id
    """,
    "cluster_representatives": """
        WITH RECURSIVE sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(t) - 1),
                                 i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        ),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.4
        ),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        reach(n, m) AS (
            SELECT a, a FROM edges
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
        ),
        comp AS (SELECT n, MIN(m) AS component FROM reach GROUP BY n),
        mem AS (
            SELECT c.component, c.n AS doc_id, d.n_chars
            FROM comp c JOIN documents d ON d.doc_id = c.n
        ),
        rk AS (
            SELECT component, doc_id, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY component
                                      ORDER BY n_chars DESC, doc_id ASC) AS r
            FROM mem
        ),
        g AS (
            SELECT component, COUNT(*) AS n_members, SUM(n_chars) AS total_chars
            FROM mem GROUP BY 1
        )
        SELECT g.component AS cluster_id,
               CAST(rk.doc_id AS BIGINT) AS rep_doc,
               CAST(rk.n_chars AS BIGINT) AS rep_chars,
               CAST(g.n_members AS BIGINT) AS n_members,
               CAST(g.total_chars - rk.n_chars AS BIGINT) AS chars_saved
        FROM g JOIN rk ON rk.component = g.component AND rk.r = 1
    """,
    "perplexity_buckets": """
        WITH toks AS (
            SELECT doc_id, source, unnest(string_split(text, ' ')) AS term FROM documents
        ), vocab AS (
            SELECT term, COUNT(*) AS c FROM toks GROUP BY 1
        ), lm AS (
            SELECT term, ln(c / CAST((SELECT SUM(c) FROM vocab) AS DOUBLE)) AS logp
            FROM vocab
        ), d AS (
            SELECT t.doc_id, t.source, COUNT(*) AS n_tokens,
                   SUM(CAST(ROUND(l.logp * 1e6) AS BIGINT)) AS s_micro
            FROM toks t JOIN lm l USING (term) GROUP BY 1, 2
        ), d2 AS (
            SELECT source, n_tokens,
                   CAST(ROUND(CAST(s_micro AS DOUBLE) / n_tokens) AS BIGINT) AS lp_micro
            FROM d
        ), b AS (
            SELECT source,
                   CASE WHEN lp_micro >= -3400000 THEN 'head'
                        WHEN lp_micro >= -3410000 THEN 'middle'
                        ELSE 'tail' END AS bucket,
                   n_tokens, lp_micro
            FROM d2
        )
        SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               ROUND(CAST(SUM(lp_micro) AS DOUBLE) / COUNT(*) / 1e6, 4) AS avg_lp
        FROM b GROUP BY 1, 2
    """,
    # r7: the recovery lifecycle's observable facts are fully determined —
    # initial FULL bootstrap, corruption clears the watermark, recovery
    # re-syncs FULL, and the recovered table reads back exactly the source
    "sync_recovery": """
        SELECT 'FULL' AS initial_mode, 'FULL' AS recovered_mode,
               TRUE AS watermark_cleared, CAST(1 AS BIGINT) AS n_files,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM region) AS n_records
    """,
    # r7: the safety-fallback lifecycle's observable facts are fully
    # determined — cleanup strands the watermark, the probe reports
    # unsafe, the fallback FULL-recovers to an exact 4-file read-back
    "sync_safety_fallback": """
        SELECT 'FULL' AS initial_mode, FALSE AS safe_after_cleanup,
               'FULL' AS fallback_mode, CAST(4 AS BIGINT) AS n_files,
               (SELECT CAST(4 * COUNT(*) AS BIGINT) FROM region) AS n_records
    """,
    # r7: the catch-up lifecycle's observable facts are fully determined —
    # the stale Iceberg target replays incrementally, the late-added Hudi
    # target FULL-bootstraps, both converge to the same 3-file head
    "sync_catchup": """
        SELECT f.fmt, f.catchup_mode, CAST(3 AS BIGINT) AS n_files,
               (SELECT CAST(3 * COUNT(*) AS BIGINT) FROM region) AS n_records,
               TRUE AS watermarks_converged
        FROM (VALUES ('HUDI', 'FULL'), ('ICEBERG', 'INCREMENTAL')) f(fmt, catchup_mode)
    """,
    # r7: the spec-evolution lifecycle's observable facts are fully
    # determined — Iceberg appends an immutable spec, Delta replays the
    # generated partition column, Hudi's pinned config rejects the change
    "sync_partition_evolution": """
        SELECT * FROM (VALUES
            ('delta_descriptor', 'o_orderdate:MONTH'),
            ('delta_partition_columns', 'order_month'),
            ('hudi_spec_change_rejected', 'true'),
            ('iceberg_default_spec', '1'),
            ('iceberg_descriptor', 'o_orderdate:MONTH'),
            ('iceberg_field_id_monotonic', 'true'),
            ('iceberg_n_specs', '2'),
            ('iceberg_spec0_fields', 'o_orderpriority'),
            ('iceberg_spec1_fields', 'order_month'),
            ('iceberg_spec1_transform', 'month')
        ) t(item, value)
    """,
    # r13: region is ALWAYS 5 rows (r_regionkey 0-4) and murmur3 bucket
    # assignment is a spec-pinned pure function (Appendix-B vectors in
    # tests/test_bucket_transform.py), so the bucket ids are constants
    # the oracle states outright: {0:0, 1:0, 2:0, 3:3, 4:2} → dirs 0,2,3.
    # n_records stays data-derived so a row-loss in the sync still fails.
    "sync_bucket_spec": """
        SELECT * FROM (VALUES
            ('bucket_assignment_ok', 'true'),
            ('bucket_dirs', '0,2,3'),
            ('cross_format_counts_ok', 'true'),
            ('delta_partition_columns', 'rk_bucket'),
            ('hudi_partition_fields', 'rk_bucket'),
            ('iceberg_descriptor', 'r_regionkey:BUCKET[4]'),
            ('iceberg_spec_transform', 'bucket[4]'),
            ('n_records', CAST((SELECT COUNT(*) FROM region) AS VARCHAR)),
            ('truncate_descriptor', 'r_name:TRUNCATE[2]'),
            ('truncate_spec_transform', 'truncate[2]'),
            -- truncate[2] partition dirs ARE the 2-char name prefixes —
            -- derived from the data, not hardcoded
            ('truncate_dirs', (SELECT string_agg(p, ',' ORDER BY p) FROM
                (SELECT DISTINCT substr(r_name, 1, 2) AS p FROM region)))
        ) t(item, value)
    """,
    # r14: decimal buckets are spec constants for region's 5 derived
    # prices {0.25:3, 1.25:2, 2.25:1, 3.25:3, 4.25:0} → dirs 0,1,2,3
    # (unscaled big-endian bytes → murmur3, vectors pinned in tests)
    "sync_bucket_decimal": """
        SELECT * FROM (VALUES
            ('bucket_assignment_ok', 'true'),
            ('bucket_dirs', '0,1,2,3'),
            ('cross_format_counts_ok', 'true'),
            ('delta_partition_columns', 'price_bucket'),
            ('hudi_partition_fields', 'price_bucket'),
            ('iceberg_descriptor', 'r_price:BUCKET[4]'),
            ('iceberg_spec_transform', 'bucket[4]'),
            ('n_records', CAST((SELECT COUNT(*) FROM region) AS VARCHAR))
        ) t(item, value)
    """,
    # r13: ops are a pure function of region — 'i' x5 seed + the upsert's
    # 'u' after-images ('X_' || r_name on keys 0-1) + one new-key 'i';
    # the COMPACT instant contributes nothing
    "hudi_changelog": """
        SELECT * FROM (
            SELECT 'i' AS op, CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
            FROM region
            UNION ALL
            SELECT 'u', CAST(r_regionkey AS BIGINT), 'X_' || r_name
            FROM region WHERE r_regionkey <= 1
            UNION ALL
            SELECT 'i', 92, 'NEWLAND'
        ) ORDER BY op, r_regionkey, r_name
    """,
    # r14: identifier-paired Hudi changelog over a replacecommit keyed
    # rewrite — every replaced-group key pairs (carried-over keys 2-4 with
    # identical values, computeUpdates parity); new key 93 stays 'i'
    "hudi_changelog_updates": """
        SELECT * FROM (
            SELECT 'i' AS op, 0 AS ordinal,
                   CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
            FROM region
            UNION ALL
            SELECT 'update_preimage', 1, CAST(r_regionkey AS BIGINT), r_name
            FROM region
            UNION ALL
            SELECT 'update_postimage', 1, CAST(r_regionkey AS BIGINT),
                   CASE WHEN r_regionkey <= 1 THEN 'X_' || r_name
                        ELSE r_name END
            FROM region
            UNION ALL
            SELECT 'i', 1, 93, 'NEWLAND'
        ) ORDER BY ordinal, op, r_regionkey, r_name
    """,
    # r14: the supplemental cdc log's exact before-images — 'u' rows carry
    # both images; 'i' rows (BASE_FILE_INSERT inference) after-only
    "hudi_cdc_feed": """
        SELECT * FROM (
            SELECT 'i' AS op, CAST(r_regionkey AS BIGINT) AS r_regionkey,
                   CAST(NULL AS VARCHAR) AS before_name,
                   r_name AS after_name, TRUE AS ts_ok
            FROM region
            UNION ALL
            SELECT 'u', CAST(r_regionkey AS BIGINT), r_name,
                   'X_' || r_name, TRUE
            FROM region WHERE r_regionkey <= 1
            UNION ALL
            SELECT 'i', 91, NULL, 'NEWLAND', TRUE
        ) ORDER BY op, r_regionkey
    """,
    # r14: identifier-paired mode — the upsert's same-key delete+insert
    # pairs become update_preimage/update_postimage; key 91 stays insert
    "iceberg_changelog_updates": """
        SELECT * FROM (
            SELECT 'insert' AS change_type, CAST(0 AS INTEGER) AS ordinal,
                   CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
            FROM region
            UNION ALL
            SELECT 'update_preimage', 1, CAST(r_regionkey AS BIGINT), r_name
            FROM region WHERE r_regionkey <= 1
            UNION ALL
            SELECT 'update_postimage', 1, CAST(r_regionkey AS BIGINT),
                   'X_' || r_name
            FROM region WHERE r_regionkey <= 1
            UNION ALL
            SELECT 'insert', 1, 91, 'NEWLAND'
        ) ORDER BY ordinal, change_type, r_regionkey
    """,
    # r14: net mode — the upsert-killed seed rows cancel against their
    # ordinal-0 inserts; what survives is exactly the final state
    "iceberg_changelog_net": """
        SELECT * FROM (
            SELECT 'insert' AS change_type, CAST(0 AS INTEGER) AS ordinal,
                   CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
            FROM region WHERE r_regionkey >= 2
            UNION ALL
            SELECT 'insert', 1, CAST(r_regionkey AS BIGINT), 'X_' || r_name
            FROM region WHERE r_regionkey <= 1
            UNION ALL
            SELECT 'insert', 1, 91, 'NEWLAND'
        ) ORDER BY ordinal, change_type, r_regionkey
    """,
    # r13: the changelog is a pure function of region — ordinal 0 replays
    # it verbatim as inserts; ordinal 1 is the upsert's delete+insert
    # pairs; the REPLACE compaction snapshot contributes nothing
    "iceberg_changelog": """
        SELECT * FROM (
            SELECT 'insert' AS change_type, CAST(0 AS INTEGER) AS ordinal,
                   CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
            FROM region
            UNION ALL
            SELECT 'delete', 1, CAST(r_regionkey AS BIGINT), r_name
            FROM region WHERE r_regionkey <= 1
            UNION ALL
            SELECT 'insert', 1, CAST(r_regionkey AS BIGINT), 'X_' || r_name
            FROM region WHERE r_regionkey <= 1
            UNION ALL
            SELECT 'insert', 1, 91, 'NEWLAND'
        ) ORDER BY ordinal, change_type, r_regionkey
    """,
    # r13 (extended r14): the streamed feed is now the FULL row-level
    # history — the v1 seed's derived inserts (region verbatim) and the
    # v3 plain append's derived inserts ('APP_' rows) union with the v2
    # upsert's cdc rows; before r14 only the cdc rows streamed and every
    # appended row silently vanished from the feed
    # r14: Hudi row stream — seed 'i', upsert log block 'u' + new-key
    # 'i', compaction invisible
    "streaming_hudi_rows": """
        SELECT * FROM (
            SELECT 'i' AS op, CAST(r_regionkey AS BIGINT) AS r_regionkey,
                   r_name, CAST(1 AS BIGINT) AS n
            FROM region
            UNION ALL
            SELECT 'u', CAST(r_regionkey AS BIGINT), 'X_' || r_name, 1
            FROM region WHERE r_regionkey <= 1
            UNION ALL
            SELECT 'i', 92, 'NEWLAND', 1
        ) ORDER BY op, r_regionkey, r_name
    """,
    # r15: streamed replacecommit — the replaced group's prior rows as
    # 'd' (ordinal 1), the rewrite's rows as 'i', the seed as 'i' at
    # ordinal 0
    "streaming_hudi_replace": """
        SELECT * FROM (
            SELECT 'i' AS op, 0 AS ordinal,
                   CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
            FROM region
            UNION ALL
            SELECT 'd', 1, CAST(r_regionkey AS BIGINT), r_name
            FROM region
            UNION ALL
            SELECT 'i', 1, CAST(r_regionkey AS BIGINT),
                   CASE WHEN r_regionkey <= 1 THEN 'X_' || r_name
                        ELSE r_name END
            FROM region
            UNION ALL
            SELECT 'i', 1, 93, 'NEWLAND'
        ) ORDER BY ordinal, op, r_regionkey, r_name
    """,
    # r14: append-only Iceberg streaming — the two appends' rows, the
    # overwrite skipped, the replace invisible
    "streaming_iceberg_appends": """
        SELECT * FROM (
            SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name,
                   CAST(1 AS BIGINT) AS n
            FROM region
            UNION ALL
            SELECT CAST(r_regionkey AS BIGINT) + 500, 'S_' || r_name, 1
            FROM region
        ) ORDER BY r_regionkey, r_name
    """,
    "streaming_cdf": """
        SELECT * FROM (
            SELECT 'insert' AS change_type,
                   CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name,
                   CAST(1 AS BIGINT) AS n
            FROM region
            UNION ALL
            SELECT 'update_preimage', CAST(r_regionkey AS BIGINT), r_name, 1
            FROM region WHERE r_regionkey <= 1
            UNION ALL
            SELECT 'update_postimage', CAST(r_regionkey AS BIGINT),
                   'X_' || r_name, 1
            FROM region WHERE r_regionkey <= 1
            UNION ALL
            SELECT 'insert', 90, 'NEWLAND', 1
            UNION ALL
            SELECT 'insert', CAST(r_regionkey AS BIGINT) + 200,
                   'APP_' || r_name, 1
            FROM region WHERE r_regionkey >= 3
            UNION ALL
            -- r14: the v4 mixed overwrite's derived delete + insert legs
            SELECT 'delete', CAST(r_regionkey AS BIGINT) + 200,
                   'APP_' || r_name, 1
            FROM region WHERE r_regionkey >= 3
            UNION ALL
            SELECT 'insert', CAST(r_regionkey AS BIGINT) + 300,
                   'OVR_' || r_name, 1
            FROM region WHERE r_regionkey >= 3
        ) ORDER BY change_type, r_regionkey
    """,
    # r13: every CDF row is a pure function of the region table — the v1
    # insert fallback replays region verbatim; the v2 upsert's postimages
    # are 'X_' || r_name on keys 0-1 and one literal new key
    "delta_cdf": """
        SELECT * FROM (
            SELECT 'insert' AS change_type, CAST(1 AS BIGINT) AS commit_version,
                   CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name,
                   TRUE AS feature_ok
            FROM region
            UNION ALL
            SELECT 'update_preimage', 2, CAST(r_regionkey AS BIGINT), r_name, TRUE
            FROM region WHERE r_regionkey <= 1
            UNION ALL
            SELECT 'update_postimage', 2, CAST(r_regionkey AS BIGINT),
                   'X_' || r_name, TRUE
            FROM region WHERE r_regionkey <= 1
            UNION ALL
            SELECT 'insert', 2, 90, 'NEWLAND', TRUE
            UNION ALL
            -- r14: the v3 plain append derives as inserts
            SELECT 'insert', 3, CAST(r_regionkey AS BIGINT) + 200,
                   'APP_' || r_name, TRUE
            FROM region WHERE r_regionkey >= 3
            UNION ALL
            -- r14: the v4 MIXED overwrite (remove f3 + add f4, no cdc)
            -- derives removes as deletes and adds as inserts
            SELECT 'delete', 4, CAST(r_regionkey AS BIGINT) + 200,
                   'APP_' || r_name, TRUE
            FROM region WHERE r_regionkey >= 3
            UNION ALL
            SELECT 'insert', 4, CAST(r_regionkey AS BIGINT) + 300,
                   'OVR_' || r_name, TRUE
            FROM region WHERE r_regionkey >= 3
        ) ORDER BY commit_version, change_type, r_regionkey
    """,
    # r7: the validator's ground truth is static — a healthy sync passes
    # every check for every target; any drift flips a FALSE into the hash
    "sync_validation": """
        SELECT f.fmt, c.check_name, TRUE AS success
        FROM (VALUES ('ICEBERG'), ('HUDI')) f(fmt)
        CROSS JOIN (VALUES ('CHECK_TABLE_SPEC'), ('CHECK_SCHEMA'),
                           ('CHECK_BASIC_COUNTS'), ('COMPARE_STATISTICS')) c(check_name)
    """,
    # --- probabilistic layer (r7): the oracle computes the exact ground
    # truth; the contract booleans the Spark plan derives from the LSH/IVF
    # runs are asserted as literal TRUE — a quality-bound violation on the
    # Spark side flips the boolean and fails the hash compare.
    "minhash_lsh_dedup": """
        WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(t) - 1),
                                 i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard,
               TRUE AS lsh_subset_ok, TRUE AS lsh_recall_ok
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.4
    """,
    "semdedup_pairs": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_COS_SQL}, 4) AS cos_sim,
               TRUE AS sem_subset_ok, TRUE AS sem_recall_ok
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE ROUND({_COS_SQL}, 4) >= 0.45
    """,
    "ann_lsh_topk": f"""
        SELECT b.vec_id, ROUND({_COS_SQL}, 4) AS cos_sim,
               TRUE AS lsh_planted_recall_ok
        FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) a
        WHERE b.vec_id <> 0
        ORDER BY cos_sim DESC, b.vec_id ASC LIMIT 10
    """,
    "ann_ivf_topk": f"""
        SELECT b.vec_id, ROUND({_COS_SQL}, 4) AS cos_sim,
               TRUE AS ivf_planted_recall_ok, TRUE AS ivf_raw_recall_ok
        FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) a
        WHERE b.vec_id <> 0
        ORDER BY cos_sim DESC, b.vec_id ASC LIMIT 10
    """,
    "ann_ivfpq_topk": f"""
        SELECT b.vec_id, ROUND({_COS_SQL}, 4) AS cos_sim,
               TRUE AS ivfpq_planted_recall_ok, TRUE AS ivfpq_raw_recall_ok
        FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) a
        WHERE b.vec_id <> 0
        ORDER BY cos_sim DESC, b.vec_id ASC LIMIT 10
    """,
    "ann_ivfpq_persisted": f"""
        SELECT b.vec_id, ROUND({_COS_SQL}, 4) AS cos_sim,
               TRUE AS ivfpq_persisted_recall_ok, TRUE AS partition_pruned_ok
        FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) a
        WHERE b.vec_id <> 0
        ORDER BY cos_sim DESC, b.vec_id ASC LIMIT 10
    """,
    "ann_pq_topk": f"""
        SELECT b.vec_id, ROUND({_COS_SQL}, 4) AS cos_sim,
               TRUE AS pq_planted_recall_ok, TRUE AS pq_raw_recall_ok
        FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) a
        WHERE b.vec_id <> 0
        ORDER BY cos_sim DESC, b.vec_id ASC LIMIT 10
    """,
    # SimHash is EXACT for hamming <= 3 (4x16-bit chunk pigeonhole), so this
    # is full value parity, not a contract: per distinct token, 64 bits from
    # the md5 top-16 hex chars (bit-identical to the Spark side's packed
    # conv(md5) long — verified on sample tokens); per doc, strict-majority
    # vote per bit position; all pairs with position-wise hamming <= 3.
    "simhash_near_dups": """
        WITH tk AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        ), th AS (
            SELECT DISTINCT doc_id,
                   list_aggregate(list_transform(range(1, 17),
                       i -> lpad(bin(strpos('0123456789abcdef',
                                            substr(md5(t), CAST(i AS INT), 1)) - 1), 4, '0')),
                       'string_agg', '') AS bits
            FROM tk
        ), pos AS (
            SELECT doc_id, p,
                   SUM(CASE WHEN substr(bits, CAST(p AS INT), 1) = '1' THEN 1 ELSE 0 END) AS ones,
                   COUNT(*) AS n
            FROM th, LATERAL unnest(generate_series(1, 64)) AS u(p)
            GROUP BY 1, 2
        ), sig AS (
            SELECT doc_id,
                   string_agg(CASE WHEN ones * 2 > n THEN '1' ELSE '0' END, '' ORDER BY p) AS s
            FROM pos GROUP BY 1
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_filter(range(1, 65),
                    i -> substr(a.s, CAST(i AS INT), 1) <> substr(b.s, CAST(i AS INT), 1)))
                    AS INT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE len(list_filter(range(1, 65),
                  i -> substr(a.s, CAST(i AS INT), 1) <> substr(b.s, CAST(i AS INT), 1))) <= 3
    """,
}


# Registry order matters: the driver's correctness harness records exactly the
# FIRST 50 entries.  Round-2 evidence covered the old first 50; round 3 front-loads
# the 22 queries that had no driver-grade evidence (windows/grouping sets, temporal
# joins, all streaming, sync_inventory, the probabilistic ANN layer, multimodal),
# followed by 28 representative already-proven queries.  The 22 entries past
# position 50 are all TPC-H shapes / trivial G-ops that were driver-green in
# CORRECTNESS_r02.json and remain covered by tests/tools/check_oracle.py.
SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ============ driver window (first 50 — the driver's CORRECTNESS
    # harness records exactly these; membership pinned by
    # tests/test_queries_smoke.py::MUST_BE_DRIVER_MEASURED) ============
    #
    # round-10 rotation (VERDICT r9 #2): the window re-samples by
    # staleness — the r10 newcomer first (needs its first driver row),
    # then the 20 queries whose last driver hash row was <= r4 (two from
    # r2), then the r5/r6 cohorts, then 17 of the r7-greens. Everything
    # green in r8/r9 (the previous window: the full tpch_*/g1-g7 sweep,
    # the r8 newcomers, the probabilistic contracts) rotates to the stale
    # pool — still value-checked against DuckDB on every pytest run.
    #
    # -- round-10 newcomers: Iceberg foreign-table conformance + the
    # OPTIMIZE ZORDER lifecycle (morton_key composed into compact_table)
    "sync_foreign_iceberg": q_sync_foreign_iceberg,
    "sync_foreign_iceberg_deletes": q_sync_foreign_iceberg_deletes,
    "sync_delta_dv": q_sync_delta_dv,
    "zorder_compaction": q_zorder_compaction,
    "ann_pq_topk": q_ann_pq_topk,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "ann_ivfpq_persisted": q_ann_ivfpq_persisted,
    "hudi_mor_views": q_hudi_mor_views,
    "iceberg_eq_deletes": q_iceberg_eq_deletes,
    "dv_translation": q_dv_translation,
    "hudi_delete_translation": q_hudi_delete_translation,
    "hudi_mor_compaction": q_hudi_mor_compaction,
    "iceberg_rewrite_files": q_iceberg_rewrite_files,
    "delta_dv_purge": q_delta_dv_purge,
    "iceberg_upsert": q_iceberg_upsert,
    "delta_upsert": q_delta_upsert,
    "hudi_upsert": q_hudi_upsert,
    "streaming_upsert": q_streaming_upsert,
    "iceberg_wap": q_iceberg_wap,
    "iceberg_manifest_compaction": q_iceberg_manifest_compaction,
    "delta_v2_checkpoint": q_delta_v2_checkpoint,
    "vacuum_orphans": q_vacuum_orphans,
    # -- last driver rows r2-r4 (the 20 stalest)
    "g8_stats_regroup": q_g8_stats_regroup,
    "g10_json_flatten": q_g10_json_flatten,
    "g11_sort_commits": q_g11_sort_commits,
    "g12_latest_instant": q_g12_latest_instant,
    "dedup_exact": q_dedup_exact,
    "fingerprint_dedup": q_fingerprint_dedup,
    "dedup_first_per_key": q_dedup_first_per_key,
    "deterministic_sample": q_deterministic_sample,
    "token_packing": q_token_packing,
    "ngram_jaccard": q_ngram_jaccard,
    "embedding_near_dups": q_embedding_near_dups,
    "embedding_topk": q_embedding_topk,
    "token_stats": q_token_stats,
    "pivot_events": q_pivot_events,
    "unpivot_stats": q_unpivot_stats,
    "intersect_keys": q_intersect_keys,
    "sessionize": q_sessionize,
    "text_features": q_text_features,
    "langid_counts": q_langid_counts,
    "full_outer_balance": q_full_outer_balance,
    # -- last driver rows r5
    "dedup_clusters": q_dedup_clusters,
    "corpus_curation": q_corpus_curation,
    "percentile_agg": q_percentile_agg,
    "range_join": q_range_join,
    "rollup_agg": q_rollup_agg,
    "cube_agg": q_cube_agg,
    # -- last driver rows r6
    "funnel_steps": q_funnel_steps,
    "cohort_retention": q_cohort_retention,
    "window_agg": q_window_agg,
    "hopping_window": q_hopping_window,
    "asof_join": q_asof_join,
    "streaming_window_agg": q_streaming_window_agg,
    # -- last driver rows r7 (17 of 37; the rest lead the next rotation)
    "sync_inventory": q_sync_inventory,
    "sync_changes": q_sync_changes,
    "sync_time_travel": q_sync_time_travel,
    "sync_schema_evolution": q_sync_schema_evolution,
    "streaming_sink_inventory": q_streaming_sink_inventory,
    "zorder_layout": q_zorder_layout,
    "pii_redaction": q_pii_redaction,
    "contamination_span": q_contamination_span,
    "cluster_representatives": q_cluster_representatives,
    "streaming_dedup": q_streaming_dedup,
    "streaming_join": q_streaming_join,
    "streaming_sessionize": q_streaming_sessionize,
    "stateful_running_totals": q_stateful_running_totals,
    # ============ past the driver's 50-entry window (the boundary falls
    # EXACTLY after stateful_running_totals — position 50): driver-green
    # in earlier rounds, still oracle-checked by tools/check_oracle.py +
    # test_queries_smoke.py on every pytest run ============
    # -- r7-green remainder (next rotation's first pick)
    "streaming_approx_reach": q_streaming_approx_reach,
    "multimodal_decode": q_multimodal_decode,
    "audio_features": q_audio_features,
    "image_resize": q_image_resize,
    "video_frame_sample": q_video_frame_sample,
    "winnow_fingerprint": q_winnow_fingerprint,
    "winnow_near_dups": q_winnow_near_dups,
    "streaming_hopping": q_streaming_hopping,
    "knn_label_vote": q_knn_label_vote,
    "centroid_similarity": q_centroid_similarity,
    "decontam_overlap": q_decontam_overlap,
    "stratified_sample": q_stratified_sample,
    "chunk_dedup": q_chunk_dedup,
    "bm25_search": q_bm25_search,
    "incremental_dedup": q_incremental_dedup,
    "gap_fill": q_gap_fill,
    "moving_avg": q_moving_avg,
    "event_transitions": q_event_transitions,
    "approx_distinct": q_approx_distinct,
    "heavy_hitters": q_heavy_hitters,
    "approx_quantiles": q_approx_quantiles,
    "tfidf_top_terms": q_tfidf_top_terms,
    "source_mixture": q_source_mixture,
    "unigram_logprob": q_unigram_logprob,
    # -- green in r8 AND r9 (the previous driver window)
    "sync_foreign_table": q_sync_foreign_table,
    "multimodal_ingest": q_multimodal_ingest,
    "streaming_cdc_feed": q_streaming_cdc_feed,
    "streaming_cdc_hudi": q_streaming_cdc_hudi,
    "sync_continuous": q_sync_continuous,
    "token_calibration": q_token_calibration,
    "compaction_bins": q_compaction_bins,
    "bpe_pair_counts": q_bpe_pair_counts,
    "repetition_filter": q_repetition_filter,
    "substring_dedup": q_substring_dedup,
    "perplexity_buckets": q_perplexity_buckets,
    "sync_validation": q_sync_validation,
    "sync_recovery": q_sync_recovery,
    "sync_partition_evolution": q_sync_partition_evolution,
    "sync_bucket_spec": q_sync_bucket_spec,
    "sync_bucket_decimal": q_sync_bucket_decimal,
    "delta_cdf": q_delta_cdf,
    "iceberg_changelog": q_iceberg_changelog,
    "iceberg_changelog_updates": q_iceberg_changelog_updates,
    "iceberg_changelog_net": q_iceberg_changelog_net,
    "hudi_changelog": q_hudi_changelog,
    "hudi_changelog_updates": q_hudi_changelog_updates,
    "hudi_cdc_feed": q_hudi_cdc_feed,
    "streaming_cdf": q_streaming_cdf,
    "streaming_iceberg_appends": q_streaming_iceberg_appends,
    "streaming_hudi_rows": q_streaming_hudi_rows,
    "streaming_hudi_replace": q_streaming_hudi_replace,
    "sync_safety_fallback": q_sync_safety_fallback,
    "sync_catchup": q_sync_catchup,
    "minhash_lsh_dedup": q_minhash_lsh_dedup,
    "simhash_near_dups": q_simhash_near_dups,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "semdedup_pairs": q_semdedup_pairs,
    "tpch_q1": q_tpch_q1,
    "tpch_q2": q_tpch_q2,
    "tpch_q3": q_tpch_q3,
    "tpch_q4": q_tpch_q4,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q10": q_tpch_q10,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q13": q_tpch_q13,
    "tpch_q14": q_tpch_q14,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q18": q_tpch_q18,
    "tpch_q19": q_tpch_q19,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "tpch_q22": q_tpch_q22,
    "g1_files_diff": q_g1_files_diff,
    "g2_group_files": q_g2_group_files,
    "g3_schema_flatten": q_g3_schema_flatten,
    "g4_sorted_merge_dedup": q_g4_sorted_merge_dedup,
    "g5_min_over_group": q_g5_min_over_group,
    "g6_filter_predicates": q_g6_filter_predicates,
    "g7_max_agg": q_g7_max_agg,
}

# ---- round-12 driver-window rotation (VERDICT r11 #5) ------------------
# The driver's correctness harness records the FIRST 50 registry entries.
# Rotation by staleness: the three r12 newcomers (no driver evidence
# yet — the Hudi delete-translation edge, MOR log compaction, and the
# Iceberg delete-applying rewrite), then the 30 queries whose last
# driver hash row was r9 (the stalest cohort, named in VERDICT r11 #5),
# then 17 of the 50 r10-sampled queries (alphabetical — all equally
# stale) as fill. Everything green in r11 retires to the stale pool —
# still value-checked against DuckDB on every pytest run
# (test_queries_smoke).
_R12_WINDOW = [
    # r12 newcomers
    "hudi_delete_translation", "hudi_mor_compaction", "iceberg_rewrite_files",
    "delta_dv_purge", "iceberg_upsert", "delta_upsert", "hudi_upsert",
    "streaming_upsert", "iceberg_wap", "iceberg_manifest_compaction",
    "delta_v2_checkpoint",
    # last driver rows r9 (the 30 VERDICT r11 #5 names)
    "ann_ivf_topk", "ann_lsh_topk", "bpe_pair_counts", "compaction_bins",
    "minhash_lsh_dedup", "multimodal_ingest", "perplexity_buckets",
    "repetition_filter", "semdedup_pairs", "simhash_near_dups",
    "streaming_cdc_feed", "streaming_cdc_hudi", "substring_dedup",
    "sync_catchup", "sync_continuous", "sync_foreign_table",
    "sync_partition_evolution", "sync_recovery", "sync_safety_fallback",
    "sync_validation", "token_calibration",
    "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
    # last driver rows r10 (first 9 alphabetically of the 50)
    "ann_ivfpq_topk", "ann_pq_topk", "asof_join", "cluster_representatives",
    "cohort_retention", "contamination_span", "corpus_curation", "cube_agg",
    "dedup_clusters",
]
assert len(_R12_WINDOW) == 50 and len(set(_R12_WINDOW)) == 50
SPARK_QUERIES = {
    **{n: SPARK_QUERIES[n] for n in _R12_WINDOW},
    **SPARK_QUERIES,
}

# ---- round-13 driver-window rotation (VERDICT r12 #6) ------------------
# The driver records the FIRST 50 registry entries. Rotation by
# staleness: the five r13 newcomers (bucket-transform sync + the
# row-level CDC triangle: Delta change data feed, Iceberg changelog,
# Hudi changelog, streaming CDF — no driver evidence yet), then ALL 41 queries whose
# latest driver hash row is r10 (the stalest cohort; computed from
# CORRECTNESS_r10/r11/r12 key sets), then 4 of the r11 cohort
# (alphabetical — all equally stale) as fill.
# Everything green in r12 retires to the stale pool — still value-checked
# against DuckDB on every pytest run (test_queries_smoke).
_R14_WINDOW = [
    # r14 newcomers
    "sync_bucket_decimal", "iceberg_changelog_updates", "hudi_cdc_feed",
    "hudi_changelog_updates",
    # last driver rows r11 (ALL 46)
    "bm25_search", "centroid_similarity", "chunk_dedup", "decontam_overlap",
    "dv_translation", "event_transitions", "g1_files_diff", "g2_group_files",
    "g3_schema_flatten", "g4_sorted_merge_dedup", "g5_min_over_group",
    "g6_filter_predicates", "g7_max_agg", "gap_fill", "heavy_hitters",
    "hudi_mor_views", "iceberg_eq_deletes", "image_resize",
    "incremental_dedup", "knn_label_vote", "moving_avg", "multimodal_decode",
    "source_mixture", "stratified_sample", "streaming_approx_reach",
    "streaming_hopping", "sync_delta_dv", "sync_foreign_iceberg_deletes",
    "tfidf_top_terms", "tpch_q1", "tpch_q10", "tpch_q11", "tpch_q12",
    "tpch_q13", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q9", "unigram_logprob", "video_frame_sample",
    "winnow_fingerprint", "winnow_near_dups",
]
assert len(_R14_WINDOW) == 50 and len(set(_R14_WINDOW)) == 50
SPARK_QUERIES = {
    **{n: SPARK_QUERIES[n] for n in _R14_WINDOW},
    **SPARK_QUERIES,
}

# ---- round-15 driver-window rotation (VERDICT r14 #2) ------------------
# The driver records the FIRST 50 registry entries. Rotation by
# staleness: the three late-r14 registrations that have never been
# driver-sampled, the r15 newcomer, then 46 of the 50 queries whose
# latest driver hash row is r12. The cohort has 54 candidates for 50
# slots; tpch_q19-q22 stay at r12 — pure-SQL TPC-H translations with
# zero engine code, value-checked against DuckDB on every pytest run
# (test_queries_smoke) and every bare check_oracle run.
_R15_WINDOW = [
    # never driver-sampled (late-r14 registrations) + the r15 newcomer
    "iceberg_changelog_net", "streaming_hudi_rows",
    "streaming_iceberg_appends", "streaming_hudi_replace",
    # last driver rows r12 (46 of 50)
    "ann_ivf_topk", "ann_ivfpq_topk", "ann_lsh_topk", "ann_pq_topk",
    "asof_join", "bpe_pair_counts", "cluster_representatives",
    "cohort_retention", "compaction_bins", "contamination_span",
    "corpus_curation", "cube_agg", "dedup_clusters", "delta_dv_purge",
    "delta_upsert", "delta_v2_checkpoint", "hudi_delete_translation",
    "hudi_mor_compaction", "hudi_upsert", "iceberg_manifest_compaction",
    "iceberg_rewrite_files", "iceberg_upsert", "iceberg_wap",
    "minhash_lsh_dedup", "multimodal_ingest", "perplexity_buckets",
    "repetition_filter", "semdedup_pairs", "simhash_near_dups",
    "streaming_cdc_feed", "streaming_cdc_hudi", "streaming_upsert",
    "substring_dedup", "sync_catchup", "sync_continuous",
    "sync_foreign_table", "sync_partition_evolution", "sync_recovery",
    "sync_safety_fallback", "sync_validation", "token_calibration",
    "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
]
assert len(_R15_WINDOW) == 50 and len(set(_R15_WINDOW)) == 50
SPARK_QUERIES = {
    **{n: SPARK_QUERIES[n] for n in _R15_WINDOW},
    **SPARK_QUERIES,
}

