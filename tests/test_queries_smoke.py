"""Value-parity gate: every declared query runs at sf0.001 and its result
MATCHES the DuckDB oracle (schema by sorted column name, row count, and
order-insensitive normalized values — the same contract as the driver's
hash gate, via tools.check_oracle.compare_result). Queries without an
oracle (probabilistic ANN/LSH) get a runs-and-returns-rows check.

This makes oracle parity an automated pytest gate for ALL queries —
including the ones past the driver's 50-entry CORRECTNESS window — not
just a manual tools/check_oracle.py run.
"""

from __future__ import annotations

import duckdb
import pytest

from onetable_spark.queries import ORACLE_SQL, SPARK_QUERIES
from onetable_spark.session import TABLES
from tools.check_oracle import compare_result

# The driver's correctness harness records exactly the first 50 registry
# entries. These queries MUST stay inside that window: they are the ones
# whose only driver-grade evidence comes from rounds >= 3 (streaming,
# sync_inventory, ANN, multimodal, windows, temporal joins). Anyone
# alphabetizing or appending to SPARK_QUERIES should trip this list, not
# silently drop driver coverage.
MUST_BE_DRIVER_MEASURED = {
    # round-14 rotation (VERDICT r13 #7): everything green in the r13
    # window retires; the window re-samples by staleness. Pinned here:
    # the r14 newcomers (no driver evidence yet) and ALL 46 queries whose
    # latest driver hash row is r11 — the rotation IS a round
    # deliverable, so falling out of the window must fail loudly.
    #
    # round-14 newcomers: first driver rows needed
    "sync_bucket_decimal", "iceberg_changelog_updates", "hudi_cdc_feed",
    "hudi_changelog_updates",
    # last driver rows r11 (all 46, from CORRECTNESS_r11/r12/r13 keys)
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
}


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPARK_QUERIES))
def test_query_matches_oracle_values(spark, sf_dir, oracle_con, name):
    df = SPARK_QUERIES[name](spark, sf_dir)
    sql = ORACLE_SQL.get(name)
    if sql is None:
        # probabilistic / stub-backed: rows-only (recall bounds are pinned
        # in test_pipeline_functions)
        assert df.count() >= 0
        return
    msg = compare_result(df, sql, oracle_con)
    assert msg is None, f"{name}: {msg}"


# Round-6 lesson: a query can be driver-green at sf0.01 yet oracle-RED at
# sf0.001 (perplexity_buckets' old AVG(double) bucket key). Any query whose
# output depends on threshold / bucket / rounding logic must therefore prove
# parity at BOTH scales — a boundary document that doesn't exist at one scale
# can exist at the other. Kept to the threshold-sensitive set so the matrix
# stays in CI time.
SF_LARGE = "/root/testdata/sf0.01"
BOUNDARY_SENSITIVE = [
    "perplexity_buckets",   # bucket cuts on a rounded score
    "repetition_filter",    # ratio thresholds
    "approx_quantiles",     # interpolated percentiles, rounded
    "source_mixture",       # rounded shares
    "unigram_logprob",      # rounded log-prob sums
    "stratified_sample",    # hash-threshold sampling
    # r7 contract queries: their booleans are recall/subset thresholds
    # (ivf_raw_recall_ok sits EXACTLY at its >=4 bound at sf0.01)
    "minhash_lsh_dedup",
    "simhash_near_dups",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "semdedup_pairs",
    # r10: layout-contract booleans (span halving, probe-box pruning)
    "zorder_compaction",
    # r10: PQ / IVF-PQ recall-contract booleans
    "ann_pq_topk",
    "ann_ivfpq_topk",
    # r11: persisted-codes recall + partition-pruning contract booleans
    "ann_ivfpq_persisted",
]


@pytest.fixture(scope="module")
def oracle_con_large():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_LARGE}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", BOUNDARY_SENSITIVE)
def test_boundary_query_matches_oracle_at_sf001(spark, oracle_con_large, name):
    df = SPARK_QUERIES[name](spark, SF_LARGE)
    msg = compare_result(df, ORACLE_SQL[name], oracle_con_large)
    assert msg is None, f"{name}@sf0.01: {msg}"


def test_every_oracle_has_a_query():
    assert set(ORACLE_SQL) <= set(SPARK_QUERIES)


def test_driver_window_holds_the_unproven_queries():
    first_50 = set(list(SPARK_QUERIES)[:50])
    missing = MUST_BE_DRIVER_MEASURED - first_50
    assert not missing, (
        f"registry order is load-bearing: the driver records only the first 50 "
        f"SPARK_QUERIES entries, and these fell out of the window: {sorted(missing)}"
    )


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
