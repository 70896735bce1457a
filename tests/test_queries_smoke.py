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
    # round-13 rotation (VERDICT r12 #6): everything green in the r12
    # window retires; the window re-samples by staleness. Pinned here:
    # the r13 newcomer (no driver evidence yet) and ALL 41 queries whose
    # latest driver hash row is r10 — the rotation IS a round
    # deliverable, so falling out of the window must fail loudly.
    #
    # round-13 newcomers: first driver rows needed
    "sync_bucket_spec", "delta_cdf", "iceberg_changelog", "hudi_changelog",
    "streaming_cdf",
    # last driver rows r10 (all 41, from CORRECTNESS_r10/r11/r12 keys)
    "dedup_exact", "dedup_first_per_key", "deterministic_sample",
    "embedding_near_dups", "embedding_topk", "fingerprint_dedup",
    "full_outer_balance", "funnel_steps", "g10_json_flatten",
    "g11_sort_commits", "g12_latest_instant", "g8_stats_regroup",
    "hopping_window", "intersect_keys", "langid_counts", "ngram_jaccard",
    "percentile_agg", "pii_redaction", "pivot_events", "range_join",
    "rollup_agg", "sessionize", "stateful_running_totals",
    "streaming_dedup", "streaming_join", "streaming_sessionize",
    "streaming_sink_inventory", "streaming_window_agg", "sync_changes",
    "sync_foreign_iceberg", "sync_inventory", "sync_schema_evolution",
    "sync_time_travel", "text_features", "token_packing", "token_stats",
    "unpivot_stats", "vacuum_orphans", "window_agg", "zorder_compaction",
    "zorder_layout",
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
