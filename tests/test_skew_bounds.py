"""Hot-bucket skew bounds in the LSH dedup layer (round-4, VERDICT #3).

An adversarial corpus — thousands of documents from one template landing
in one LSH bucket / one identical-signature group — must not materialize
a single giant array in one task. ``_bounded_members`` splits oversized
groups into anchored sub-buckets; these tests pin down:

- the per-array size bound actually holds (≈cap, hash-uniform salting);
- no member is lost and the anchor reaches every sub-bucket;
- cluster-level recall survives the trade: connected components over the
  bounded pairs still merge the whole template cluster;
- corpora below the cap are byte-identical to the unbounded plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from onetable_spark.functions.dedup import (
    _bounded_members,
    connected_components,
    minhash_lsh_dedup_pairs,
    simhash_near_dup_pairs,
)

TEMPLATE = (
    "breaking news update the quick brown fox jumps over the lazy dog "
    "while markets rally and analysts debate the quarterly earnings report "
    "issued this morning by the large industrial conglomerate"
)


def _template_corpus(spark, n_dups: int, n_unique: int = 20):
    rows = [(i, TEMPLATE) for i in range(n_dups)] + [
        (10_000 + i, f"entirely different document number {i} about topic {i * 7} "
                     f"with its own content body and vocabulary variant {i * 13}")
        for i in range(n_unique)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bounded_members_caps_array_size_and_keeps_anchor(spark):
    # one pathological hot bucket: 500 members of (band=1, bucket=7)
    df = spark.createDataFrame(
        [(1, 7, i) for i in range(500)], "band int, bucket long, id long"
    )
    out = _bounded_members(df, ["band", "bucket"], "id", F.col("id"), 32).collect()
    assert len(out) > 1, "hot bucket must split into sub-buckets"
    sizes = [len(r["mem"]) for r in out]
    # salting is hash-uniform: sub-buckets concentrate near cap; 2x is a
    # generous tail bound that still proves no task sees the full 500
    assert max(sizes) <= 64, sizes
    all_ids = set()
    for r in out:
        assert 0 in r["mem"], "anchor (min id) must reach every sub-bucket"
        all_ids.update(r["mem"])
    assert all_ids == set(range(500)), "no member may be lost"


def test_bounded_members_noop_below_cap(spark):
    df = spark.createDataFrame(
        [(b, b * 10, i) for b in range(3) for i in range(10)],
        "band int, bucket long, id long",
    )
    out = _bounded_members(df, ["band", "bucket"], "id", F.col("id"), 32).collect()
    assert len(out) == 3
    assert all(sorted(r["mem"]) == list(range(10)) for r in out)


def test_minhash_template_cluster_stays_connected_under_cap(spark):
    df = _template_corpus(spark, n_dups=300)
    pairs = minhash_lsh_dedup_pairs(df, threshold=0.4, max_bucket=24)
    comp = connected_components(pairs).collect()
    by_node = {r["node"]: r["component"] for r in comp}
    # every template doc must fold into the component anchored at doc 0
    assert all(by_node.get(i, -1) == 0 for i in range(1, 300)), (
        "bounded buckets must preserve template-cluster connectivity"
    )


def test_minhash_bounded_equals_unbounded_below_cap(spark, sf_dir):
    from onetable_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    bounded = minhash_lsh_dedup_pairs(docs, threshold=0.4, max_bucket=1024)
    unbounded = minhash_lsh_dedup_pairs(docs, threshold=0.4, max_bucket=1 << 40)
    a = sorted(map(tuple, bounded.collect()))
    b = sorted(map(tuple, unbounded.collect()))
    assert a == b, "cap must be a strict no-op when no bucket exceeds it"


def test_simhash_oversized_sig_group_stars_through_anchor(spark):
    df = _template_corpus(spark, n_dups=200)
    pairs = simhash_near_dup_pairs(df, max_hamming=3, max_bucket=50)
    rows = pairs.collect()
    # star representation: every member pairs with the anchor at hamming 0
    anchored = {r["id_b"] for r in rows if r["id_a"] == 0 and r["hamming"] == 0}
    assert set(range(1, 200)) <= anchored
    comp = connected_components(pairs.select("id_a", "id_b")).collect()
    by_node = {r["node"]: r["component"] for r in comp}
    assert all(by_node[i] == 0 for i in range(1, 200))


def test_simhash_bounded_equals_unbounded_below_cap(spark, sf_dir):
    from onetable_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    bounded = simhash_near_dup_pairs(docs, max_hamming=3, max_bucket=1024)
    unbounded = simhash_near_dup_pairs(docs, max_hamming=3, max_bucket=1 << 40)
    a = sorted(map(tuple, bounded.collect()))
    b = sorted(map(tuple, unbounded.collect()))
    assert a == b, "cap must be a strict no-op when no group exceeds it"


def test_winnow_hot_fingerprint_bounded(spark):
    """10 000 docs sharing one boilerplate block (VERDICT r4 #1): every
    boilerplate fingerprint has df=10 000 ≫ max_df, so the MOSS cap drops
    it before the self-join — the join input for any fingerprint is
    bounded by max_df, never m. Without the cap this materializes ~10⁸
    join rows; with it the query completes instantly and the template
    cluster simply yields no winnowing pairs (exact dedup owns full
    duplicates — the documented recall trade)."""
    from onetable_spark.functions.text import winnow_fingerprint_rows, winnow_near_dup_pairs

    df = _template_corpus(spark, n_dups=10_000, n_unique=20)
    cap = 64
    # the bound the join actually sees: per-fp group size after the cap
    fps = winnow_fingerprint_rows(df, k=3, w=4)
    kept_max = (
        fps.groupBy("fp").count().filter(F.col("count") <= cap)
        .agg(F.max("count")).collect()[0][0]
    )
    assert kept_max is not None and kept_max <= cap
    pairs = winnow_near_dup_pairs(df, k=3, w=4, min_shared=3, max_df=cap).collect()
    template_ids = set(range(10_000))
    assert all(
        r["id_a"] not in template_ids and r["id_b"] not in template_ids for r in pairs
    ), "boilerplate-only pairs are dropped by design (MOSS too-common rule)"


def test_winnow_cap_noop_below_df(spark, sf_dir):
    """On the real corpus (max observed df = 24 at sf0.1) the cap must be
    a strict no-op: capped and uncapped plans return identical pairs."""
    from onetable_spark.session import load_table
    from onetable_spark.functions.text import winnow_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    capped = winnow_near_dup_pairs(docs, max_df=64)
    uncapped = winnow_near_dup_pairs(docs, max_df=1 << 40)
    a = sorted(map(tuple, capped.collect()))
    b = sorted(map(tuple, uncapped.collect()))
    assert a == b and a, "cap must not change results below the df bound"


def test_star_rounds_match_local_union_find(spark):
    """Force the distributed large-star/small-star path (threshold=0) on a
    random graph and check it labels identically to the local union-find
    finish (threshold=inf)."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(220)]
    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a long, id_b long"
    )
    starred = connected_components(df, local_edge_threshold=0).collect()
    local = connected_components(df, local_edge_threshold=1 << 40).collect()
    assert sorted(map(tuple, starred)) == sorted(map(tuple, local))
    # star output labels by component minimum
    comp = {}
    for r in starred:
        comp.setdefault(r["component"], []).append(r["node"])
    assert all(c == min(members) for c, members in comp.items())


def test_chunk_dedup_hot_chunk_no_window(spark, tmp_path):
    """Round-6 fix (VERDICT r5 `weak` #1): one 16-token boilerplate chunk
    recurring across 10k docs must flow through a partial-aggregating
    groupBy + AQE-splittable join, never a `Window.partitionBy(ch)` (window
    partitions cannot be skew-split, so a hot chunk pins one task).

    Pins (a) exact counts on the adversarial corpus, (b) the physical plan
    containing zero Window operators.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from onetable_spark.queries import q_chunk_dedup

    boiler = " ".join(f"w{i}" for i in range(16))  # one exact 16-token chunk
    rows = [
        # 10_000 docs: the shared boilerplate chunk + one unique chunk each
        (i, boiler + " " + " ".join(f"u{i}x{j}" for j in range(16)))
        for i in range(10_000)
    ] + [
        # 5 docs of purely unique content (no dup chunks at all)
        (20_000 + i, " ".join(f"solo{i}y{j}" for j in range(32)))
        for i in range(5)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["t"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    out = q_chunk_dedup(spark, str(tmp_path))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "chunk counting must not use a window"

    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 10_005
    # template docs: 2 chunks, exactly 1 (the boilerplate) duplicated
    for doc_id in (0, 1, 9_999):
        r = got[doc_id]
        assert (r["n_chunks"], r["n_dup_chunks"]) == (2, 1), r
        assert r["dup_ratio"] == 0.5
    # solo docs: 2 unique chunks, zero dups
    for doc_id in (20_000, 20_004):
        r = got[doc_id]
        assert (r["n_chunks"], r["n_dup_chunks"]) == (2, 0), r


def test_incremental_dedup_shuffle_branch_matches_broadcast(spark, sf_dir, monkeypatch):
    """Round-6 fix (VERDICT r5 #6): q_incremental_dedup broadcasts the
    arriving batch only under a gram-count limit; a large delivery falls
    back to a plain equi-join (AQE picks the strategy). Both branches
    must be value-identical — the limit only changes the physical plan."""
    from onetable_spark import queries

    bc = sorted(map(tuple, queries.q_incremental_dedup(spark, sf_dir).collect()))
    assert bc, "fixture corpus must contain cross-batch near-dups"
    monkeypatch.setattr(queries, "_INCR_BROADCAST_GRAM_LIMIT", 0)
    sh = sorted(map(tuple, queries.q_incremental_dedup(spark, sf_dir).collect()))
    assert bc == sh
