"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Shuffle-conscious design for 100 TB corpora (SURVEY §2.5 / §7-M6):

- **exact**: hash-groupBy on a 128-bit digest — the shuffle carries
  (digest, doc_id), never the document body.
- **n-gram Jaccard**: inverted-index candidate join (explode shingles,
  self-join on shingle id) — exact results, but only pairs sharing ≥1
  shingle are materialized, vs the O(n²) cross join a naive version needs.
  Shingles travel as 64-bit xxhash values, not strings.
- **MinHash-LSH**: banded signatures; candidate pairs only where a band
  collides, then exact-Jaccard verification. Tunable (num_hashes, bands)
  precision/recall; the signature build is one projection, the banding one
  explode + groupBy — two narrow shuffles total.
- **SimHash**: 64-bit signature via per-token hash bit voting; candidates
  from 16-bit chunk collisions (pigeonhole: hamming ≤ 3 ⇒ some chunk
  equal), verified with bit_count(xor).

All pure Column expressions — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from onetable_spark.functions.text import tokens


# ------------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per exact content group."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ------------------------------------------------------------------ shingles


def shingles(col: str | Column = "text", n: int = 3) -> Column:
    """Word n-gram shingle set (distinct), as strings.

    NOTE: as a bare Column expression this re-tokenizes per gram offset;
    use ``shingle_hash_df`` in pipelines — it materializes the token array
    behind an exchange so tokenization happens exactly once per row."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(tokens(col), (i + k).cast("int")) for k in range(n)]),
    )
    return F.array_distinct(gram)


def shingle_hash_df(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sh: array<long>) — distinct 64-bit shingle hashes per document.

    Two projections separated by a repartition barrier: Catalyst's
    projection collapse would otherwise inline the ``split`` into every
    ``element_at`` reference (n tokenizations per gram × every consumer).
    After the exchange the token array is materialized once; each gram is
    O(1) array access + one concat + one xxhash64. The downstream shuffle
    (band join / explode join) needed a repartition anyway, so the barrier
    is free in practice."""
    spark = df.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks")).repartition(
        parallelism
    )
    idx = F.sequence(F.lit(1), F.greatest(F.size("toks") - (n - 1), F.lit(0)))
    gram_hash = F.transform(
        idx,
        lambda i: F.xxhash64(
            F.concat_ws(" ", *[F.element_at("toks", (i + k).cast("int")) for k in range(n)])
        ),
    )
    # second barrier: consumers fan the sh column into many expressions
    # (64 minhash mins); without it projection collapse re-inlines the gram
    # construction into each one
    return toks.select("id", F.array_distinct(gram_hash).alias("sh")).repartition(parallelism)


def _shingle_hashes(col: str | Column = "text", n: int = 3) -> Column:
    """Shingle set as 64-bit hashes — joins/aggregations carry longs."""
    return F.array_distinct(F.transform(shingles(col, n), lambda s: F.xxhash64(s)))


# ----------------------------------------------------- exact n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All document pairs with n-gram Jaccard ≥ threshold — **exact**.

    Inverted-index plan: explode shingle hashes → self-join on shingle →
    per-pair intersection count (one hash agg) → |A∪B| = |A|+|B|−|A∩B|.
    Skew note: a stop-shingle shared by everything would explode the
    candidate join at corpus scale; production adds a document-frequency
    cap on shingles (drop shingles in >p% of docs) before the join.
    """
    sh = shingle_hash_df(df, n, text_col, id_col).withColumn("sh_size", F.size("sh"))
    exploded = sh.select("id", "sh_size", F.explode("sh").alias("g"))
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh_size").alias("size_a"),
            F.col("b.sh_size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    return (
        inter.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------- MinHash LSH


def minhash_signature_from(sh: Column, num_hashes: int = 64) -> Column:
    """MinHash signature from a materialized shingle-hash array column:
    k × array_min(transform(sh, xxhash64(g, seed))) expressions, all
    codegen'd over the stored array (no shingle recomputation)."""

    def seeded_min(i: int) -> Column:
        # closure (not a default arg): PySpark reads lambda arity, and a
        # 2-arg lambda would be called as (element, index)
        return F.array_min(F.transform(sh, lambda g: F.xxhash64(g, F.lit(i))))

    return F.array(*[seeded_min(i) for i in range(num_hashes)])


def minhash_signature(col: str | Column = "text", num_hashes: int = 64, n: int = 3) -> Column:
    """MinHash signature straight from text (convenience; pipelines should
    go through ``shingle_hash_df`` + ``minhash_signature_from``)."""
    return minhash_signature_from(_shingle_hashes(col, n), num_hashes)


def minhash_lsh_candidates(
    df: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs whose signatures collide in ≥1 band."""
    rows_per_band = num_hashes // bands
    sig = (
        shingle_hash_df(df, n, text_col, id_col)
        .select("id", minhash_signature_from(F.col("sh"), num_hashes).alias("sig"))
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )  # barrier: banding below element_at's sig 64× — keep it materialized
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("id", F.explode(band_cols).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidates verified with exact Jaccard (no false positives;
    recall is the banding curve 1-(1-t^r)^b)."""
    cand = minhash_lsh_candidates(df, num_hashes, bands, n, text_col, id_col)
    sh = shingle_hash_df(df, n, text_col, id_col)
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ----------------------------------------------------------------- SimHash


def simhash64_from(hashed: Column) -> Column:
    """64-bit SimHash from a materialized token-hash array column: per bit
    position, sum(+1/-1) votes then take the sign bit. All JVM expressions.
    """

    def bit_vote(b: int) -> Column:
        return F.aggregate(
            hashed,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )

    bit_votes = [bit_vote(b) for b in range(64)]
    out = F.lit(0).cast("long")
    for b, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash64(col: str | Column = "text") -> Column:
    """SimHash straight from text (convenience; pipelines should
    materialize token hashes first — see ``simhash_near_dup_pairs``)."""
    return simhash64_from(F.transform(F.array_distinct(tokens(col)), lambda t: F.xxhash64(t)))


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairs with SimHash hamming distance ≤ max_hamming.

    Candidates via 16-bit chunk equality (pigeonhole: ≤3 differing bits of
    64 ⇒ at least one of 4 chunks identical), verified with
    bit_count(xor) — the candidate join shuffles only (chunk, id, sig).
    """
    spark = df.sparkSession
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.array_distinct(tokens(text_col)), lambda t: F.xxhash64(t)).alias("th"),
    ).repartition(spark.sparkContext.defaultParallelism)  # barrier: 64 votes fan out below
    sig = hashed.select("id", simhash64_from(F.col("th")).alias("sig")).repartition(
        spark.sparkContext.defaultParallelism
    )  # barrier again: the chunk explode below references sig 6×
    chunks = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("sig", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("id", "sig", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
