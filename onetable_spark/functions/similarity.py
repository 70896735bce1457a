"""Similarity search over embedding columns (array<float>).

Two paths (SURVEY §2.5 / §7-M6):

- **brute-force cosine top-k** — exact baseline: one projection computing
  the dot product with ``F.zip_with``/``F.aggregate`` (JVM expressions, no
  UDF), then ``TakeOrderedAndProject`` for the top-k (per-partition heaps +
  driver merge — no full sort shuffle).
- **LSH-bucketed (random hyperplanes)** — the 100 TB path: b sign bits
  from fixed pseudo-random hyperplanes form a bucket key; search touches
  only rows whose bucket matches the query (partition-prunable if the
  table is written bucketed/partitioned by ``bucket``). Recall is tunable
  with multiple probe tables (repeat with different seeds).

Embedding-cosine **near-dup pairs** reuse the same hyperplane buckets as
the blocking key for a pairwise join, verified with exact cosine.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


# --------------------------------------------------------------- LSH path


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy needed on
    executors; generated driver-side, shipped as literals)."""
    state = seed & 0x7FFFFFFF
    planes: list[list[float]] = []
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            # Box-Muller-free symmetric float in [-1, 1)
            row.append(state / 2**30 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from fixed hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(vec_col, p) >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return bucket


def ann_lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only the query's LSH bucket.

    At scale the bucket column is precomputed at write time and the table
    partitioned by it → the filter prunes partitions and the scan touches
    ~1/2^bits of the data."""
    planes = _hyperplanes(len(query), bits, seed)
    qbucket = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query, plane)) >= 0:
            qbucket += 2**i
    q = F.array(*[F.lit(float(x)) for x in query])
    bucketed = df.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    return (
        bucketed.filter(F.col("bucket") == qbucket)
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold), LSH-blocked.

    Bucket collision is the blocking key; exact cosine verifies. High
    thresholds ⇒ near-identical sign patterns ⇒ high recall per table."""
    planes = _hyperplanes(dim, bits, seed)
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pair_cos = F.round(cosine(F.col("a.v"), F.col("b.v")), 4)
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            pair_cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_build_centroids(
    df: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    iters: int = 10,
    seed: int = 42,
    max_train_rows: int = 100_000,
):
    """IVF coarse quantizer: k-means centroids trained on a BOUNDED sample
    of the embedding column — Lloyd's iterations in numpy.

    The training collect is capped at ``max_train_rows`` regardless of
    corpus size: when ``sample_fraction`` is None the fraction is derived
    as max_train_rows/count, so a 100 TB corpus trains on a driver-sized
    sample (exactly how IVF indexes are built in practice — FAISS trains
    on ~256 vectors/centroid); assignment of the full corpus stays
    distributed. Pass an explicit fraction to override."""
    import numpy as np

    if sample_fraction is None:
        n = df.count()
        sample_fraction = 1.0 if n <= max_train_rows else max_train_rows / n
    sample = df.select(vec_col) if sample_fraction >= 1.0 else df.select(vec_col).sample(
        fraction=sample_fraction, seed=seed
    )
    mat = np.array([r[0] for r in sample.collect()], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ centroids.T).argmax(axis=1)  # cosine on unit vectors
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                centroids[c] = m / np.linalg.norm(m)
    return centroids


def ivf_assign(df: DataFrame, centroids, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Distributed cluster assignment: one numpy GEMM per Arrow batch
    against the broadcast centroid matrix → (id, cluster, v)."""
    import numpy as np
    import pandas as pd

    b_cent = df.sparkSession.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    def worker(batches):
        cent = b_cent.value
        for pdf in batches:
            q = np.array(list(pdf["v"]), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "cluster": (q @ cent.T).argmax(axis=1).astype(np.int32),
                    "v": pdf["v"],
                }
            )

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return base.mapInPandas(worker, "id long, cluster int, v array<float>")


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids=None,
) -> DataFrame:
    """IVF approximate top-k: score only the ``n_probe`` clusters nearest
    the query (~n_probe/n_clusters of the corpus scanned).

    At scale the assignment is precomputed at write time and the table is
    partitioned by ``cluster`` — the IN-list filter then prunes partitions
    and the scan touches only the probed slices; recall is tuned with
    n_probe. The exact twin is ``cosine_topk``."""
    import numpy as np

    if centroids is None:
        centroids = ivf_build_centroids(df, n_clusters, vec_col)
    q = np.asarray(query, dtype=np.float64)
    q /= np.linalg.norm(q)
    probe = np.argsort(-(centroids @ q))[:n_probe].tolist()
    assigned = ivf_assign(df, centroids, vec_col, id_col)
    qcol = F.array(*[F.lit(float(x)) for x in query])
    return (
        assigned.filter(F.col("cluster").isin(probe))
        .select(F.col("id").alias(id_col), F.round(cosine(F.col("v"), qcol), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def brute_force_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold as a checkerboard block join —
    NOTHING is collected to the driver.

    Rows hash into ``n_blocks`` blocks; every unordered block pair
    (bi ≤ bj) becomes one task's work unit. Each row is replicated to the
    ``n_blocks`` pairs its block participates in (an O(√P)-replication
    all-pairs scheme), a tiny (block_a, block_b) table is broadcast for
    the fan-out join, and one numpy GEMM per group scores the cross
    product. Per-task memory is O((N/n_blocks)·dim + (N/n_blocks)²) and
    scales down as n_blocks grows — at 100 TB raise n_blocks so a block
    fits an executor; the driver only ever sees the above-threshold pairs.
    Dot products accumulate in float64; results round to 4 decimals like
    the SQL twin.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))).cast("int").alias("block"),
    )
    combos = spark.createDataFrame(
        [(i * n_blocks + j, i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "combo int, block_a int, block_b int",
    )
    side_a = base.join(F.broadcast(combos), base.block == combos.block_a).select(
        "combo", F.lit(0).alias("side"), "id", "v"
    )
    side_b = base.join(
        F.broadcast(combos),
        (base.block == combos.block_b) & (combos.block_a != combos.block_b),
    ).select("combo", F.lit(1).alias("side"), "id", "v")
    tagged = side_a.unionByName(side_b)

    out_schema = "id_a long, id_b long, cos_sim double"

    empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})

    def gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        left = pdf[pdf["side"] == 0]
        right = pdf[pdf["side"] == 1]
        if left.empty:  # block_a had no rows — nothing to pair against
            return empty
        a_ids = left["id"].to_numpy(dtype=np.int64)
        a = np.array(list(left["v"]), dtype=np.float64)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        if right.empty:  # diagonal block: self-pairs, upper triangle
            b_ids, b = a_ids, a
        else:
            b_ids = right["id"].to_numpy(dtype=np.int64)
            b = np.array(list(right["v"]), dtype=np.float64)
            b /= np.linalg.norm(b, axis=1, keepdims=True)
        sims = np.round(a @ b.T, 4)
        li, ri = np.nonzero(sims >= threshold)
        ia, ib = a_ids[li], b_ids[ri]
        # diagonal: upper triangle only (kills self-hits + symmetric dups);
        # cross blocks: every hit is a distinct unordered pair — keep all
        keep = ia < ib if right.empty else np.ones(len(ia), dtype=bool)
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia, ib)[keep],
                "id_b": np.maximum(ia, ib)[keep],
                "cos_sim": sims[li, ri][keep],
            }
        )

    return tagged.groupBy("combo").applyInPandas(gemm, out_schema)
