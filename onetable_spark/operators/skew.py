"""Skew-mitigation operators: salting for hot keys (SURVEY §7-M6 scale
notes; complements AQE's runtime skew-join splitting with a declarative
form usable when the skew is known ahead of time, e.g. a null-heavy key or
a power-law entity distribution in a 100 TB corpus).

- ``salted_groupby``: two-phase aggregation — partial agg on
  (key, salt) spreads a hot key over S reducers, then a cheap final agg on
  the key merges the S partials. Works for any algebraic aggregate
  (sum/count/min/max); the example surface covers sum+count.
- ``salted_join``: the big (skewed) side gets a random-but-deterministic
  salt in [0, S); the small side is exploded S× so every (key, salt)
  combination finds its match. Result is row-identical to the plain join;
  the hot key's rows now land in S tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_groupby(
    df: DataFrame,
    key: str,
    agg_cols: dict[str, str],
    salt_buckets: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``agg_cols`` maps column → 'sum' | 'count' | 'min' | 'max'. The salt is
    derived deterministically (hash of ``salt_on``, defaulting to all
    columns) so retries/recomputes stay stable — never ``rand()`` in a
    fault-tolerant pipeline.
    """
    salt_src = F.xxhash64(*[F.col(c) for c in df.columns]) if salt_on is None else (
        F.xxhash64(salt_on if isinstance(salt_on, Column) else F.col(salt_on))
    )
    salted = df.withColumn("_salt", F.pmod(salt_src, F.lit(salt_buckets)))

    partial_aggs, final_aggs = [], []
    for col, how in agg_cols.items():
        pname = f"_p_{col}_{how}"
        if how == "sum":
            partial_aggs.append(F.sum(col).alias(pname))
            final_aggs.append(F.sum(pname).alias(f"{how}_{col}"))
        elif how == "count":
            partial_aggs.append(F.count(col).alias(pname))
            final_aggs.append(F.sum(pname).alias(f"{how}_{col}"))
        elif how == "min":
            partial_aggs.append(F.min(col).alias(pname))
            final_aggs.append(F.min(pname).alias(f"{how}_{col}"))
        elif how == "max":
            partial_aggs.append(F.max(col).alias(pname))
            final_aggs.append(F.max(pname).alias(f"{how}_{col}"))
        else:
            raise ValueError(f"unsupported aggregate {how!r}")

    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Replication cost is S × |small| — use only when ``small`` is modest
    (dimension-sized) and the big side's key distribution is power-law.
    """
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    small_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    joined = big_salted.join(small_replicated, [key, "_salt"], how)
    return joined.drop("_salt")
