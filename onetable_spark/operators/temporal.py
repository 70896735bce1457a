"""Temporal/non-equi join operators Spark lacks as built-ins (SURVEY §2.5
extension layer): as-of join and banded range join.

**As-of join — union-merge plan, not a range join.** The naive formulation
(join on key + ``right.ts <= left.ts`` then keep the max) is a non-equi
join that degenerates to per-key cross products. The scalable plan tags
both inputs, unions them, and takes ``last(right_cols, ignoreNulls)`` over
an ordered window per key: one shuffle on the key, O(n log n) per
partition, no pair blowup — the classic sorted-merge as-of used by
time-series engines, expressed with DataFrame primitives Catalyst can
optimize. Skewed keys are handled by AQE; at 100 TB both sides partition
by key and the window sort stays within partitions.

**Banded range join — broadcast the bands.** A non-equi theta join against
a small interval table; broadcasting the bands turns it into a scan-side
nested loop over a handful of intervals (BroadcastNestedLoopJoin) with no
shuffle of the fact side at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: str | int | float | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` for the same key (ASOF LEFT JOIN).

    Ties inside the right table (same key, same ts) must be pre-deduped by
    the caller for deterministic output — mirrors DuckDB/kdb semantics
    where the as-of pick among equal timestamps is unspecified. OR: pass
    ``right_tiebreak`` (a right column name) and ties resolve to the row
    with the MAXIMUM tiebreak value inside the same merge window — the
    running ``last()`` lands on it because right rows at equal ``_t`` sort
    ascending by the tiebreak. Equivalent to pre-deduping with
    ``max_by(*, tiebreak)`` but without the extra aggregation exchange:
    the dedup rides the window sort the as-of already pays (left rows
    carry NULL in the tiebreak column, which only reorders them among
    themselves — each left row's ROWS frame value is unaffected).
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    if right_tiebreak is not None and right_tiebreak not in rcols:
        # ADVICE r15: a tiebreak outside right_cols is absent from the
        # merged frame (opaque AnalysisException later), and a same-named
        # LEFT column would silently feed the window ordering instead
        raise ValueError(
            f"right_tiebreak {right_tiebreak!r} must be one of the joined "
            f"right columns {rcols}"
        )
    l_tag = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    r_tag = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_t"),
            *[F.col(c) for c in rcols],
        )
        .withColumn("_side", F.lit(0))
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # order: time asc, right rows before left rows at equal time (<= match)
    order = [F.col("_t").asc(), F.col("_side").asc()]
    if right_tiebreak is not None:
        order.append(F.col(right_tiebreak).asc())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if right_tiebreak is not None:
        # ADVICE r15: resolve ties by selecting the WHOLE winning row —
        # per-column last(ignorenulls) could mix columns from different
        # tie rows when the max-tiebreak row carries a NULL payload
        # (max_by pre-dedup would return the winning row's NULL). One
        # struct-valued last() over the same window also replaces
        # len(rcols)+1 window aggregates with one.
        row = F.last(
            F.when(F.col("_side") == 0, F.struct(F.col("_t"), *[F.col(c) for c in rcols])),
            ignorenulls=True,
        ).over(w)
        filled = merged.select(
            "*",
            *[row[c].alias(f"_asof_{c}") for c in rcols],
            row["_t"].alias("_asof_t"),
        )
    else:
        filled = merged.select(
            "*",
            *[F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}") for c in rcols],
            F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True)
            .over(w)
            .alias("_asof_t"),
        )
    out = filled.filter(F.col("_side") == 1)
    if tolerance is not None:
        # interval string for timestamp columns, plain number for numeric ones
        if isinstance(tolerance, (int, float)):
            within = F.col("_t") - F.lit(tolerance) <= F.col("_asof_t")
        else:
            within = F.col("_t") - F.expr(f"INTERVAL {tolerance}") <= F.col("_asof_t")
        out = out.select(
            *left.columns,
            *[
                F.when(within, F.col(f"_asof_{c}")).alias(c)
                for c in rcols
            ],
        )
    else:
        out = out.select(*left.columns, *[F.col(f"_asof_{c}").alias(c) for c in rcols])
    return out


def banded_range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join each fact row to the band whose [lo, hi) interval contains
    ``value_col`` — bands broadcast, facts never shuffle."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, "inner")
