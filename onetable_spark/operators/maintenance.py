"""Table-maintenance planning operators (compaction / clustering).

The reference consumes clustering results — Hudi replace-commits carry a
"files replaced by bigger files" plan
(`core/src/main/java/io/onetable/hudi/HudiDataFileExtractor.java:181-198`,
`HudiTargetClient.java:296-298`) and our Hudi plane writes the same
replace-commit (formats/hudi.py, K8) — but planning WHICH small files to
coalesce is left to the table's own OPTIMIZE/clustering service. This
module supplies that planner as a pure DataFrame operator so the engine
can feed its own replace-commits.

Design for 100 TB: bin assignment is ``floor(exclusive_cumsum / target)``
over a per-partition sorted window — the standard fixed-stride bin-packing
relaxation every distributed OPTIMIZE uses (greedy first-fit needs a
sequential scan; the stride form is one window function, fully parallel
across table partitions, and overshoots a bin by at most one file). The
window shuffles by the table partition columns only, so skew is bounded by
the largest single table partition's FILE COUNT (not bytes), and the
subsequent groupBy reuses the same partitioning (no second shuffle of the
full inventory).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plan_compaction_bins(
    files: DataFrame,
    target_bytes: int,
    part_cols: Sequence[str] = ("partition_values",),
    size_col: str = "size",
    order_col: str = "path",
    min_files: int = 2,
) -> DataFrame:
    """Group small files into ~``target_bytes`` compaction bins.

    One output row per planned rewrite group:
    ``(*part_cols, bin_id, n_files, total_bytes, first_file, last_file)``
    where the bounds are the ``order_col`` extremes of the bin (deterministic,
    making the plan itself testable and idempotent). Bins with fewer than
    ``min_files`` members are dropped — rewriting a lone file is a no-op
    that real OPTIMIZE implementations skip.

    Files at or above ``target_bytes`` are excluded up front: they are
    already "compacted" and would each occupy a full stride anyway.
    """
    parts = [F.col(c) for c in part_cols]
    w = Window.partitionBy(*parts).orderBy(order_col)
    size = F.col(size_col).cast("long")
    cum_excl = F.coalesce(
        F.sum(size).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    binned = (
        files.where(size < target_bytes)
        .withColumn("bin_id", F.floor(cum_excl / F.lit(target_bytes)))
    )
    return (
        binned.groupBy(*parts, "bin_id")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(size).alias("total_bytes"),
            F.min(order_col).alias("first_file"),
            F.max(order_col).alias("last_file"),
        )
        .where(F.col("n_files") >= min_files)
    )
