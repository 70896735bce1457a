from onetable_spark.operators.relational import (
    files_diff,
    filter_commits_to_sync,
    group_files_by_partition,
    latest_instant,
    max_agg,
    min_over_group,
    regroup_stats_per_file,
    sorted_merge_dedup,
    top_k,
)
from onetable_spark.operators.skew import salted_groupby, salted_join
from onetable_spark.operators.temporal import asof_join, banded_range_join

__all__ = [
    "files_diff",
    "filter_commits_to_sync",
    "group_files_by_partition",
    "latest_instant",
    "max_agg",
    "min_over_group",
    "regroup_stats_per_file",
    "sorted_merge_dedup",
    "top_k",
    "asof_join",
    "banded_range_join",
    "salted_groupby",
    "salted_join",
]
