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
]
