"""Unit tests for the G1-G13 relational operator library (SURVEY §2.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from onetable_spark.operators import (
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


def make_files(spark, rows):
    return spark.createDataFrame(rows, "path string, partition_values string, size long")


def test_files_diff_added_removed(spark):
    src = make_files(spark, [("a", "p1", 1), ("b", "p1", 2), ("c", "p2", 3)])
    tgt = make_files(spark, [("b", "p1", 2), ("d", "p2", 4)])
    added, removed = files_diff(src, tgt)
    assert {r.path for r in added.collect()} == {"a", "c"}
    assert {r.path for r in removed.collect()} == {"d"}


def test_files_diff_identical_is_empty(spark):
    src = make_files(spark, [("a", "p1", 1)])
    added, removed = files_diff(src, src)
    assert added.count() == 0 and removed.count() == 0


def test_group_files_by_partition(spark):
    files = make_files(spark, [("a", "p1", 10), ("b", "p1", 20), ("c", "p2", 5)])
    grouped = {r.partition_values: r for r in group_files_by_partition(files).collect()}
    assert grouped["p1"].num_files == 2 and grouped["p1"].total_size == 30
    assert grouped["p2"].num_files == 1


def test_sorted_merge_dedup(spark):
    a = spark.createDataFrame([(1,), (3,), (5,)], "instant int")
    b = spark.createDataFrame([(3,), (4,)], "instant int")
    merged = sorted_merge_dedup(a, b, ["instant"]).collect()
    assert [r.instant for r in merged] == [1, 3, 4, 5]


def test_min_max_aggs(spark):
    df = spark.createDataFrame([("t1", 5), ("t1", 2), ("t2", 9)], "fmt string, v int")
    assert min_over_group(df, "v").collect()[0]["min_v"] == 2
    by_group = {r.fmt: r["max_v"] for r in max_agg(df, "v", ["fmt"]).collect()}
    assert by_group == {"t1": 5, "t2": 9}


def test_filter_commits_to_sync(spark):
    commits = spark.createDataFrame([(1,), (2,), (3,), (4,)], "instant int")
    out = filter_commits_to_sync(commits, F.lit(2), pending=[1])
    assert {r.instant for r in out.collect()} == {1, 3, 4}


def test_regroup_stats_per_file(spark):
    stats = spark.createDataFrame(
        [("f1", "a", 1), ("f1", "b", 2), ("f2", "a", 3)], "path string, col string, mn int"
    )
    rows = {r.path: r.column_stats for r in regroup_stats_per_file(stats).collect()}
    assert len(rows["f1"]) == 2 and len(rows["f2"]) == 1


def test_latest_instant_and_top_k(spark):
    df = spark.createDataFrame([(1, "a"), (9, "b"), (5, "c")], "ts int, act string")
    assert latest_instant(df, "ts").collect()[0].act == "b"
    assert [r.ts for r in top_k(df, "ts", 2).collect()] == [9, 5]
