"""Hudi metadata-table column_stats partition (S5 preferred branch).

Reference parity: HudiFileStatsExtractor.java:87-103 prefers the
metadata table's col-stats over parquet footers whenever the table
config advertises the partition. The proof that no footer I/O happens:
the data file is overwritten with garbage after indexing, and stats
still resolve.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from onetable_spark.formats.hudi import HudiTimeline
from onetable_spark.formats.hudi_metadata import HudiMetadataTable
from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
from onetable_spark.sources.parquet_inventory import (
    enrich_missing_stats,
    inventory_from_directory,
)


def _hudi_table(spark, sf_dir, tmp_path, name="mdt"):
    table_path = str(tmp_path / name)
    os.makedirs(table_path)
    shutil.copy(
        os.path.join(sf_dir, "region.parquet"), os.path.join(table_path, "f0.parquet")
    )
    schema = spark.read.parquet(table_path).schema
    tl = HudiTimeline(spark, table_path)
    tl.init_table(
        Table(
            name=name,
            base_path=table_path,
            table_format=TableFormat.HUDI,
            read_schema=schema,
            layout=DataLayoutStrategy.FLAT,
        )
    )
    return table_path, tl, schema


def test_col_stats_resolve_with_unreadable_footers(spark, sf_dir, tmp_path):
    table_path, tl, schema = _hudi_table(spark, sf_dir, tmp_path)
    inv = inventory_from_directory(spark, table_path)
    inv.persist()
    want = {
        (s["field"], s["min_value"], s["max_value"])
        for s in inv.first()["column_stats"]
    }
    tl.commit(adds=inv, schema=schema)
    mdt = HudiMetadataTable(spark, table_path)
    assert not mdt.available()
    mdt.upsert_from_files(inv)
    assert mdt.available()

    # footers become unreadable — any footer fallback would now throw
    data_file = os.path.join(table_path, "f0.parquet")
    with open(data_file, "wb") as f:
        f.write(b"garbage not parquet")

    # externally-written table shape: inventory rows with NULL stats
    bare = spark.createDataFrame(
        [(data_file, "parquet", {})],
        "path string, file_format string, partition_values map<string,string>",
    ).select(
        "path", "file_format", "partition_values",
        F.lit(None).cast("long").alias("size"),
        F.lit(None).cast("long").alias("record_count"),
        F.lit(None).cast("long").alias("last_modified_millis"),
        F.lit(None).cast(inv.schema["column_stats"].dataType).alias("column_stats"),
    )
    out = enrich_missing_stats(bare, table_path=table_path).collect()
    assert len(out) == 1
    got = {
        (s["field"], s["min_value"], s["max_value"]) for s in out[0]["column_stats"]
    }
    assert got == want
    assert out[0]["record_count"] == inv.first()["record_count"]


def test_commit_maintains_index_when_advertised(spark, sf_dir, tmp_path):
    table_path, tl, schema = _hudi_table(spark, sf_dir, tmp_path, name="mdt2")
    inv = inventory_from_directory(spark, table_path)
    tl.commit(adds=inv, schema=schema)
    mdt = HudiMetadataTable(spark, table_path)
    mdt.upsert_from_files(inv)

    # a later commit must keep the index fresh without an explicit upsert
    shutil.copy(
        os.path.join(sf_dir, "region.parquet"), os.path.join(table_path, "f1.parquet")
    )
    from onetable_spark.sources.parquet_inventory import build_inventory

    inv2 = build_inventory(spark, [os.path.join(table_path, "f1.parquet")], root=table_path)
    tl.commit(adds=inv2, schema=schema)
    indexed = (
        spark.read.parquet(mdt.partition_dir).select("rel_path").distinct().collect()
    )
    assert {r["rel_path"] for r in indexed} == {"f0.parquet", "f1.parquet"}


def test_unadvertised_partition_is_ignored(spark, sf_dir, tmp_path):
    """Without the hoodie.properties advertisement the branch must not
    fire, even if stray parquet files sit in the partition dir (mirrors
    the reference's isMetadataPartitionAvailable gate)."""
    table_path, tl, schema = _hudi_table(spark, sf_dir, tmp_path, name="mdt3")
    inv = inventory_from_directory(spark, table_path)
    os.makedirs(os.path.join(table_path, ".hoodie", "metadata", "column_stats"))
    shutil.copy(
        os.path.join(sf_dir, "region.parquet"),
        os.path.join(table_path, ".hoodie", "metadata", "column_stats", "x.parquet"),
    )
    assert not HudiMetadataTable(spark, table_path).available()
    # enrichment falls through to footers and still works
    bare = inv.select("path", "file_format", "partition_values")
    out = enrich_missing_stats(
        bare.withColumn("size", F.lit(None).cast("long"))
        .withColumn("record_count", F.lit(None).cast("long"))
        .withColumn("last_modified_millis", F.lit(None).cast("long"))
        .withColumn("column_stats", F.lit(None).cast(inv.schema["column_stats"].dataType)),
        table_path=table_path,
    ).collect()
    assert out[0]["column_stats"] is not None


def test_identical_basenames_across_partitions_do_not_collide(spark, sf_dir, tmp_path):
    """The index keys on the table-root-relative path: two partitions with
    identically-named data files keep distinct stats rows."""
    table_path = str(tmp_path / "mdt4")
    for part in ("day=a", "day=b"):
        os.makedirs(os.path.join(table_path, part))
        shutil.copy(
            os.path.join(sf_dir, "region.parquet"),
            os.path.join(table_path, part, "part-00000.parquet"),
        )
    inv = inventory_from_directory(spark, table_path)
    assert inv.count() == 2
    mdt = HudiMetadataTable(spark, table_path)
    os.makedirs(os.path.join(table_path, ".hoodie"), exist_ok=True)
    open(mdt.props_path, "a").close()
    mdt.upsert_from_files(inv)
    out = enrich_missing_stats(
        inv.select("path", "file_format", "partition_values")
        .withColumn("size", F.lit(None).cast("long"))
        .withColumn("record_count", F.lit(None).cast("long"))
        .withColumn("last_modified_millis", F.lit(None).cast("long"))
        .withColumn("column_stats", F.lit(None).cast(inv.schema["column_stats"].dataType)),
        table_path=table_path,
    ).collect()
    assert len(out) == 2
    assert all(r["column_stats"] is not None and r["record_count"] == 5 for r in out)
    paths = {r["path"] for r in out}
    assert len(paths) == 2
