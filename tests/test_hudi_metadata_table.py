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
        spark.read.parquet(mdt._data_dir()).select("rel_path").distinct().collect()
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


def test_upsert_serialized_by_lock_and_versioned_swap(spark, sf_dir, tmp_path):
    """ADVICE r4: the index rewrite is serialized by an O_EXCL lock and
    published via an atomically-replaced _CURRENT pointer, so a holder
    blocks a second writer (no lost update) and readers never see a
    missing directory — the replaced version survives one generation."""
    import pytest

    table_path, tl, schema = _hudi_table(spark, sf_dir, tmp_path, name="mdt5")
    inv = inventory_from_directory(spark, table_path)
    mdt = HudiMetadataTable(spark, table_path)
    mdt.upsert_from_files(inv)
    assert os.path.basename(mdt._data_dir()) == "v_000001"

    # a held lock blocks a second writer until released
    lock = mdt._acquire_lock()
    with pytest.raises(TimeoutError):
        mdt._acquire_lock(timeout=0.3)
    os.unlink(lock)

    # second upsert: new version published, previous retained one generation
    mdt.upsert_from_files(inv)
    assert os.path.basename(mdt._data_dir()) == "v_000002"
    assert os.path.isdir(os.path.join(mdt.partition_dir, "v_000001"))
    # third upsert: v1 (two generations back) is retired, v2 retained
    mdt.upsert_from_files(inv)
    assert os.path.basename(mdt._data_dir()) == "v_000003"
    assert not os.path.isdir(os.path.join(mdt.partition_dir, "v_000001"))
    assert os.path.isdir(os.path.join(mdt.partition_dir, "v_000002"))
    assert mdt.available()


def test_upsert_merges_rows_written_between_plans(spark, sf_dir, tmp_path):
    """Lost-update fix: the prior index is re-read INSIDE the lock, so
    rows published by a writer that ran after this writer built its plan
    still survive the merge."""
    table_path, tl, schema = _hudi_table(spark, sf_dir, tmp_path, name="mdt6")
    inv = inventory_from_directory(spark, table_path)
    mdt = HudiMetadataTable(spark, table_path)
    mdt.upsert_from_files(inv)

    shutil.copy(
        os.path.join(sf_dir, "region.parquet"), os.path.join(table_path, "f1.parquet")
    )
    from onetable_spark.sources.parquet_inventory import build_inventory

    inv_f1 = build_inventory(spark, [os.path.join(table_path, "f1.parquet")], root=table_path)
    shutil.copy(
        os.path.join(sf_dir, "region.parquet"), os.path.join(table_path, "f2.parquet")
    )
    inv_f2 = build_inventory(spark, [os.path.join(table_path, "f2.parquet")], root=table_path)
    # "concurrent" writers: f2's upsert lands between f1's plan and upsert
    mdt.upsert_from_files(inv_f2)
    mdt.upsert_from_files(inv_f1)
    indexed = (
        spark.read.parquet(mdt._data_dir()).select("rel_path").distinct().collect()
    )
    assert {r["rel_path"] for r in indexed} == {"f0.parquet", "f1.parquet", "f2.parquet"}


def test_legacy_flat_layout_migrates_on_upsert(spark, sf_dir, tmp_path):
    """A partition written by the pre-pointer flat layout stays readable
    and migrates to the versioned layout on the next upsert."""
    table_path, tl, schema = _hudi_table(spark, sf_dir, tmp_path, name="mdt7")
    inv = inventory_from_directory(spark, table_path)
    mdt = HudiMetadataTable(spark, table_path)
    # fabricate the legacy layout: flat parquet directly in partition_dir
    rows = inv.select(
        mdt._rel_path().alias("rel_path"),
        F.col("record_count"),
        F.col("size").alias("file_size"),
        F.col("last_modified_millis"),
        F.explode("column_stats").alias("cs"),
    ).select(
        "rel_path",
        F.col("cs.field").alias("column_name"),
        F.col("cs.min_value").alias("min_value"),
        F.col("cs.max_value").alias("max_value"),
        F.col("cs.num_nulls").cast("long").alias("null_count"),
        F.col("cs.num_values").cast("long").alias("value_count"),
        F.col("cs.total_size").cast("long").alias("total_size"),
        "record_count",
        "file_size",
        "last_modified_millis",
    )
    rows.write.mode("overwrite").parquet(mdt.partition_dir)
    mdt._advertise()
    assert mdt.available() and mdt._data_dir() == mdt.partition_dir

    shutil.copy(
        os.path.join(sf_dir, "region.parquet"), os.path.join(table_path, "f1.parquet")
    )
    from onetable_spark.sources.parquet_inventory import build_inventory

    inv_f1 = build_inventory(spark, [os.path.join(table_path, "f1.parquet")], root=table_path)
    mdt.upsert_from_files(inv_f1)
    # migrated: pointer layout, legacy flat files swept, both rows present
    assert os.path.basename(mdt._data_dir()) == "v_000001"
    assert not any(
        n.endswith(".parquet") for n in os.listdir(mdt.partition_dir)
    )
    indexed = (
        spark.read.parquet(mdt._data_dir()).select("rel_path").distinct().collect()
    )
    assert {r["rel_path"] for r in indexed} == {"f0.parquet", "f1.parquet"}
