"""r13 large-commit write paths: the distributed (executor-side)
serializers must produce byte-equivalent commit artifacts to the small
driver paths.

Mega-commit profile (BASELINE.md r13): the Iceberg driver avro writer
and the Hudi per-row uuid5/dict/json loop were the 1M-entry commit
walls. Large adds now serialize on executors — sharded ADDED manifests
(Iceberg) and mapInArrow stat strings (Hudi). These tests force the
large path at tiny sizes via the module thresholds and compare against
the unforced driver path run on an identical inventory.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

import onetable_spark.formats.hudi as hudi_mod
import onetable_spark.formats.iceberg as ice_mod
from onetable_spark.formats.hudi import HudiTimeline
from onetable_spark.formats.iceberg import IcebergTable
from onetable_spark.model import FILES_SCHEMA, Table, TableFormat


def _fabricated(spark, root, n):
    return (
        spark.range(n)
        .select(
            F.concat(
                F.lit(f"{root}/p="), (F.col("id") % 7).cast("string"),
                F.lit("/f"), F.col("id").cast("string"), F.lit(".parquet"),
            ).alias("path"),
            F.lit("parquet").alias("file_format"),
            F.create_map(F.lit("p"), (F.col("id") % 7).cast("string")).alias(
                "partition_values"
            ),
            F.lit(1024).cast("long").alias("size"),
            F.lit(10).cast("long").alias("record_count"),
            F.lit(0).cast("long").alias("last_modified_millis"),
            F.lit(None).cast(FILES_SCHEMA["column_stats"].dataType).alias(
                "column_stats"
            ),
        )
    )


_SCHEMA = T.StructType([T.StructField("id", T.LongType())])


def test_iceberg_sharded_added_manifests_equal_driver_path(
    spark, tmp_path, monkeypatch
):
    roots = [str(tmp_path / "small"), str(tmp_path / "sharded")]
    inventories = {}
    for root, shard in zip(roots, (False, True)):
        os.makedirs(root)
        if shard:
            # force the distributed path: 40-entry shards for 200 files
            monkeypatch.setattr(ice_mod, "_MANIFEST_SHARD_ENTRIES", 40)
        else:
            monkeypatch.setattr(ice_mod, "_MANIFEST_SHARD_ENTRIES", 100_000)
        ice = IcebergTable(spark, root)
        ice.init_table(
            Table(name="t", base_path=root, table_format=TableFormat.ICEBERG,
                  read_schema=_SCHEMA)
        )
        ice.commit_overwrite(adds=_fabricated(spark, root, 200))
        files = ice.snapshot_files()
        inventories[root] = sorted(
            (r["path"].replace(root, ""), r["record_count"], r["size"],
             dict(r["partition_values"] or {}))
            for r in files.collect()
        )
        if shard:
            from onetable_spark.formats.avro_codec import read_container

            _, ml = read_container(ice.current_snapshot_meta()["manifest-list"])
            assert len(ml) >= 5  # 200 entries / 40 per shard
            assert sum(m["added_data_files_count"] for m in ml) == 200
            assert all(m["existing_data_files_count"] == 0 for m in ml)
        # incremental readers key on added_snapshot_id: the change scan
        # must see every file as ADDED in this snapshot either way
        snap = ice.current_snapshot_meta()
        changed = ice.changes_for_snapshot(snap["snapshot-id"])
        assert changed.diff.added.count() == 200
    assert inventories[roots[0]] == inventories[roots[1]]


def test_hudi_distributed_stats_equal_driver_path(spark, tmp_path, monkeypatch):
    payloads = {}
    for mode, threshold in (("driver", 100_000), ("distributed", 10)):
        root = str(tmp_path / mode)
        os.makedirs(root)
        monkeypatch.setattr(hudi_mod, "_STATS_DISTRIBUTE_THRESHOLD", threshold)
        h = HudiTimeline(spark, root)
        h.init_table(
            Table(name="t", base_path=root, table_format=TableFormat.HUDI,
                  read_schema=_SCHEMA)
        )
        instant = h.commit(adds=_fabricated(spark, root, 150))
        with open(os.path.join(root, ".hoodie", f"{instant}.commit")) as f:
            doc = json.load(f)
        # normalize: root-independent, order-independent within partition
        payloads[mode] = {
            pp: sorted(
                json.dumps({**s, "path": s["path"]}, sort_keys=True)
                for s in stats
            )
            for pp, stats in doc["partitionToWriteStats"].items()
        }
        assert h.snapshot_files().count() == 150
    assert payloads["driver"] == payloads["distributed"]


def test_iceberg_snapshot_summary_metrics(spark, tmp_path):
    """r13: snapshot summaries carry spec-complete operation metrics
    (added/deleted/total files + records), derived from the manifest-list
    records — external tooling reads total-records off the summary."""
    root = str(tmp_path / "summ")
    os.makedirs(root)
    ice = IcebergTable(spark, root)
    ice.init_table(
        Table(name="t", base_path=root, table_format=TableFormat.ICEBERG,
              read_schema=_SCHEMA)
    )
    ice.commit_overwrite(adds=_fabricated(spark, root, 5))
    s1 = ice.current_snapshot_meta()["summary"]
    assert (s1["operation"], s1["added-data-files"], s1["added-records"]) == (
        "append", "5", "50",
    )
    assert (s1["total-data-files"], s1["total-records"]) == ("5", "50")

    # append 3 more via the fast path (prior manifest carried verbatim)
    more = _fabricated(spark, root, 8).where("path like '%f7.parquet' or path like '%f6.parquet' or path like '%f5.parquet'")
    ice.commit_overwrite(adds=more)
    s2 = ice.current_snapshot_meta()["summary"]
    assert (s2["added-data-files"], s2["added-records"]) == ("3", "30")
    assert (s2["total-data-files"], s2["total-records"]) == ("8", "80")

    # remove one file (partition-scoped overwrite): deleted metrics move,
    # totals drop by exactly the removed file
    victim = ice.snapshot_files().select("path").limit(1)
    ice.commit_overwrite(removes=victim)
    s3 = ice.current_snapshot_meta()["summary"]
    assert s3["operation"] == "overwrite"
    assert (s3["deleted-data-files"], s3["deleted-records"]) == ("1", "10")
    assert (s3["total-data-files"], s3["total-records"]) == ("7", "70")
