"""r13 hardening regressions (ADVICE r12 items).

- publish_branch refuses non-fast-forward publishes (main advanced past
  the branch base) unless force=True — real Iceberg fast_forward parity.
- properties/expiry-only commit_overwrite mints NO snapshot
  (UpdateProperties / expireSnapshots parity).
- the equality-delete upsert commit path hits the same 100-manifest
  guard as the append path.
- purge_deletion_vectors on a PARTITIONED table writes the replacement
  next to its source and carries the source add's partitionValues.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from onetable_spark.formats.delta import DeltaLog
from onetable_spark.formats.iceberg import IcebergTable
from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
from onetable_spark.sources.parquet_inventory import build_inventory


def _init_iceberg(spark, base, schema, format_version=1):
    ice = IcebergTable(spark, base)
    ice.init_table(
        Table(name="t", base_path=base, table_format=TableFormat.ICEBERG,
              read_schema=schema, layout=DataLayoutStrategy.FLAT),
        format_version=format_version,
    )
    return ice


def test_publish_branch_refuses_non_fast_forward(spark, sf_dir, tmp_path):
    base = str(tmp_path / "ff")
    os.makedirs(base)
    src = os.path.join(sf_dir, "region.parquet")
    shutil.copy(src, os.path.join(base, "f1.parquet"))
    schema = spark.read.parquet(src).schema
    ice = _init_iceberg(spark, base, schema)
    ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base)
    )

    # stage a branch off the current main
    shutil.copy(src, os.path.join(base, "f2.parquet"))
    staged = ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(base, "f2.parquet")], root=base),
        branch="audit",
    )

    # main ADVANCES with a real data commit → the branch head no longer
    # descends from main → fast-forward must refuse
    shutil.copy(src, os.path.join(base, "f3.parquet"))
    ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(base, "f3.parquet")], root=base)
    )
    with pytest.raises(ValueError, match="not an ancestor"):
        ice.publish_branch("audit")
    # the deliberate override still works (cherry-pick-style replace)
    assert ice.publish_branch("audit", force=True) == staged
    assert ice.metadata()["current-snapshot-id"] == staged


def test_properties_only_commit_mints_no_snapshot(spark, sf_dir, tmp_path):
    base = str(tmp_path / "props")
    os.makedirs(base)
    src = os.path.join(sf_dir, "region.parquet")
    shutil.copy(src, os.path.join(base, "f1.parquet"))
    schema = spark.read.parquet(src).schema
    ice = _init_iceberg(spark, base, schema)
    snap = ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base)
    )
    n_before = len(ice.metadata()["snapshots"])
    returned = ice.commit_overwrite(properties={"touch": "1"})
    md = ice.metadata()
    assert returned == snap  # the still-current snapshot id
    assert len(md["snapshots"]) == n_before  # no snapshot minted
    assert md["current-snapshot-id"] == snap
    assert md["properties"]["touch"] == "1"
    # ...and a WAP publish still fast-forwards across the touch commit
    shutil.copy(src, os.path.join(base, "f2.parquet"))
    staged = ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(base, "f2.parquet")], root=base),
        branch="audit",
    )
    ice.commit_overwrite(properties={"touch": "2"})
    assert ice.publish_branch("audit") == staged


def test_upsert_commit_path_has_manifest_guard(spark, sf_dir, tmp_path):
    from onetable_spark.formats.avro_codec import read_container

    base = str(tmp_path / "guard")
    os.makedirs(base)
    src = os.path.join(sf_dir, "region.parquet")
    shutil.copy(src, os.path.join(base, "f1.parquet"))
    schema = spark.read.parquet(src).schema
    ice = _init_iceberg(spark, base, schema, format_version=2)
    ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base)
    )
    # inflate the CARRIED manifest list to the guard by editing the
    # current snapshot's manifest list (cheaper than 100 real commits)
    md = ice.metadata()
    snap = ice.current_snapshot_meta(md)
    from onetable_spark.formats.avro_codec import write_container
    from onetable_spark.formats.iceberg import MANIFEST_LIST_SCHEMA_V2

    _, manifests = read_container(snap["manifest-list"])
    write_container(
        snap["manifest-list"], MANIFEST_LIST_SCHEMA_V2, manifests * 100
    )
    shutil.copy(src, os.path.join(base, "f2.parquet"))
    up_adds = build_inventory(
        spark, [os.path.join(base, "f2.parquet")], root=base
    )
    with pytest.raises(ValueError, match="manifest guard"):
        ice.commit_upsert(up_adds, key_fields=["r_regionkey"])


def test_purge_dv_on_partitioned_table_carries_partition_values(spark, tmp_path):
    base = str(tmp_path / "pdv")
    os.makedirs(base)
    df = spark.createDataFrame(
        [(i, "a" if i < 5 else "b", f"row{i}") for i in range(10)],
        "id long, part string, payload string",
    )
    # hive-partitioned physical layout, ONE file per partition dir (the
    # purge must produce a replacement, so the DV'd file needs survivors)
    df.coalesce(1).write.partitionBy("part").parquet(base, mode="overwrite")
    data_files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(base)
        for f in fs
        if f.endswith(".parquet") and not dp.endswith("_delta_log")
    )
    from onetable_spark.model import PartitionField

    log = DeltaLog(spark, base)
    schema = spark.read.parquet(base).schema
    log.init_table(
        Table(name="pdv", base_path=base, table_format=TableFormat.DELTA,
              read_schema=schema,
              layout=DataLayoutStrategy.HIVE_STYLE_PARTITION,
              partition_fields=(PartitionField(source_field="part"),)),
    )
    adds = build_inventory(spark, data_files, root=base, partition_cols=["part"])
    log.commit(adds=adds)
    # attach a DV that kills id=7 (partition b): find the physical file
    # holding it and its row position within that file
    import pyarrow.parquet as pq

    target, dead_pos = None, None
    for p in data_files:
        if "part=b" not in p:
            continue
        ids = pq.read_table(p, columns=["id"])["id"].to_pylist()
        if 7 in ids:
            target, dead_pos = p, ids.index(7)
            break
    assert target is not None
    positions = spark.createDataFrame([(target, int(dead_pos))], "path string, pos long")
    dv_adds = build_inventory(spark, [target], root=base, partition_cols=["part"])
    log.commit(adds=dv_adds, deletion_vectors=positions)

    v = log.purge_deletion_vectors()
    assert v is not None
    # the purged replacement must live inside part=b/ and its add must
    # carry partitionValues {part: b} — a root-level add with {} vanishes
    # from partition-filtered scans
    with open(os.path.join(base, "_delta_log", f"{v:020d}.json")) as f:
        actions = [json.loads(line) for line in f]
    new_adds = [a["add"] for a in actions if "add" in a]
    assert len(new_adds) == 1
    assert "part=b" in new_adds[0]["path"]
    assert new_adds[0]["partitionValues"] == {"part": "b"}
    # and the table still reads correctly partition-filtered
    files = log.snapshot_files()
    b_files = files.where(F.col("partition_values")["part"] == "b")
    assert b_files.count() == 1
    total = sum(r["record_count"] for r in files.collect())
    assert total == 9  # 10 rows minus the purged one
