"""Position deletes INTO Hudi as HoodieLogFormat DELETE blocks (r12) —
the third edge of the cross-format delete triangle (Delta↔Iceberg landed
in r11). An Iceberg v2 MoR source's position deletes become per-file-group
DELETE log blocks holding the record KEYS read at the deleted positions;
the deltacommit stats carry numDeletes so the realtime view nets exactly
those rows, verify_log_stats recounts them from bytes, and a key-merge
over the base parquet (what a real Hudi MOR reader does) reproduces the
Iceberg reader's surviving rows. The reference never writes or reads log
files at all (HudiDataFileExtractor.java:344-363 base files only)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from onetable_spark.formats.hudi import HudiTimeline
from onetable_spark.formats.hudi_log import (
    delete_block_records,
    read_log_blocks,
    write_delete_log_block,
)
from onetable_spark.formats.iceberg import IcebergTable
from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
from onetable_spark.sources.parquet_inventory import build_inventory
from onetable_spark.sync.client import sync_iceberg_deletes_to_hudi_logs

_REAL_DELETE_LOG = (
    "/root/reference/demo/data/db/hudi_dimCustomer/.hoodie/metadata/files/"
    ".files-0000-0_00000000000000010.log.1_0-0-0"
)


@pytest.mark.skipif(
    not os.path.exists(_REAL_DELETE_LOG), reason="reference demo fixture absent"
)
def test_delete_block_writer_matches_real_hudi_bytes(tmp_path):
    """Byte-for-byte conformance: our DELETE block writer with an empty
    record list reproduces the reference's REAL Hudi-0.14 delete log file
    exactly (same instant header) — the strongest possible pin that the
    V3 content layout (version int, payload length, Avro
    HoodieDeleteRecordList datum) and the block framing are right."""
    ours = str(tmp_path / "delete.log")
    write_delete_log_block(ours, [], "00000000000000010", append=False)
    with open(ours, "rb") as f1, open(_REAL_DELETE_LOG, "rb") as f2:
        assert f1.read() == f2.read()


@pytest.fixture()
def mor_clone(spark, sf_dir, tmp_path):
    """A fresh copy of the foreign MoR fixture (module-scoped fixtures
    must not be mutated by a Hudi sync)."""
    from tools.foreign_iceberg import add_position_deletes, write_foreign_iceberg_table

    base = str(tmp_path / "mor_src")
    os.makedirs(base)
    truth = write_foreign_iceberg_table(
        spark, base, os.path.join(sf_dir, "region.parquet")
    )
    truth = add_position_deletes(spark, base, truth)
    return base, truth


def test_iceberg_pos_deletes_translate_to_hudi_delete_logs(spark, mor_clone):
    base, truth = mor_clone
    n_del = len(truth["deleted_from_b"])
    instant = sync_iceberg_deletes_to_hudi_logs(spark, base)
    assert instant is not None

    tl = HudiTimeline(spark, base)
    # the default view must REFUSE — unmerged delete logs exist and a
    # base-file read would resurrect the deleted rows silently
    with pytest.raises(ValueError, match="unmerged log"):
        tl.snapshot_files().collect()
    # read_optimized = RAW physical counts (caller accepted staleness)
    ro = {
        os.path.basename(r["path"]): r["record_count"]
        for r in tl.snapshot_files(view="read_optimized").collect()
    }
    assert ro == {
        "A.parquet": truth["A.parquet"]["rows"],
        "B.parquet": truth["B.parquet"]["rows"],
    }
    # realtime = the DELETE blocks netted — exactly the Iceberg reader's
    rt = {
        os.path.basename(r["path"]): r["record_count"]
        for r in tl.snapshot_files(view="realtime").collect()
    }
    assert rt == {
        "A.parquet": truth["A.parquet"]["rows"],
        "B.parquet": truth["b_rows_net"],
    }

    # trust-but-verify: the byte plane recounts the stat's numDeletes
    checks = tl.verify_log_stats().collect()
    assert len(checks) == 1
    c = checks[0]
    assert c["log_ok"] is True
    assert c["decoded_deletes"] == c["stat_num_deletes"] == n_del
    assert c["decoded_records"] == c["stat_num_writes"] == 0

    # the DELETE block carries exactly the odd r_regionkey values (the
    # fixture's delete set) as SimpleKeyGenerator string keys
    log_path = c["path"]
    blocks = read_log_blocks(log_path)
    assert [b["type"] for b in blocks] == ["delete"]
    assert blocks[0]["headers"]["instant_time"] == instant
    _, records = delete_block_records(blocks[0])
    import pyarrow.parquet as pq

    b_keys = pq.read_table(
        os.path.join(base, "data", "B.parquet"), columns=["r_regionkey"]
    )["r_regionkey"].to_pylist()
    expected_keys = sorted(str(k) for k in b_keys if k % 2 == 1)
    assert sorted(r["recordKey"] for r in records) == expected_keys
    assert all(r["partitionPath"] == "" for r in records)

    # data-plane equivalence (checkDatasetEquivalence bar): merging the
    # DELETE block by key over the base parquet — what a real Hudi MOR
    # reader does — reproduces the Iceberg reader's surviving rows
    key_df = spark.createDataFrame(
        [(r["recordKey"],) for r in records], "k string"
    )
    merged = (
        spark.read.parquet(
            os.path.join(base, "data", "A.parquet"),
            os.path.join(base, "data", "B.parquet"),
        )
        .join(
            key_df,
            F.col("r_regionkey").cast("string") == F.col("k"),
            "left_anti",
        )
    )
    survivors = sorted(r["r_regionkey"] for r in merged.collect())
    expected = sorted(
        [k for k in b_keys if k % 2 == 0]
        + pq.read_table(
            os.path.join(base, "data", "A.parquet"), columns=["r_regionkey"]
        )["r_regionkey"].to_pylist()
    )
    assert survivors == expected


def test_delete_logs_refuse_without_record_keys(spark, sf_dir, tmp_path):
    """A keyless table cannot express a DELETE block — loud refusal, not
    a fabricated key."""
    base = str(tmp_path / "keyless")
    os.makedirs(base)
    f1 = os.path.join(base, "f1.parquet")
    shutil.copy(os.path.join(sf_dir, "region.parquet"), f1)
    schema = spark.read.parquet(base).schema
    tl = HudiTimeline(spark, base)
    tl.init_table(
        Table(name="keyless", base_path=base, table_format=TableFormat.HUDI,
              read_schema=schema, layout=DataLayoutStrategy.FLAT)
    )
    tl.commit(adds=build_inventory(spark, [f1], root=base))
    positions = spark.createDataFrame([(f1, 0)], "path string, pos long")
    with pytest.raises(ValueError, match="no record-key fields"):
        tl.commit_delete_logs(positions)


def test_delete_logs_refuse_dangling_positions(spark, sf_dir, tmp_path):
    base = str(tmp_path / "dangle")
    os.makedirs(base)
    f1 = os.path.join(base, "f1.parquet")
    shutil.copy(os.path.join(sf_dir, "region.parquet"), f1)
    schema = spark.read.parquet(base).schema
    tl = HudiTimeline(spark, base)
    tl.init_table(
        Table(name="dangle", base_path=base, table_format=TableFormat.HUDI,
              read_schema=schema, layout=DataLayoutStrategy.FLAT,
              record_key_fields=("r_regionkey",))
    )
    tl.commit(adds=build_inventory(spark, [f1], root=base))
    positions = spark.createDataFrame(
        [(os.path.join(base, "nope.parquet"), 0)], "path string, pos long"
    )
    with pytest.raises(ValueError, match="match no live base file group"):
        tl.commit_delete_logs(positions)


def test_second_translation_bumps_log_version(spark, sf_dir, tmp_path):
    """A second delete wave against the same file group must append a
    NEW log file (.log.2), never clobber the first block."""
    base = str(tmp_path / "twice")
    os.makedirs(base)
    f1 = os.path.join(base, "f1.parquet")
    shutil.copy(os.path.join(sf_dir, "region.parquet"), f1)
    schema = spark.read.parquet(base).schema
    tl = HudiTimeline(spark, base)
    tl.init_table(
        Table(name="twice", base_path=base, table_format=TableFormat.HUDI,
              read_schema=schema, layout=DataLayoutStrategy.FLAT,
              record_key_fields=("r_regionkey",))
    )
    tl.commit(adds=build_inventory(spark, [f1], root=base))
    n = spark.read.parquet(f1).count()
    tl.commit_delete_logs(
        spark.createDataFrame([(f1, 0)], "path string, pos long")
    )
    tl.commit_delete_logs(
        spark.createDataFrame([(f1, 1), (f1, 2)], "path string, pos long")
    )
    logs = sorted(f for f in os.listdir(base) if ".log." in f)
    assert len(logs) == 2
    assert any(".log.1_" in f for f in logs) and any(".log.2_" in f for f in logs)
    rt = tl.snapshot_files(view="realtime").collect()
    assert rt[0]["record_count"] == n - 3
    checks = tl.verify_log_stats().collect()
    assert all(c["log_ok"] for c in checks)
