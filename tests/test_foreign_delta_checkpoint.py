"""Foreign Delta CHECKPOINT conformance: the classic checkpoint parquet is
hand-authored with pyarrow straight from the public Delta protocol spec
(PROTOCOL.md §Checkpoints — one row per action, nullable top-level action
structs, spec column names incl. fields our reader ignores: txn,
dataChange, tags, remove.deletionTimestamp), the pre-checkpoint commit
JSONs are DELETED (log retention), and the native DeltaLog must rebuild
the exact snapshot THROUGH the foreign checkpoint: until r10 every
checkpoint byte the reader parsed had been produced by its own writer."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from onetable_spark.formats.delta import DeltaLog

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "r_regionkey", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "r_name", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _checkpoint_schema() -> pa.schema:
    """The classic checkpoint parquet schema from the protocol spec (the
    subset a COW table materializes; every action column nullable)."""
    str_map = pa.map_(pa.string(), pa.string())
    return pa.schema(
        [
            ("txn", pa.struct([("appId", pa.string()), ("version", pa.int64()),
                               ("lastUpdated", pa.int64())])),
            ("add", pa.struct([
                ("path", pa.string()),
                ("partitionValues", str_map),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
                ("stats", pa.string()),
                ("tags", str_map),
            ])),
            ("remove", pa.struct([
                ("path", pa.string()),
                ("deletionTimestamp", pa.int64()),
                ("dataChange", pa.bool_()),
            ])),
            ("metaData", pa.struct([
                ("id", pa.string()),
                ("name", pa.string()),
                ("description", pa.string()),
                ("format", pa.struct([("provider", pa.string()),
                                      ("options", str_map)])),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", str_map),
                ("createdTime", pa.int64()),
            ])),
            ("protocol", pa.struct([("minReaderVersion", pa.int32()),
                                    ("minWriterVersion", pa.int32())])),
        ]
    )


def _stats(n: int, min_k: int, max_k: int) -> str:
    return json.dumps(
        {
            "numRecords": n,
            "minValues": {"r_regionkey": min_k},
            "maxValues": {"r_regionkey": max_k},
            "nullCount": {"r_regionkey": 0},
        }
    )


@pytest.fixture()
def foreign_checkpoint_table(spark, sf_dir, tmp_path):
    """Table history: v0 init, v1 add A+B, v2 remove B + add C,
    checkpoint at v2 (hand-authored), commits 0-2 deleted, v3 adds D.
    Live set at latest: A, C, D."""
    base = str(tmp_path / "fckpt")
    log_dir = os.path.join(base, "_delta_log")
    os.makedirs(log_dir)
    src = os.path.join(sf_dir, "region.parquet")
    for name in ("A.parquet", "B.parquet", "C.parquet", "D.parquet"):
        shutil.copy(src, os.path.join(base, name))

    meta = {
        "id": "11111111-2222-3333-4444-555555555555",
        "name": None,
        "description": None,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": SCHEMA_STRING,
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1700000000000,
    }
    proto = {"minReaderVersion": 1, "minWriterVersion": 2}

    def add(name, n, lo, hi):
        return {"path": name, "partitionValues": {}, "size": 1828,
                "modificationTime": 1700000000000, "dataChange": True,
                "stats": _stats(n, lo, hi), "tags": None}

    # commit JSONs 0-2 exist only long enough to be checkpointed; the
    # checkpoint rows below are authored directly (pyarrow), not replayed
    rows = [
        {"txn": None, "add": None, "remove": None, "metaData": meta, "protocol": None},
        {"txn": None, "add": None, "remove": None, "metaData": None, "protocol": proto},
        {"txn": {"appId": "writer-1", "version": 7, "lastUpdated": 1700000001000},
         "add": None, "remove": None, "metaData": None, "protocol": None},
        {"txn": None, "add": add("A.parquet", 5, 0, 4), "remove": None,
         "metaData": None, "protocol": None},
        {"txn": None, "add": add("C.parquet", 5, 0, 4), "remove": None,
         "metaData": None, "protocol": None},
        {"txn": None, "add": None,
         "remove": {"path": "B.parquet", "deletionTimestamp": 1700000002000,
                    "dataChange": True},
         "metaData": None, "protocol": None},
    ]
    table = pa.Table.from_pylist(rows, schema=_checkpoint_schema())
    pq.write_table(table, os.path.join(log_dir, f"{2:020d}.checkpoint.parquet"))
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": 2, "size": len(rows)}, f)

    # post-checkpoint commit the replay must union on top
    with open(os.path.join(log_dir, f"{3:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {"timestamp": 1700000003000,
                                           "operation": "WRITE"}}) + "\n")
        f.write(json.dumps({"add": add("D.parquet", 5, 0, 4)}) + "\n")
    return base


def test_snapshot_through_foreign_checkpoint(spark, foreign_checkpoint_table):
    log = DeltaLog(spark, foreign_checkpoint_table)
    files = {os.path.basename(r["path"]): r for r in log.snapshot_files().collect()}
    assert set(files) == {"A.parquet", "C.parquet", "D.parquet"}  # B removed
    for r in files.values():
        assert r["record_count"] == 5
        stats = {s["field"]: s for s in r["column_stats"]}
        assert stats["r_regionkey"]["min_value"] == "0"
        assert stats["r_regionkey"]["max_value"] == "4"


def test_metadata_and_protocol_from_foreign_checkpoint(spark, foreign_checkpoint_table):
    """With commits 0-2 gone, metaData + protocol must come from the
    checkpoint's pyarrow-authored rows."""
    log = DeltaLog(spark, foreign_checkpoint_table)
    info = log.snapshot_info()
    assert info.protocol == {"minReaderVersion": 1, "minWriterVersion": 2}
    desc = log.table_descriptor()
    assert [f.name for f in desc.read_schema.fields] == ["r_regionkey", "r_name"]


def test_foreign_checkpoint_syncs_into_iceberg(spark, foreign_checkpoint_table):
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import TableFormat
    from onetable_spark.sync import SyncClient, source_for, target_for

    base = foreign_checkpoint_table
    results = SyncClient(spark).sync(
        source_for(spark, TableFormat.DELTA, base),
        [target_for(spark, TableFormat.ICEBERG, base)],
    )
    assert all(r.status.value == "SUCCESS" for r in results.values())
    got = {
        os.path.basename(r["path"]): r["record_count"]
        for r in IcebergTable(spark, base).snapshot_files().collect()
    }
    assert got == {"A.parquet": 5, "C.parquet": 5, "D.parquet": 5}


def _sidecar_schema() -> pa.schema:
    str_map = pa.map_(pa.string(), pa.string())
    return pa.schema(
        [
            ("add", pa.struct([
                ("path", pa.string()),
                ("partitionValues", str_map),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
                ("stats", pa.string()),
            ])),
            ("remove", pa.struct([
                ("path", pa.string()),
                ("deletionTimestamp", pa.int64()),
                ("dataChange", pa.bool_()),
            ])),
        ]
    )


def _v2_main_schema() -> pa.schema:
    str_map = pa.map_(pa.string(), pa.string())
    return pa.schema(
        [
            ("checkpointMetadata", pa.struct([("version", pa.int64()),
                                              ("tags", str_map)])),
            ("sidecar", pa.struct([("path", pa.string()),
                                   ("sizeInBytes", pa.int64()),
                                   ("modificationTime", pa.int64()),
                                   ("tags", str_map)])),
            ("metaData", pa.struct([
                ("id", pa.string()),
                ("format", pa.struct([("provider", pa.string()),
                                      ("options", str_map)])),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", str_map),
                ("createdTime", pa.int64()),
            ])),
            ("protocol", pa.struct([("minReaderVersion", pa.int32()),
                                    ("minWriterVersion", pa.int32()),
                                    ("readerFeatures", pa.list_(pa.string())),
                                    ("writerFeatures", pa.list_(pa.string()))])),
        ]
    )


def test_v2_checkpoint_with_sidecars(spark, sf_dir, tmp_path):
    """A V2 (uuid-named) checkpoint per PROTOCOL.md: the main file holds
    checkpointMetadata + sidecar actions + metaData/protocol (with the
    v2Checkpoint reader feature), the file actions live in
    _delta_log/_sidecars/*.parquet. The replay must resolve the sidecars,
    apply the remove they carry, and union the post-checkpoint commit —
    with commits 0-2 deleted, everything flows through the v2 path."""
    base = str(tmp_path / "v2ckpt")
    log_dir = os.path.join(base, "_delta_log")
    side_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(side_dir)
    src = os.path.join(sf_dir, "region.parquet")
    for name in ("A.parquet", "B.parquet", "C.parquet", "D.parquet"):
        shutil.copy(src, os.path.join(base, name))

    def add(name):
        return {"path": name, "partitionValues": {}, "size": 1828,
                "modificationTime": 1700000000000, "dataChange": True,
                "stats": _stats(5, 0, 4)}

    # two sidecars: adds split across them, plus the remove of B
    pq.write_table(
        pa.Table.from_pylist(
            [{"add": add("A.parquet"), "remove": None},
             {"add": add("C.parquet"), "remove": None}],
            schema=_sidecar_schema(),
        ),
        os.path.join(side_dir, "00000-aaaa.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(
            [{"add": None,
              "remove": {"path": "B.parquet",
                         "deletionTimestamp": 1700000002000,
                         "dataChange": True}}],
            schema=_sidecar_schema(),
        ),
        os.path.join(side_dir, "00001-bbbb.parquet"),
    )
    meta = {
        "id": "22222222-3333-4444-5555-666666666666",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": SCHEMA_STRING,
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1700000000000,
    }
    proto = {"minReaderVersion": 3, "minWriterVersion": 7,
             "readerFeatures": ["v2Checkpoint"],
             "writerFeatures": ["v2Checkpoint"]}
    main_rows = [
        {"checkpointMetadata": {"version": 2, "tags": {}},
         "sidecar": None, "metaData": None, "protocol": None},
        {"checkpointMetadata": None,
         "sidecar": {"path": "00000-aaaa.parquet", "sizeInBytes": 1,
                     "modificationTime": 1700000002000, "tags": {}},
         "metaData": None, "protocol": None},
        {"checkpointMetadata": None,
         "sidecar": {"path": "00001-bbbb.parquet", "sizeInBytes": 1,
                     "modificationTime": 1700000002000, "tags": {}},
         "metaData": None, "protocol": None},
        {"checkpointMetadata": None, "sidecar": None,
         "metaData": meta, "protocol": None},
        {"checkpointMetadata": None, "sidecar": None,
         "metaData": None, "protocol": proto},
    ]
    pq.write_table(
        pa.Table.from_pylist(main_rows, schema=_v2_main_schema()),
        os.path.join(
            log_dir, f"{2:020d}.checkpoint.80a083e8-7026-4e79-81be-64bd76c43a11.parquet"
        ),
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": 2, "size": 3,
                   "v2Checkpoint": True}, f)
    with open(os.path.join(log_dir, f"{3:020d}.json"), "w") as f:
        f.write(json.dumps({"add": {
            "path": "D.parquet", "partitionValues": {}, "size": 1828,
            "modificationTime": 1700000003000, "dataChange": True,
            "stats": _stats(5, 0, 4)}}) + "\n")

    log = DeltaLog(spark, base)
    files = {os.path.basename(r["path"]): r for r in log.snapshot_files().collect()}
    assert set(files) == {"A.parquet", "C.parquet", "D.parquet"}
    assert all(r["record_count"] == 5 for r in files.values())
    info = log.snapshot_info()
    assert info.protocol["readerFeatures"] == ["v2Checkpoint"]
    assert [f.name for f in log.table_descriptor().read_schema.fields] == [
        "r_regionkey", "r_name",
    ]


def test_classic_multipart_checkpoint(spark, sf_dir, tmp_path):
    """Classic MULTI-PART checkpoints ({v}.checkpoint.{i}.{n}.parquet)
    must replay as the union of their parts."""
    base = str(tmp_path / "mpckpt")
    log_dir = os.path.join(base, "_delta_log")
    os.makedirs(log_dir)
    src = os.path.join(sf_dir, "region.parquet")
    for name in ("A.parquet", "B.parquet"):
        shutil.copy(src, os.path.join(base, name))

    meta = {
        "id": "33333333-4444-5555-6666-777777777777",
        "name": None,
        "description": None,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": SCHEMA_STRING,
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1700000000000,
    }
    proto = {"minReaderVersion": 1, "minWriterVersion": 2}

    def add(name):
        return {"path": name, "partitionValues": {}, "size": 1828,
                "modificationTime": 1700000000000, "dataChange": True,
                "stats": _stats(5, 0, 4), "tags": None}

    part1 = [
        {"txn": None, "add": None, "remove": None, "metaData": meta, "protocol": None},
        {"txn": None, "add": None, "remove": None, "metaData": None, "protocol": proto},
        {"txn": None, "add": add("A.parquet"), "remove": None,
         "metaData": None, "protocol": None},
    ]
    part2 = [
        {"txn": None, "add": add("B.parquet"), "remove": None,
         "metaData": None, "protocol": None},
    ]
    for i, rows in ((1, part1), (2, part2)):
        pq.write_table(
            pa.Table.from_pylist(rows, schema=_checkpoint_schema()),
            os.path.join(
                log_dir, f"{1:020d}.checkpoint.{i:010d}.{2:010d}.parquet"
            ),
        )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": 4, "parts": 2}, f)

    log = DeltaLog(spark, base)
    got = {os.path.basename(r["path"]) for r in log.snapshot_files().collect()}
    assert got == {"A.parquet", "B.parquet"}
    assert log.snapshot_info().protocol == proto
