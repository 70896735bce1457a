"""An INDEPENDENT Iceberg v2 table author for conformance testing.

Everything this module writes comes from the public Iceberg table spec
(iceberg.apache.org/spec — format-version 2) and the Apache Avro
reference implementation (org.apache.avro on Spark's JVM classpath,
driven through py4j): spec-literal Avro schemas with the spec's field
ids, v2-only fields (content, sequence numbers, file_sequence_number,
nan_value_counts, split_offsets, sort_order_id), deflate-compressed
containers, and a v2 metadata.json with schemas/partition-specs/
sort-orders/snapshot-log sections. NO byte of the metadata it produces
passes through onetable_spark's own codec or writer — reading one of
these tables certifies the repo's Iceberg plane (formats/iceberg.py,
formats/avro_codec.py) on metadata it did not write, the gap VERDICT
r8/r9 called the last self-certification hole (the reference's own
oracle for this is ITOneTableClient.java:716-813: write with engine A,
read with engine B, assert equivalence).

The table shape: unpartitioned `region` (r_regionkey required int +
identifier field, r_name optional string), TWO snapshots —
snapshot 1 appends data file A (r_regionkey < 2), snapshot 2 appends
data file B (r_regionkey >= 2) with manifest 1 carried as EXISTING in a
second manifest — exercising multi-manifest lists, carried entries,
sequence numbers, and true column bounds (Appendix-D little-endian
ints / UTF-8 strings).
"""

from __future__ import annotations

import json
import os
import struct
import uuid

# ----------------------------------------------------- spec-literal schemas

V2_MANIFEST_ENTRY_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"], "default": None, "field-id": 4},
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {"type": "record", "name": "r102", "fields": []},
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                        {"name": "column_sizes", "type": ["null", _kv := {
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k117_v118",
                                "fields": [
                                    {"name": "key", "type": "int", "field-id": 117},
                                    {"name": "value", "type": "long", "field-id": 118},
                                ],
                            },
                            "logicalType": "map",
                        }], "default": None, "field-id": 108},
                        {"name": "value_counts", "type": ["null", {
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k119_v120",
                                "fields": [
                                    {"name": "key", "type": "int", "field-id": 119},
                                    {"name": "value", "type": "long", "field-id": 120},
                                ],
                            },
                            "logicalType": "map",
                        }], "default": None, "field-id": 109},
                        {"name": "null_value_counts", "type": ["null", {
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k121_v122",
                                "fields": [
                                    {"name": "key", "type": "int", "field-id": 121},
                                    {"name": "value", "type": "long", "field-id": 122},
                                ],
                            },
                            "logicalType": "map",
                        }], "default": None, "field-id": 110},
                        {"name": "nan_value_counts", "type": ["null", {
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k138_v139",
                                "fields": [
                                    {"name": "key", "type": "int", "field-id": 138},
                                    {"name": "value", "type": "long", "field-id": 139},
                                ],
                            },
                            "logicalType": "map",
                        }], "default": None, "field-id": 137},
                        {"name": "lower_bounds", "type": ["null", {
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k126_v127",
                                "fields": [
                                    {"name": "key", "type": "int", "field-id": 126},
                                    {"name": "value", "type": "bytes", "field-id": 127},
                                ],
                            },
                            "logicalType": "map",
                        }], "default": None, "field-id": 125},
                        {"name": "upper_bounds", "type": ["null", {
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k129_v130",
                                "fields": [
                                    {"name": "key", "type": "int", "field-id": 129},
                                    {"name": "value", "type": "bytes", "field-id": 130},
                                ],
                            },
                            "logicalType": "map",
                        }], "default": None, "field-id": 128},
                        {"name": "key_metadata", "type": ["null", "bytes"], "default": None, "field-id": 131},
                        {"name": "split_offsets", "type": ["null", {"type": "array", "items": "long", "element-id": 133}], "default": None, "field-id": 132},
                        {"name": "equality_ids", "type": ["null", {"type": "array", "items": "int", "element-id": 136}], "default": None, "field-id": 135},
                        {"name": "sort_order_id", "type": ["null", "int"], "default": None, "field-id": 140},
                    ],
                },
            },
        ],
    }
)

V2_MANIFEST_LIST_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long", "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_files_count", "type": "int", "field-id": 504},
            {"name": "existing_files_count", "type": "int", "field-id": 505},
            {"name": "deleted_files_count", "type": "int", "field-id": 506},
            {"name": "added_rows_count", "type": "long", "field-id": 512},
            {"name": "existing_rows_count", "type": "long", "field-id": 513},
            {"name": "deleted_rows_count", "type": "long", "field-id": 514},
            {
                "name": "partitions",
                "field-id": 507,
                "default": None,
                "type": ["null", {
                    "type": "array",
                    "element-id": 508,
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {"name": "contains_null", "type": "boolean", "field-id": 509},
                            {"name": "contains_nan", "type": ["null", "boolean"], "default": None, "field-id": 518},
                            {"name": "lower_bound", "type": ["null", "bytes"], "default": None, "field-id": 510},
                            {"name": "upper_bound", "type": ["null", "bytes"], "default": None, "field-id": 511},
                        ],
                    },
                }],
            },
            {"name": "key_metadata", "type": ["null", "bytes"], "default": None, "field-id": 519},
        ],
    }
)

ICEBERG_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "identifier-field-ids": [1],
    "fields": [
        {"id": 1, "name": "r_regionkey", "required": True, "type": "int"},
        {"id": 2, "name": "r_name", "required": False, "type": "string"},
    ],
}


def _json_bytes(bs: bytes) -> str:
    """Avro JSON encoding renders bytes as ISO-8859-1 text (one char per
    byte) — the reference jsonDecoder parses this back to the raw bytes."""
    return "".join(chr(b) for b in bs)


def _avro_writer(jvm, schema_json: str, path: str, meta: dict[str, str]):
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    for k, v in meta.items():
        dfw.setMeta(k, v)
    dfw.create(sch, jvm.java.io.File(path))
    return sch, dfw


def _append_json(jvm, sch, dfw, datum: dict) -> None:
    """Build the datum entirely inside the reference implementation: its
    own jsonDecoder parses the Avro-JSON rendering (unions as
    {"type": value} wrappers), so no py4j primitive boxing is involved."""
    decoder = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(
        sch, json.dumps(datum)
    )
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    dfw.append(reader.read(None, decoder))


def _write_manifest(jvm, path: str, entries: list[dict]) -> int:
    """entries: status/snapshot_id/sequence_number + data_file dict with
    file_path/record_count/file_size_in_bytes/bounds (python ints/bytes)."""
    meta = {
        "schema": json.dumps(ICEBERG_SCHEMA),
        "schema-id": "0",
        "partition-spec": "[]",
        "partition-spec-id": "0",
        "format-version": "2",
        "content": "data",
    }
    sch, dfw = _avro_writer(jvm, V2_MANIFEST_ENTRY_SCHEMA, path, meta)
    for e in entries:
        d = e["data_file"]
        n = d["record_count"]
        datum = {
            "status": e["status"],
            "snapshot_id": {"long": e["snapshot_id"]},
            "sequence_number": {"long": e["sequence_number"]},
            "file_sequence_number": {"long": e["sequence_number"]},
            "data_file": {
                "content": 0,  # DATA
                "file_path": d["file_path"],
                "file_format": "PARQUET",
                "partition": {},
                "record_count": n,
                "file_size_in_bytes": d["file_size_in_bytes"],
                "column_sizes": None,
                "value_counts": {"array": [{"key": 1, "value": n}, {"key": 2, "value": n}]},
                "null_value_counts": {"array": [{"key": 1, "value": 0}, {"key": 2, "value": 0}]},
                "nan_value_counts": None,
                "lower_bounds": {"array": [
                    {"key": 1, "value": _json_bytes(struct.pack("<i", d["min_key"]))},
                    {"key": 2, "value": _json_bytes(d["min_name"].encode("utf-8"))},
                ]},
                "upper_bounds": {"array": [
                    {"key": 1, "value": _json_bytes(struct.pack("<i", d["max_key"]))},
                    {"key": 2, "value": _json_bytes(d["max_name"].encode("utf-8"))},
                ]},
                "key_metadata": None,
                "split_offsets": {"array": [4]},
                "equality_ids": None,
                "sort_order_id": {"int": 0},
            },
        }
        _append_json(jvm, sch, dfw, datum)
    dfw.close()
    return os.path.getsize(path)


def _write_manifest_list(jvm, path: str, manifests: list[dict]) -> None:
    sch, dfw = _avro_writer(
        jvm, V2_MANIFEST_LIST_SCHEMA, path, {"format-version": "2"}
    )
    for m in manifests:
        _append_json(jvm, sch, dfw, {
            "manifest_path": m["manifest_path"],
            "manifest_length": m["manifest_length"],
            "partition_spec_id": 0,
            "content": m.get("content", 0),  # 0 = data, 1 = deletes
            "sequence_number": m["sequence_number"],
            "min_sequence_number": m["min_sequence_number"],
            "added_snapshot_id": m["added_snapshot_id"],
            "added_files_count": m["added"],
            "existing_files_count": m["existing"],
            "deleted_files_count": 0,
            "added_rows_count": m["added_rows"],
            "existing_rows_count": m["existing_rows"],
            "deleted_rows_count": 0,
            "partitions": {"array": []},  # unpartitioned
            "key_metadata": None,
        })
    dfw.close()


def _write_delete_manifest(jvm, path: str, entries: list[dict]) -> int:
    """A DELETE manifest (avro meta content=deletes): entries reference
    position- or equality-delete FILES via data_file.content 1/2 (spec
    §Manifests). Bounds/counts stay null — optional per spec."""
    meta = {
        "schema": json.dumps(ICEBERG_SCHEMA),
        "schema-id": "0",
        "partition-spec": "[]",
        "partition-spec-id": "0",
        "format-version": "2",
        "content": "deletes",
    }
    sch, dfw = _avro_writer(jvm, V2_MANIFEST_ENTRY_SCHEMA, path, meta)
    for e in entries:
        d = e["data_file"]
        datum = {
            "status": e["status"],
            "snapshot_id": {"long": e["snapshot_id"]},
            "sequence_number": {"long": e["sequence_number"]},
            "file_sequence_number": {"long": e["sequence_number"]},
            "data_file": {
                "content": d["content"],  # 1 = position, 2 = equality
                "file_path": d["file_path"],
                "file_format": "PARQUET",
                "partition": {},
                "record_count": d["record_count"],
                "file_size_in_bytes": d["file_size_in_bytes"],
                "column_sizes": None,
                "value_counts": None,
                "null_value_counts": None,
                "nan_value_counts": None,
                "lower_bounds": None,
                "upper_bounds": None,
                "key_metadata": None,
                "split_offsets": None,
                "equality_ids": (
                    {"array": d["equality_ids"]} if d.get("equality_ids") else None
                ),
                "sort_order_id": None,
            },
        }
        _append_json(jvm, sch, dfw, datum)
    dfw.close()
    return os.path.getsize(path)


def add_position_deletes(spark, table_dir: str, truth: dict) -> dict:
    """Append snapshot 3 to a ``write_foreign_iceberg_table`` fixture: a
    merge-on-read DELETE snapshot whose position-delete parquet (spec
    §Position Delete Files: file_path string / pos long, reserved field
    ids 2147483546/2147483545) removes every ODD r_regionkey row from
    B.parquet. Authored with pyarrow + the reference Avro implementation —
    no repo codec involved. Returns the updated ground truth with
    ``deleted_from_b`` (positions) and ``b_rows_net``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    jvm = spark._jvm
    meta_dir = os.path.join(table_dir, "metadata")
    data_dir = os.path.join(table_dir, "data")
    s2 = truth["snapshots"]["s2"]
    s3 = 5113846271038457210
    ts3 = 1700000120000

    b_path = os.path.join(data_dir, "B.parquet")
    keys = pq.read_table(b_path, columns=["r_regionkey"])["r_regionkey"].to_pylist()
    positions = [i for i, k in enumerate(keys) if k % 2 == 1]
    del_path = os.path.join(data_dir, "deletes-B.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([b_path] * len(positions), pa.string()),
                "pos": pa.array(positions, pa.int64()),
            }
        ),
        del_path,
    )

    m3 = os.path.join(meta_dir, "m3-deletes.avro")
    m3_len = _write_delete_manifest(jvm, m3, [
        {
            "status": 1,
            "snapshot_id": s3,
            "sequence_number": 3,
            "data_file": {
                "content": 1,
                "file_path": del_path,
                "record_count": len(positions),
                "file_size_in_bytes": os.path.getsize(del_path),
            },
        }
    ])

    m2 = os.path.join(meta_dir, "m2.avro")
    ml3 = os.path.join(meta_dir, "snap-3.avro")
    _write_manifest_list(jvm, ml3, [
        {"manifest_path": m2, "manifest_length": os.path.getsize(m2),
         "sequence_number": 2, "min_sequence_number": 1,
         "added_snapshot_id": s2, "added": 1, "existing": 1,
         "added_rows": truth["B.parquet"]["rows"],
         "existing_rows": truth["A.parquet"]["rows"]},
        {"manifest_path": m3, "manifest_length": m3_len, "content": 1,
         "sequence_number": 3, "min_sequence_number": 3,
         "added_snapshot_id": s3, "added": 1, "existing": 0,
         "added_rows": len(positions), "existing_rows": 0},
    ])

    md_path = os.path.join(meta_dir, "v2.metadata.json")
    with open(md_path) as f:
        md = json.load(f)
    md["last-updated-ms"] = ts3
    md["last-sequence-number"] = 3
    md["current-snapshot-id"] = s3
    md["snapshots"].append({
        "snapshot-id": s3,
        "parent-snapshot-id": s2,
        "sequence-number": 3,
        "timestamp-ms": ts3,
        "manifest-list": ml3,
        "summary": {"operation": "delete", "deleted-records": str(len(positions))},
        "schema-id": 0,
    })
    md["snapshot-log"].append({"timestamp-ms": ts3, "snapshot-id": s3})
    with open(os.path.join(meta_dir, "v3.metadata.json"), "w") as f:
        json.dump(md, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("3")

    truth = dict(truth)
    truth["deleted_from_b"] = positions
    truth["b_rows_net"] = truth["B.parquet"]["rows"] - len(positions)
    truth["snapshots"] = {**truth["snapshots"], "s3": s3}
    return truth


def add_equality_deletes(spark, table_dir: str, truth: dict) -> dict:
    """Append an EQUALITY-delete snapshot (data_file.content = 2): the
    delete parquet holds r_regionkey values {3, 4} on equality id [1].
    Key 3 is odd, so the position deletes (``add_position_deletes``)
    already kill it — the doubly-deleted-row dedup case; key 4 is
    eq-only. Default reads must refuse; the data-assisted
    ``apply_equality_deletes`` path must net exactly the union."""
    jvm = spark._jvm
    meta_dir = os.path.join(table_dir, "metadata")
    s_prev = truth["snapshots"].get("s3", truth["snapshots"]["s2"])
    s4 = 6224957382149568321
    ts4 = 1700000180000
    eq_path = os.path.join(table_dir, "data", "eq-deletes.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"r_regionkey": pa.array([3, 4], pa.int32())}), eq_path)
    m4 = os.path.join(meta_dir, "m4-eq-deletes.avro")
    m4_len = _write_delete_manifest(jvm, m4, [
        {
            "status": 1,
            "snapshot_id": s4,
            "sequence_number": 4,
            "data_file": {
                "content": 2,
                "file_path": eq_path,
                "record_count": 2,
                "file_size_in_bytes": os.path.getsize(eq_path),
                "equality_ids": [1],
            },
        }
    ])
    m2 = os.path.join(meta_dir, "m2.avro")
    ml4 = os.path.join(meta_dir, "snap-4.avro")
    manifests = [
        {"manifest_path": m2, "manifest_length": os.path.getsize(m2),
         "sequence_number": 2, "min_sequence_number": 1,
         "added_snapshot_id": truth["snapshots"]["s2"], "added": 1,
         "existing": 1, "added_rows": truth["B.parquet"]["rows"],
         "existing_rows": truth["A.parquet"]["rows"]},
    ]
    m3 = os.path.join(meta_dir, "m3-deletes.avro")
    if "s3" in truth["snapshots"] and os.path.exists(m3):
        # carry the position-delete manifest forward — s4 must see BOTH
        # delete kinds (the doubly-deleted-row union case)
        manifests.append(
            {"manifest_path": m3, "manifest_length": os.path.getsize(m3),
             "content": 1, "sequence_number": 3, "min_sequence_number": 3,
             "added_snapshot_id": truth["snapshots"]["s3"], "added": 1,
             "existing": 0, "added_rows": len(truth["deleted_from_b"]),
             "existing_rows": 0}
        )
    manifests.append(
        {"manifest_path": m4, "manifest_length": m4_len, "content": 1,
         "sequence_number": 4, "min_sequence_number": 4,
         "added_snapshot_id": s4, "added": 1, "existing": 0,
         "added_rows": 2, "existing_rows": 0}
    )
    _write_manifest_list(jvm, ml4, manifests)
    v = 3 if "s3" in truth["snapshots"] else 2
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as f:
        md = json.load(f)
    md["last-updated-ms"] = ts4
    md["last-sequence-number"] = 4
    md["current-snapshot-id"] = s4
    md["snapshots"].append({
        "snapshot-id": s4,
        "parent-snapshot-id": s_prev,
        "sequence-number": 4,
        "timestamp-ms": ts4,
        "manifest-list": ml4,
        "summary": {"operation": "delete"},
        "schema-id": 0,
    })
    with open(os.path.join(meta_dir, f"v{v + 1}.metadata.json"), "w") as f:
        json.dump(md, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(v + 1))
    truth = dict(truth)
    truth["eq_deleted_keys"] = [3, 4]
    truth["snapshots"] = {**truth["snapshots"], "s4": s4}
    return truth


def write_foreign_iceberg_table(spark, table_dir: str, source_parquet: str) -> dict:
    """Author a 2-snapshot unpartitioned Iceberg v2 `region` table at
    ``table_dir`` whose data files are true row-subsets of
    ``source_parquet`` (split on r_regionkey < 2). Returns the per-file
    ground truth {file_name: {"rows": n, "min_key": ..., ...}}.

    Layout follows the HadoopTables convention the spec documents for
    filesystem tables: data/ + metadata/v{1,2}.metadata.json +
    version-hint.text.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    jvm = spark._jvm
    data_dir = os.path.join(table_dir, "data")
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)

    t = pq.read_table(source_parquet, columns=["r_regionkey", "r_name"])
    truth: dict[str, dict] = {}
    paths: dict[str, str] = {}
    for name, mask in (
        ("A.parquet", pc.less(t["r_regionkey"], 2)),
        ("B.parquet", pc.greater_equal(t["r_regionkey"], 2)),
    ):
        part = t.filter(mask)
        p = os.path.join(data_dir, name)
        pq.write_table(part, p)
        keys = part["r_regionkey"].to_pylist()
        names = part["r_name"].to_pylist()
        truth[name] = {
            "rows": part.num_rows,
            "min_key": min(keys),
            "max_key": max(keys),
            "min_name": min(names),
            "max_name": max(names),
            "size": os.path.getsize(p),
        }
        paths[name] = p

    s1, s2 = 3315436028672240462, 4228324567354994417  # fixed, spec: any long
    ts1, ts2 = 1700000000000, 1700000060000

    def entry(status: int, snap: int, seq: int, name: str) -> dict:
        g = truth[name]
        return {
            "status": status,
            "snapshot_id": snap,
            "sequence_number": seq,
            "data_file": {
                "file_path": paths[name],
                "record_count": g["rows"],
                "file_size_in_bytes": g["size"],
                "min_key": g["min_key"],
                "max_key": g["max_key"],
                "min_name": g["min_name"],
                "max_name": g["max_name"],
            },
        }

    m1 = os.path.join(meta_dir, "m1.avro")
    m1_len = _write_manifest(jvm, m1, [entry(1, s1, 1, "A.parquet")])
    # snapshot 2's manifest carries file A as EXISTING (status 0) and adds B
    m2 = os.path.join(meta_dir, "m2.avro")
    m2_len = _write_manifest(
        jvm, m2, [entry(1, s2, 2, "B.parquet"), entry(0, s1, 1, "A.parquet")]
    )

    ml1 = os.path.join(meta_dir, "snap-1.avro")
    _write_manifest_list(jvm, ml1, [
        {"manifest_path": m1, "manifest_length": m1_len, "sequence_number": 1,
         "min_sequence_number": 1, "added_snapshot_id": s1, "added": 1,
         "existing": 0, "added_rows": truth["A.parquet"]["rows"], "existing_rows": 0},
    ])
    ml2 = os.path.join(meta_dir, "snap-2.avro")
    _write_manifest_list(jvm, ml2, [
        {"manifest_path": m2, "manifest_length": m2_len, "sequence_number": 2,
         "min_sequence_number": 1, "added_snapshot_id": s2, "added": 1,
         "existing": 1, "added_rows": truth["B.parquet"]["rows"],
         "existing_rows": truth["A.parquet"]["rows"]},
    ])

    def snap_json(sid: int, seq: int, ts: int, ml: str, parent: int | None, op: str, extra: dict) -> dict:
        s = {
            "snapshot-id": sid,
            "sequence-number": seq,
            "timestamp-ms": ts,
            "manifest-list": ml,
            "summary": {"operation": op, **extra},
            "schema-id": 0,
        }
        if parent is not None:
            s["parent-snapshot-id"] = parent
        return s

    base_md = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, "foreign-region")),
        "location": table_dir,
        "last-updated-ms": ts1,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [ICEBERG_SCHEMA],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "snapshot-log": [],
        "metadata-log": [],
    }
    md1 = {
        **base_md,
        "last-sequence-number": 1,
        "current-snapshot-id": s1,
        "snapshots": [snap_json(s1, 1, ts1, ml1, None, "append",
                                {"added-data-files": "1"})],
        "snapshot-log": [{"timestamp-ms": ts1, "snapshot-id": s1}],
    }
    md2 = {
        **base_md,
        "last-updated-ms": ts2,
        "last-sequence-number": 2,
        "current-snapshot-id": s2,
        "snapshots": [
            snap_json(s1, 1, ts1, ml1, None, "append", {"added-data-files": "1"}),
            snap_json(s2, 2, ts2, ml2, s1, "append", {"added-data-files": "1"}),
        ],
        "snapshot-log": [
            {"timestamp-ms": ts1, "snapshot-id": s1},
            {"timestamp-ms": ts2, "snapshot-id": s2},
        ],
        "metadata-log": [
            {"timestamp-ms": ts1,
             "metadata-file": os.path.join(meta_dir, "v1.metadata.json")}
        ],
    }
    for v, md in ((1, md1), (2, md2)):
        with open(os.path.join(meta_dir, f"v{v}.metadata.json"), "w") as f:
            json.dump(md, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("2")
    truth["snapshots"] = {"s1": s1, "s2": s2}
    return truth
