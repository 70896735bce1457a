"""Byte-level certification of formats/avro_codec.py against the Apache
Avro REFERENCE implementation (org.apache.avro 1.12, already on Spark's
JVM classpath) and against hand-encoded spec bytes.

Until r10 the codec was only ever exercised symmetrically (it wrote every
manifest byte it later read), so a mirrored encode/decode bug would be
invisible to the whole suite. These tests break the symmetry both ways:

- the JVM reference implementation WRITES (null + deflate codecs,
  multi-block, extra container metadata, nested records/arrays/maps/
  unions/fixed/enum) and our pure-Python reader must decode exact values;
- our writer's bytes must be decoded exactly by the JVM reference reader;
- a container hand-assembled byte-by-byte from the Avro 1.11 spec
  (magic, metadata map, zigzag varints, sync markers, raw-deflate block)
  must decode exactly, and our writer's output must carry the same
  structural bytes.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import pytest

from onetable_spark.formats.avro_codec import read_container, write_container

# A schema exercising every branch the Iceberg manifests need: primitives,
# nullable unions, nested record, array-of-record (the k/v "map" encoding
# Iceberg uses for bounds), a true map, fixed, and enum.
SCHEMA = {
    "type": "record",
    "name": "entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {"name": "flag", "type": "boolean"},
        {"name": "ratio", "type": "float"},
        {"name": "score", "type": "double"},
        {"name": "payload", "type": "bytes"},
        {"name": "marker", "type": {"type": "fixed", "name": "m16", "size": 4}},
        {"name": "kind", "type": {"type": "enum", "name": "k", "symbols": ["A", "B"]}},
        {
            "name": "bounds",
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "kv",
                        "fields": [
                            {"name": "key", "type": "int"},
                            {"name": "value", "type": "bytes"},
                        ],
                    },
                    "logicalType": "map",
                },
            ],
            "default": None,
        },
        {"name": "tags", "type": {"type": "map", "values": "string"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [
                    {"name": "path", "type": "string"},
                    {"name": "ids", "type": {"type": "array", "items": "long"}},
                ],
            },
        },
    ],
}

ROWS = [
    {
        "status": 1,
        "snapshot_id": 7_777_777_777,
        "flag": True,
        "ratio": 1.5,
        "score": -2.25,
        "payload": b"\x00\x01\xff",
        "marker": b"abcd",
        "kind": "B",
        "bounds": [{"key": 1, "value": struct.pack("<i", 42)}],
        "tags": {"x": "1", "y": "2"},
        "nested": {"path": "s3://bucket/file.parquet", "ids": [1, -2, 3]},
    },
    {
        "status": 2,
        "snapshot_id": None,
        "flag": False,
        "ratio": -0.5,
        "score": 1e300,
        "payload": b"",
        "marker": b"\x00\x00\x00\x00",
        "kind": "A",
        "bounds": None,
        "tags": {},
        "nested": {"path": "", "ids": []},
    },
]


def _jvm_write(spark, path: str, codec: str, multi_block: bool) -> None:
    """Author the container with the Apache Avro reference implementation —
    no byte of it produced by this repo's codec."""
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    if codec == "deflate":
        dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    dfw.setMeta("iceberg.extra", "ignored-by-reader")  # readers must skip it
    dfw.create(sch, jvm.java.io.File(path))
    for i, row in enumerate(ROWS):
        dfw.append(_jvm_datum(jvm, sch, row))
        if multi_block and i + 1 < len(ROWS):
            dfw.sync()  # force a block boundary mid-file
    dfw.close()


def _jvm_datum(jvm, sch, row: dict):
    rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
    f = sch.getField
    rec.put("status", row["status"])
    rec.put(
        "snapshot_id",
        None
        if row["snapshot_id"] is None
        else jvm.java.lang.Long.parseLong(str(row["snapshot_id"])),
    )
    rec.put("flag", row["flag"])
    rec.put("ratio", jvm.java.lang.Float.parseFloat(repr(row["ratio"])))
    rec.put("score", row["score"])
    rec.put("payload", jvm.java.nio.ByteBuffer.wrap(bytearray(row["payload"])))
    fixed_sch = f("marker").schema()
    rec.put(
        "marker",
        jvm.org.apache.avro.generic.GenericData.Fixed(fixed_sch, bytearray(row["marker"])),
    )
    enum_sch = f("kind").schema()
    rec.put(
        "kind", jvm.org.apache.avro.generic.GenericData.EnumSymbol(enum_sch, row["kind"])
    )
    if row["bounds"] is None:
        rec.put("bounds", None)
    else:
        arr_sch = f("bounds").schema().getTypes().get(1)
        kv_sch = arr_sch.getElementType()
        arr = jvm.java.util.ArrayList()
        for kv in row["bounds"]:
            r = jvm.org.apache.avro.generic.GenericData.Record(kv_sch)
            r.put("key", kv["key"])
            r.put("value", jvm.java.nio.ByteBuffer.wrap(bytearray(kv["value"])))
            arr.add(r)
        rec.put("bounds", arr)
    tags = jvm.java.util.HashMap()
    for k, v in row["tags"].items():
        tags.put(k, v)
    rec.put("tags", tags)
    inner_sch = f("nested").schema()
    inner = jvm.org.apache.avro.generic.GenericData.Record(inner_sch)
    inner.put("path", row["nested"]["path"])
    ids = jvm.java.util.ArrayList()
    for v in row["nested"]["ids"]:
        ids.add(jvm.java.lang.Long.parseLong(str(v)))
    inner.put("ids", ids)
    rec.put("nested", inner)
    return rec


@pytest.mark.parametrize("codec", ["null", "deflate"])
@pytest.mark.parametrize("multi_block", [False, True])
def test_reader_decodes_reference_implementation_bytes(spark, tmp_path, codec, multi_block):
    path = str(tmp_path / f"ref_{codec}_{multi_block}.avro")
    _jvm_write(spark, path, codec, multi_block)
    schema, rows = read_container(path)
    assert json.loads(json.dumps(schema)) == SCHEMA
    assert rows == ROWS


def test_reference_implementation_decodes_our_bytes(spark, tmp_path):
    path = str(tmp_path / "ours.avro")
    write_container(path, SCHEMA, ROWS)
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while reader.hasNext():
        got.append(json.loads(str(reader.next())))  # GenericRecord -> Avro JSON
    reader.close()
    assert len(got) == len(ROWS)
    r0, r1 = got
    assert r0["status"] == 1 and r0["snapshot_id"] == 7_777_777_777
    assert r0["kind"] == "B" and r0["tags"] == {"x": "1", "y": "2"}
    assert r0["nested"] == {"path": "s3://bucket/file.parquet", "ids": [1, -2, 3]}
    assert r0["bounds"] == [{"key": 1, "value": "*\u0000\u0000\u0000"}]
    assert r1["snapshot_id"] is None and r1["bounds"] is None
    assert r1["score"] == 1e300 and r1["tags"] == {}
    # GenericRecord.toString renders bytes as ISO-8859-1 text, fixed as ints
    assert r0["payload"] == "\u0000\u0001\u00ff"
    assert r0["marker"] == [97, 98, 99, 100] and r1["marker"] == [0, 0, 0, 0]


# ----------------------------------------------------- hand-encoded bytes

HAND_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
    ],
}


def _varint_zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _hand_container(codec: str) -> bytes:
    """Assemble a container byte-by-byte from the Avro 1.11 spec alone."""
    sync = bytes(range(16))
    meta_schema = json.dumps(HAND_SCHEMA).encode()
    buf = io.BytesIO()
    buf.write(b"Obj\x01")  # magic
    buf.write(_varint_zigzag(2))  # metadata map: 2 entries
    for k, v in (("avro.schema", meta_schema), ("avro.codec", codec.encode())):
        buf.write(_varint_zigzag(len(k)) + k.encode())
        buf.write(_varint_zigzag(len(v)) + v)
    buf.write(_varint_zigzag(0))  # end of map
    buf.write(sync)
    # one block with two records: {id: 150, name: "hi"}, {id: -3, name: ""}
    body = (
        _varint_zigzag(150)
        + _varint_zigzag(2)
        + b"hi"
        + _varint_zigzag(-3)
        + _varint_zigzag(0)
    )
    if codec == "deflate":  # RFC-1951 raw deflate, no zlib wrapper
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = c.compress(body) + c.flush()
    buf.write(_varint_zigzag(2))  # record count
    buf.write(_varint_zigzag(len(body)))
    buf.write(body)
    buf.write(sync)
    return buf.getvalue()


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_reader_decodes_hand_encoded_spec_bytes(tmp_path, codec):
    path = tmp_path / f"hand_{codec}.avro"
    path.write_bytes(_hand_container(codec))
    schema, rows = read_container(str(path))
    assert schema == HAND_SCHEMA
    assert rows == [{"id": 150, "name": "hi"}, {"id": -3, "name": ""}]


def test_writer_emits_spec_structural_bytes(tmp_path):
    """Structure of our writer's output checked against the spec directly:
    magic, metadata map contents, 16-byte sync marker repeated after the
    header and after the (single) block, zigzag block framing."""
    path = str(tmp_path / "structural.avro")
    write_container(path, HAND_SCHEMA, [{"id": 150, "name": "hi"}], sync=bytes(range(16)))
    raw = open(path, "rb").read()
    assert raw[:4] == b"Obj\x01"
    header_sync_at = raw.index(bytes(range(16)))
    meta = raw[4:header_sync_at]
    assert b"avro.schema" in meta and b"avro.codec" in meta and b"null" in meta
    # block: count=1 -> zigzag 0x02; size of [id 150]["hi"] = 2 + 1 + 2 = 5
    block = raw[header_sync_at + 16 :]
    assert block[0:1] == _varint_zigzag(1)
    assert block[1:2] == _varint_zigzag(5)
    assert block[2:4] == _varint_zigzag(150)
    assert block[4:5] + block[5:7] == _varint_zigzag(2) + b"hi"
    assert block[7:] == bytes(range(16))  # trailing sync, end of file
