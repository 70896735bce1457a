"""Minimal pure-Python Avro Object Container File codec.

Implements the subset of the public Avro 1.11 specification
(avro.apache.org/docs/current/specification) needed to read and write
Iceberg manifest / manifest-list files: binary encoding for null, boolean,
int, long (zigzag varint), float, double, bytes, string, fixed, enum,
record, array, map, and unions; object container files with the
``Obj\\x01`` header, schema metadata, null codec, and sync markers.

Pure Python and dependency-free so it runs inside Spark executor workers
(manifest decoding is distributed via mapInPandas in formats/iceberg.py).
No code is derived from the Java Avro implementation; written from the
specification document.
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Any, BinaryIO

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------- write


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_long(buf: BinaryIO, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            break


def _write_bytes(buf: BinaryIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _resolve_named(schema: Any, names: dict[str, Any]) -> Any:
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def _register_names(schema: Any, names: dict[str, Any]) -> None:
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed") and "name" in schema:
            names[schema["name"]] = schema
        if t == "record":
            for f in schema.get("fields", []):
                _register_names(f["type"], names)
        elif t == "array":
            _register_names(schema["items"], names)
        elif t == "map":
            _register_names(schema["values"], names)
    elif isinstance(schema, list):
        for s in schema:
            _register_names(s, names)


def write_datum(buf: BinaryIO, datum: Any, schema: Any, names: dict[str, Any]) -> None:
    schema = _resolve_named(schema, names)
    if isinstance(schema, list):  # union: index then value
        idx = _pick_union_branch(datum, schema, names)
        _write_long(buf, idx)
        write_datum(buf, datum, schema[idx], names)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        _write_long(buf, int(datum))
    elif t == "float":
        buf.write(struct.pack("<f", float(datum)))
    elif t == "double":
        buf.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        _write_bytes(buf, bytes(datum))
    elif t == "string":
        _write_bytes(buf, datum.encode("utf-8"))
    elif t == "fixed":
        buf.write(bytes(datum))
    elif t == "enum":
        _write_long(buf, schema["symbols"].index(datum))
    elif t == "record":
        for f in schema["fields"]:
            write_datum(buf, datum.get(f["name"]), f["type"], names)
    elif t == "array":
        items = list(datum or [])
        if items:
            _write_long(buf, len(items))
            for item in items:
                write_datum(buf, item, schema["items"], names)
        _write_long(buf, 0)
    elif t == "map":
        entries = dict(datum or {})
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, str(k).encode("utf-8"))
                write_datum(buf, v, schema["values"], names)
        _write_long(buf, 0)
    else:
        raise ValueError(f"unsupported avro type: {t}")


def _pick_union_branch(datum: Any, union: list, names: dict[str, Any]) -> int:
    def kind(s: Any) -> str:
        s = _resolve_named(s, names)
        return s["type"] if isinstance(s, dict) else s

    if datum is None:
        for i, s in enumerate(union):
            if kind(s) == "null":
                return i
        raise ValueError("null not allowed by union")
    preference = {
        bool: ("boolean",),
        int: ("long", "int"),
        float: ("double", "float"),
        str: ("string", "enum"),
        bytes: ("bytes", "fixed"),
        dict: ("record", "map"),
        list: ("array",),
    }
    for py_type, avro_kinds in preference.items():
        if isinstance(datum, py_type):
            for want in avro_kinds:
                for i, s in enumerate(union):
                    if kind(s) == want:
                        return i
    for i, s in enumerate(union):
        if kind(s) != "null":
            return i
    raise ValueError(f"no union branch for {type(datum)}")


def write_container(
    path: str,
    schema: dict | list,
    records,
    sync: bytes | None = None,
    block_records: int = 8192,
) -> None:
    """Write an Avro object container file (null codec).

    ``records`` may be any iterable — rows are encoded and flushed in
    blocks of ``block_records``, so a million-entry manifest streams to
    disk instead of materializing as one byte buffer (the multi-block
    form is standard Avro; ``read_container`` replays every block)."""
    names: dict[str, Any] = {}
    _register_names(schema, names)
    sync = sync or os.urandom(16)
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": b"null",
        }
        _write_long(f, len(meta))
        for k, v in meta.items():
            _write_bytes(f, k.encode("utf-8"))
            _write_bytes(f, v)
        _write_long(f, 0)
        f.write(sync)
        body = io.BytesIO()
        count = 0

        def flush() -> None:
            nonlocal body, count
            if count:
                payload = body.getvalue()
                _write_long(f, count)
                _write_long(f, len(payload))
                f.write(payload)
                f.write(sync)
                body = io.BytesIO()
                count = 0

        for rec in records:
            write_datum(body, rec, schema, names)
            count += 1
            if count >= block_records:
                flush()
        flush()


# ---------------------------------------------------------------------- read


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def at_end(self) -> bool:
        return self.pos >= len(self.data)


def read_datum(r: _Reader, schema: Any, names: dict[str, Any]) -> Any:
    schema = _resolve_named(schema, names)
    if isinstance(schema, list):
        return read_datum(r, schema[r.read_long()], names)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "fixed":
        return r.read(schema["size"])
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "record":
        return {f["name"]: read_datum(r, f["type"], names) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(read_datum(r, schema["items"], names))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = read_datum(r, schema["values"], names)
        return out
    raise ValueError(f"unsupported avro type: {t}")


def read_container(path: str) -> tuple[dict | list, list[Any]]:
    """Read an Avro object container file → (writer schema, records)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC:
        raise ValueError(f"{path}: not an avro container file")
    r = _Reader(data)
    r.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    codec = meta.get("avro.codec", b"null")
    schema = json.loads(meta["avro.schema"])
    names: dict[str, Any] = {}
    _register_names(schema, names)
    sync = r.read(16)
    records: list[Any] = []
    while not r.at_end():
        count = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == b"deflate":
            import zlib

            block = zlib.decompress(block, -15)
        elif codec != b"null":
            raise ValueError(f"unsupported avro codec: {codec.decode()}")
        br = _Reader(block)
        for _ in range(count):
            records.append(read_datum(br, schema, names))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records
