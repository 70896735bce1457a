"""Round-trip + property tests for the pure-Python Avro codec."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from onetable_spark.formats.avro_codec import read_container, write_container

SCHEMA = {
    "type": "record",
    "name": "entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "name", "type": "string"},
        {"name": "payload", "type": "bytes"},
        {"name": "score", "type": "double"},
        {"name": "ratio", "type": "float"},
        {"name": "flag", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "counts", "type": {"type": "map", "values": "long"}},
        {
            "name": "nested",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "long"}],
                },
            ],
        },
    ],
}


def test_container_roundtrip(tmp_path):
    records = [
        {
            "status": 1,
            "snapshot_id": 123456789,
            "name": "héllo/wörld.parquet",
            "payload": b"\x00\x01\xff",
            "score": 3.25,
            "ratio": 1.5,
            "flag": True,
            "tags": ["a", "b"],
            "counts": {"1": 10, "2": -5},
            "nested": {"x": -1},
        },
        {
            "status": 2,
            "snapshot_id": None,
            "name": "",
            "payload": b"",
            "score": -0.0,
            "ratio": 0.0,
            "flag": False,
            "tags": [],
            "counts": {},
            "nested": None,
        },
    ]
    path = str(tmp_path / "t.avro")
    write_container(path, SCHEMA, records)
    schema, out = read_container(path)
    assert schema == SCHEMA
    assert out == records


def test_empty_container(tmp_path):
    path = str(tmp_path / "empty.avro")
    write_container(path, SCHEMA, [])
    _, out = read_container(path)
    assert out == []


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "status": st.integers(min_value=-(2**31), max_value=2**31 - 1),
                "snapshot_id": st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
                "name": st.text(max_size=40),
                "payload": st.binary(max_size=20),
                "score": st.floats(allow_nan=False, allow_infinity=False, width=64),
                "ratio": st.floats(allow_nan=False, allow_infinity=False, width=32),
                "flag": st.booleans(),
                "tags": st.lists(st.text(max_size=10), max_size=5),
                "counts": st.dictionaries(
                    st.text(min_size=1, max_size=5), st.integers(-(2**63), 2**63 - 1), max_size=4
                ),
                "nested": st.one_of(
                    st.none(), st.fixed_dictionaries({"x": st.integers(-(2**63), 2**63 - 1)})
                ),
            }
        ),
        max_size=20,
    )
)
def test_property_roundtrip(tmp_path_factory, records):
    path = str(tmp_path_factory.mktemp("avro") / "p.avro")
    write_container(path, SCHEMA, records)
    _, out = read_container(path)
    assert out == records


def test_multi_block_streaming_roundtrip(tmp_path):
    """r7: write_container streams records in blocks (block_records) —
    the multi-block container form must read back identically, including
    a final partial block and a generator (non-list) record source."""
    records = [
        {
            "status": i,
            "snapshot_id": i * 7,
            "name": f"r{i}",
            "payload": bytes([i % 256]),
            "score": float(i),
            "ratio": float(i % 3),
            "flag": i % 2 == 0,
            "tags": [f"t{i % 4}"],
            "counts": {"k": i},
            "nested": {"x": i} if i % 5 == 0 else None,
        }
        for i in range(10)
    ]
    path = str(tmp_path / "blocks.avro")
    # block size 3 → blocks of 3/3/3/1; records passed as a GENERATOR
    write_container(path, SCHEMA, iter(records), block_records=3)
    schema, out = read_container(path)
    assert schema == SCHEMA
    assert out == records


def test_large_container_crosses_default_block_boundary(tmp_path):
    """20k records > the 8192 default block size → 3 blocks; count and
    order must survive exactly."""
    records = [
        {
            "status": i % 1000,
            "snapshot_id": None,
            "name": "",
            "payload": b"",
            "score": 0.0,
            "ratio": 0.0,
            "flag": False,
            "tags": [],
            "counts": {},
            "nested": None,
        }
        for i in range(20_000)
    ]
    path = str(tmp_path / "big.avro")
    write_container(path, SCHEMA, records)
    _, out = read_container(path)
    assert len(out) == 20_000
    assert [r["status"] for r in out[:5]] == [0, 1, 2, 3, 4]
    assert out == records
