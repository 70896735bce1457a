"""Property-based tests (hypothesis) for the VALUE codec planes that the
golden fixtures spot-check: Avro binary datum round-trips over arbitrary
values, the Hudi instant codec (C13), Iceberg transformed partition ints
(C9), Iceberg Appendix-D bound bytes (C12), and the Morton key's exact
invertibility. These are pure-Python/driver codecs — no SparkSession —
so hundreds of examples run in seconds."""

from __future__ import annotations

import math
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from onetable_spark.formats.avro_codec import read_container, write_container
from onetable_spark.formats.hudi import instant_to_millis, millis_to_instant
from onetable_spark.formats.iceberg import _bound_bytes, _bound_value
from onetable_spark.model import PartitionTransform
from onetable_spark.schema.partitions import (
    iceberg_value_to_millis,
    millis_to_iceberg_value,
)

# ------------------------------------------------------------ avro datums

RICH_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "oi", "type": ["null", "long"], "default": None},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "d", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ],
}

_datums = st.fixed_dictionaries(
    {
        "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "oi": st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.text(max_size=40),  # arbitrary unicode incl. surrogate-adjacent
        "b": st.binary(max_size=40),
        "d": st.floats(allow_nan=False),  # NaN compares != itself; tested below
        "flag": st.booleans(),
        "xs": st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=8),
        "m": st.dictionaries(st.text(min_size=1, max_size=8), st.text(max_size=8), max_size=5),
    }
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_datums, min_size=1, max_size=5))
def test_avro_datum_roundtrip_property(tmp_path_factory, rows):
    path = str(tmp_path_factory.mktemp("avro") / "p.avro")
    write_container(path, RICH_SCHEMA, rows)
    schema, got = read_container(path)
    assert got == rows


def test_avro_nan_roundtrip(tmp_path):
    path = str(tmp_path / "nan.avro")
    rows = [{"i": 0, "oi": None, "s": "", "b": b"", "d": float("nan"),
             "flag": False, "xs": [], "m": {}}]
    write_container(path, RICH_SCHEMA, rows)
    _, got = read_container(path)
    assert math.isnan(got[0]["d"])


# ------------------------------------------------------------ instant codec

@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=4102444800_000))  # 1970..2100
def test_hudi_instant_roundtrip(millis):
    assert instant_to_millis(millis_to_instant(millis)) == millis


# -------------------------------------------- iceberg transformed ints (C9)

@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(
        [PartitionTransform.YEAR, PartitionTransform.MONTH,
         PartitionTransform.DAY, PartitionTransform.HOUR]
    ),
    st.integers(min_value=-600, max_value=1560),  # ~1920..2100 in the coarsest unit
)
def test_iceberg_transformed_int_roundtrip(transform, value):
    millis = iceberg_value_to_millis(transform, value)
    assert millis_to_iceberg_value(transform, millis) == value


# -------------------------------------------- Appendix-D bound bytes (C12)

@settings(max_examples=200, deadline=None)
@given(
    st.one_of(
        st.tuples(st.just("int"), st.integers(min_value=-(2**31), max_value=2**31 - 1)),
        st.tuples(st.just("long"), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
        st.tuples(st.just("double"), st.floats(allow_nan=False, allow_infinity=False)),
        st.tuples(st.just("string"), st.text(max_size=30)),
        st.tuples(st.just("boolean"), st.booleans()),
    )
)
def test_bound_bytes_roundtrip(tv):
    tname, v = tv
    raw = _bound_bytes(tname, str(v))
    assert raw is not None
    back = _bound_value(tname, raw)
    if tname == "double":
        assert float(back) == float(str(v))
    else:
        assert back == str(v)


# --------------------------------------------------------- morton key math

def _ref_morton(vals: list[int], bits: int = 8) -> int:
    z, k = 0, len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= (((v & ((1 << bits) - 1)) >> i) & 1) << (i * k + j)
    return z


def _unmorton(z: int, k: int, bits: int = 8) -> list[int]:
    vals = [0] * k
    for i in range(bits):
        for j in range(k):
            vals[j] |= ((z >> (i * k + j)) & 1) << i
    return vals


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=255), min_size=2, max_size=4))
def test_morton_reference_is_invertible(vals):
    """The interleave is a bijection on the masked domain — per-file
    min/max on z therefore bounds every source column's range, which is
    exactly what the ZORDER pruning argument needs."""
    z = _ref_morton(vals)
    assert _unmorton(z, len(vals)) == vals


# --------------------------------------------- r11: deletion-vector codec


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=0, max_size=400
    )
)
def test_rbm_array_roundtrip_any_rowset(rows):
    """Portable RoaringBitmapArray encode/decode is the identity on sorted
    distinct row sets across array containers and high buckets."""
    from onetable_spark.formats.delta_dv import decode_rbm_array, encode_rbm_array

    assert decode_rbm_array(encode_rbm_array(rows)) == sorted(set(rows))


@settings(max_examples=50, deadline=None)
@given(
    rows=st.lists(
        st.integers(min_value=0, max_value=2**20), min_size=1, max_size=200
    ),
    prefix=st.sampled_from(["", "ab", "x1"]),
)
def test_dv_file_roundtrip_any_rowset(tmp_path_factory, rows, prefix):
    from onetable_spark.formats.delta_dv import read_dv, write_dv_file

    d = str(tmp_path_factory.mktemp("dvprop"))
    desc = write_dv_file(d, rows, prefix=prefix)
    assert read_dv(d, desc) == sorted(set(rows))
    assert desc["cardinality"] == len(set(rows))


@settings(max_examples=100, deadline=None)
@given(data=st.binary(min_size=4, max_size=64).filter(lambda b: len(b) % 4 == 0))
def test_z85_roundtrip_any_bytes(data):
    from onetable_spark.formats.delta_dv import z85_decode, z85_encode

    enc = z85_encode(data)
    assert len(enc) == len(data) // 4 * 5
    assert z85_decode(enc) == data


@settings(max_examples=50, deadline=None)
@given(
    rows=st.lists(st.integers(min_value=0, max_value=2**20), min_size=1, max_size=64),
    flip=st.integers(min_value=0, max_value=10**9),
)
def test_dv_corruption_never_silent(tmp_path_factory, rows, flip):
    """Any single-byte flip inside the DV file is CAUGHT (checksum, magic,
    size, version, or cardinality check) — never a silently wrong row set."""
    import pytest as _pytest

    from onetable_spark.formats.delta_dv import read_dv, write_dv_file

    import struct as _struct

    d = str(tmp_path_factory.mktemp("dvcorrupt"))
    desc = write_dv_file(d, rows)
    bin_file = next(
        os.path.join(d, f) for f in os.listdir(d) if f.startswith("deletion_vector_")
    )
    raw = bytearray(open(bin_file, "rb").read())
    raw[flip % len(raw)] ^= 0xFF
    open(bin_file, "wb").write(bytes(raw))
    # every byte is covered by a check (version byte, BE length vs CRC
    # window, CRC over data, descriptor size + cardinality) — decode must
    # RAISE, never return a row set at all
    with _pytest.raises((ValueError, _struct.error, IndexError)):
        read_dv(d, desc)


# ------------------------------------------------ r11: hudi log block codec


@settings(max_examples=75, deadline=None)
@given(
    blocks=st.lists(
        st.lists(
            st.tuples(st.integers(-2**31, 2**31 - 1), st.one_of(st.none(), st.text(max_size=12))),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_hudi_log_blocks_roundtrip(tmp_path_factory, blocks):
    """Multi-block HoodieLogFormat files round-trip: per-block record
    decode is exact and the whole-file count walk agrees."""
    from onetable_spark.formats.hudi_log import (
        avro_block_records,
        log_file_record_count,
        read_log_blocks,
        write_avro_log_block,
    )

    sch = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "k", "type": "int"},
            {"name": "v", "type": ["null", "string"], "default": None},
        ],
    }
    d = str(tmp_path_factory.mktemp("hlog"))
    lp = os.path.join(d, ".fid_0-0-1.log.1")
    expected = []
    for i, recs in enumerate(blocks):
        datums = [{"k": k, "v": v} for k, v in recs]
        write_avro_log_block(lp, datums, sch, f"2024010100000{i:04d}")
        expected.append(datums)
    got = read_log_blocks(lp)
    assert len(got) == len(blocks)
    for b, exp in zip(got, expected):
        cnt, recs = avro_block_records(b, decode=True)
        assert cnt == len(exp) and recs == exp
    assert log_file_record_count(lp)["records"] == sum(len(e) for e in expected)
