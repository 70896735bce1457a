"""Property-based tests (hypothesis) for the VALUE codec planes that the
golden fixtures spot-check: Avro binary datum round-trips over arbitrary
values, the Hudi instant codec (C13), Iceberg transformed partition ints
(C9), Iceberg Appendix-D bound bytes (C12), and the Morton key's exact
invertibility. These are pure-Python/driver codecs — no SparkSession —
so hundreds of examples run in seconds."""

from __future__ import annotations

import math

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
