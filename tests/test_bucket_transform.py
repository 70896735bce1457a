"""Iceberg bucket[N]/truncate[W] partition transforms (r13, C6+C9 beyond
the reference — IcebergPartitionSpecExtractor.java:81-141 throws on both).

The bucket hash is pinned against the Iceberg spec's published Appendix-B
test vectors, the vectorized numpy path against the scalar path, and the
IR round-trip against the spec-string grammar.
"""

from __future__ import annotations

import datetime as dt
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from onetable_spark.model import PartitionField, PartitionTransform
from onetable_spark.schema.partitions import (
    _murmur3_32_longs,
    bucket_column,
    from_iceberg_transform,
    iceberg_bucket_value,
    iceberg_truncate_value,
    murmur3_32,
    to_iceberg_transform,
    transform_column,
)


def _signed(x: int) -> int:
    return x - (1 << 32) if x >= (1 << 31) else x


# Iceberg spec Appendix B "Bucket transform details" published vectors
SPEC_VECTORS = [
    (struct.pack("<q", 34), 2017239379),          # int/long 34
    (b"iceberg", 1210000089),                      # string
    (bytes([0, 1, 2, 3]), -188683207),             # binary 0x00010203
    (struct.pack("<q", 17486), -653330422),        # date 2017-11-16 (days)
]


def test_murmur3_matches_iceberg_spec_vectors():
    for data, expected in SPEC_VECTORS:
        assert _signed(murmur3_32(data)) == expected


def test_vectorized_longs_match_scalar():
    vals = np.array(
        [0, 1, -1, 34, 17486, 2**31, -(2**31), 2**62, -(2**62), 123456789],
        dtype=np.int64,
    )
    vec = _murmur3_32_longs(vals)
    for v, h in zip(vals, vec):
        assert int(h) == murmur3_32(struct.pack("<q", int(v)))


def test_scalar_bucket_and_truncate():
    # bucket over the spec's long vector: hash 2017239379, N=16 → 3
    assert iceberg_bucket_value(34, 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert iceberg_bucket_value("iceberg", 16) == (1210000089 & 0x7FFFFFFF) % 16
    assert iceberg_bucket_value(dt.date(2017, 11, 16), 16) == (
        (-653330422 & 0xFFFFFFFF) & 0x7FFFFFFF
    ) % 16
    assert iceberg_bucket_value(None, 16) is None
    # truncate: ints floor (negatives DOWN), strings prefix
    assert iceberg_truncate_value(17, 10) == 10
    assert iceberg_truncate_value(-3, 10) == -10
    assert iceberg_truncate_value("iceberg", 3) == "ice"
    assert iceberg_truncate_value(None, 3) is None


def test_spec_string_roundtrip():
    pf = from_iceberg_transform("bucket[16]", "id", "id_bucket")
    assert pf.transform is PartitionTransform.BUCKET
    assert pf.transform_arg == 16
    assert to_iceberg_transform(pf) == "bucket[16]"
    pf = from_iceberg_transform("truncate[4]", "name", "name_trunc")
    assert pf.transform is PartitionTransform.TRUNCATE
    assert pf.transform_arg == 4
    assert to_iceberg_transform(pf) == "truncate[4]"
    with pytest.raises(ValueError, match="unsupported"):
        from_iceberg_transform("void", "x")
    assert not PartitionTransform.BUCKET.is_time_based
    assert not PartitionTransform.TRUNCATE.is_time_based


def test_bucket_column_matches_scalar(spark):
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(-50, 50)] + [(None, None)],
        "id long, name string",
    )
    rows = df.select(
        "id",
        "name",
        bucket_column("id", 8).alias("b_id"),
        bucket_column("name", 8).alias("b_name"),
    ).collect()
    for r in rows:
        assert r["b_id"] == iceberg_bucket_value(r["id"], 8)
        assert r["b_name"] == iceberg_bucket_value(r["name"], 8)


def test_transform_column_truncate(spark):
    from pyspark.sql import types as T

    df = spark.createDataFrame([(17, "iceberg"), (-3, "ab")], "v long, s string")
    pf_i = PartitionField(
        source_field="v", transform=PartitionTransform.TRUNCATE, transform_arg=10
    )
    pf_s = PartitionField(
        source_field="s", transform=PartitionTransform.TRUNCATE, transform_arg=3
    )
    out = df.select(
        transform_column(pf_i).alias("ti"),
        transform_column(pf_s, T.StringType()).alias("ts"),
    ).collect()
    assert [(r["ti"], r["ts"]) for r in out] == [(10, "ice"), (-10, "ab")]


def test_vectorized_longs_match_scalar_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                    min_size=1, max_size=50))
    def check(vals):
        arr = np.array(vals, dtype=np.int64)
        vec = _murmur3_32_longs(arr)
        for v, h in zip(vals, vec):
            assert int(h) == murmur3_32(struct.pack("<q", v))

    check()


def test_bucket_column_null_timestamp_yields_null(spark):
    """ADVICE r13: NaT took the vectorized datetime64 path as int64-min
    and got a spurious bucket id; null timestamps must bucket to NULL
    like every other null (the scalar path's behavior)."""
    import datetime as dt

    ts = dt.datetime(2024, 3, 1, 12, 30, 0)
    df = spark.createDataFrame(
        [(1, ts), (2, None), (3, ts + dt.timedelta(hours=5))],
        "id long, ts timestamp",
    )
    rows = {r["id"]: r["b"] for r in
            df.select("id", bucket_column("ts", 16).alias("b")).collect()}
    assert rows[2] is None
    assert rows[1] == iceberg_bucket_value(ts, 16)
    assert rows[3] == iceberg_bucket_value(ts + dt.timedelta(hours=5), 16)
