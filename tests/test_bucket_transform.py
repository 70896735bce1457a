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


def test_decimal_uuid_spec_vectors():
    """r14: the remaining Appendix-B bucket types — decimal hashes the
    minimal-length big-endian two's-complement of its unscaled value,
    uuid its 16 big-endian bytes. Vectors from the Iceberg spec table."""
    import decimal
    import uuid

    from onetable_spark.schema.partitions import murmur3_32

    def signed(h):
        return h - (1 << 32) if h >= (1 << 31) else h

    # decimal 14.20 → unscaled 1420 → bytes 05 8C → -500754589
    d = decimal.Decimal("14.20")
    assert iceberg_bucket_value(d, 1 << 31) == (-500754589) & 0x7FFFFFFF
    assert signed(murmur3_32(b"\x05\x8c")) == -500754589
    # uuid f79c3e09-677c-4bbd-a479-3f349cb785e7 → 1488055340
    u = uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    assert iceberg_bucket_value(u, 1 << 31) == 1488055340 & 0x7FFFFFFF
    # minimal-length encoding edge: -128 is ONE byte (0x80), 128 is two
    assert iceberg_bucket_value(decimal.Decimal("-128"), 1 << 31) == (
        murmur3_32(b"\x80") & 0x7FFFFFFF
    )
    assert iceberg_bucket_value(decimal.Decimal("128"), 1 << 31) == (
        murmur3_32(b"\x00\x80") & 0x7FFFFFFF
    )
    assert iceberg_bucket_value(decimal.Decimal("0.00"), 1 << 31) == (
        murmur3_32(b"\x00") & 0x7FFFFFFF
    )


def test_truncate_decimal_and_binary():
    """r14: truncate[W] floors a decimal's UNSCALED value to the
    W-multiple at the same scale (spec example: W=50 of 10.65 → 10.50)
    and keeps a binary's first W bytes."""
    import decimal

    from onetable_spark.schema.partitions import iceberg_truncate_value

    assert iceberg_truncate_value(decimal.Decimal("10.65"), 50) == decimal.Decimal("10.50")
    assert iceberg_truncate_value(decimal.Decimal("-0.05"), 50) == decimal.Decimal("-0.50")
    assert iceberg_truncate_value(b"\x01\x02\x03\x04\x05", 3) == b"\x01\x02\x03"
    assert iceberg_truncate_value(b"\x01", 3) == b"\x01"


def test_transform_column_truncate_decimal_binary(spark):
    """The Spark-side truncate expressions agree with the scalar spec
    functions for decimal and binary columns (pure built-ins, no UDF)."""
    import decimal

    from pyspark.sql import types as T

    from onetable_spark.schema.partitions import iceberg_truncate_value

    df = spark.createDataFrame(
        [(decimal.Decimal("10.65"), b"\x01\x02\x03\x04"),
         (decimal.Decimal("-0.05"), b"\xff"),
         (None, None)],
        T.StructType([
            T.StructField("d", T.DecimalType(9, 2)),
            T.StructField("b", T.BinaryType()),
        ]),
    )
    pf_d = PartitionField(
        source_field="d", transform=PartitionTransform.TRUNCATE, transform_arg=50
    )
    pf_b = PartitionField(
        source_field="b", transform=PartitionTransform.TRUNCATE, transform_arg=3
    )
    out = df.select(
        "d", "b",
        transform_column(pf_d, T.DecimalType(9, 2)).alias("td"),
        transform_column(pf_b, T.BinaryType()).alias("tb"),
    ).collect()
    for r in out:
        assert r["td"] == iceberg_truncate_value(r["d"], 50)
        assert (bytes(r["tb"]) if r["tb"] is not None else None) == \
            iceberg_truncate_value(bytes(r["b"]) if r["b"] is not None else None, 3)


def test_bucket_column_decimal_matches_scalar(spark):
    """bucket_column over a DecimalType column (Arrow delivers Decimal
    objects — the per-row map path) agrees with the scalar spec form."""
    import decimal

    from pyspark.sql import types as T

    vals = [decimal.Decimal(k) + decimal.Decimal("0.25") for k in range(5)]
    df = spark.createDataFrame(
        [(v,) for v in vals] + [(None,)],
        T.StructType([T.StructField("d", T.DecimalType(9, 2))]),
    )
    rows = df.select("d", bucket_column("d", 4).alias("b")).collect()
    for r in rows:
        assert r["b"] == iceberg_bucket_value(r["d"], 4)
