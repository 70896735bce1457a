"""C1 Avro logical-type schema converter + IdTracker field-id tracking.

Golden shapes ported from the reference's TestAvroSchemaConverter.java
(primitive/optional matrix :46, logical types :515-522) and IdTracker.java
BFS id assignment (:140-179)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from onetable_spark.formats.avro_schema import (
    ID_TRACKING_PROP,
    UnsupportedAvroTypeError,
    add_id_tracking,
    avro_to_structtype,
    id_tracking_to_field_ids,
    structtype_to_avro,
)

LOGICAL_TYPES_AVRO = json.loads(
    '{"type":"record","name":"logicalTypes","fields":['
    '{"name":"int_date","type":{"type":"int","logicalType":"date"}},'
    '{"name":"long_timestamp_millis","type":{"type":"long","logicalType":"timestamp-millis"}},'
    '{"name":"long_timestamp_micros","type":{"type":"long","logicalType":"timestamp-micros"}},'
    '{"name":"long_timestamp_millis_local","type":{"type":"long","logicalType":"local-timestamp-millis"}},'
    '{"name":"long_timestamp_micros_local","type":{"type":"long","logicalType":"local-timestamp-micros"}},'
    '{"name":"bytes_decimal","type":{"type":"bytes","logicalType":"decimal","precision":4,"scale":2}},'
    '{"name":"fixed_decimal","type":{"type":"fixed","logicalType":"decimal","name":"fixed_field","size":10,"precision":5,"scale":3}},'
    '{"name":"fixed_plain","type":{"type":"fixed","name":"fixed_plain_field","size":10}}]}'
)


def test_logical_types_to_spark():
    st = avro_to_structtype(LOGICAL_TYPES_AVRO)
    by_name = {f.name: f for f in st.fields}
    assert isinstance(by_name["int_date"].dataType, T.DateType)
    assert isinstance(by_name["long_timestamp_millis"].dataType, T.TimestampType)
    assert by_name["long_timestamp_millis"].metadata["timestampPrecision"] == "millis"
    assert isinstance(by_name["long_timestamp_micros"].dataType, T.TimestampType)
    assert by_name["long_timestamp_micros"].metadata["timestampPrecision"] == "micros"
    assert isinstance(by_name["long_timestamp_millis_local"].dataType, T.TimestampNTZType)
    assert isinstance(by_name["long_timestamp_micros_local"].dataType, T.TimestampNTZType)
    assert by_name["bytes_decimal"].dataType == T.DecimalType(4, 2)
    assert by_name["fixed_decimal"].dataType == T.DecimalType(5, 3)
    assert by_name["fixed_decimal"].metadata["fixedSize"] == 10
    assert isinstance(by_name["fixed_plain"].dataType, T.BinaryType)
    assert by_name["fixed_plain"].metadata["fixedSize"] == 10
    # none of these are union-wrapped → all required
    assert not any(f.nullable for f in st.fields)


def test_logical_types_roundtrip():
    st = avro_to_structtype(LOGICAL_TYPES_AVRO)
    back = structtype_to_avro(st, name="logicalTypes")
    types = {f["name"]: f["type"] for f in back["fields"]}
    assert types["int_date"] == {"type": "int", "logicalType": "date"}
    assert types["long_timestamp_millis"] == {"type": "long", "logicalType": "timestamp-millis"}
    assert types["long_timestamp_micros"] == {"type": "long", "logicalType": "timestamp-micros"}
    assert types["long_timestamp_millis_local"]["logicalType"] == "local-timestamp-millis"
    assert types["long_timestamp_micros_local"]["logicalType"] == "local-timestamp-micros"
    assert types["bytes_decimal"] == {
        "type": "bytes", "logicalType": "decimal", "precision": 4, "scale": 2,
    }
    assert types["fixed_decimal"] == {
        "type": "fixed", "name": "fixed_field", "size": 10,
        "logicalType": "decimal", "precision": 5, "scale": 3,
    }
    assert types["fixed_plain"] == {"type": "fixed", "name": "fixed_plain_field", "size": 10}
    # and back again is a fixed point
    assert avro_to_structtype(back) == st


def test_primitive_and_optional_matrix():
    avro = {
        "type": "record",
        "name": "testRecord",
        "fields": [
            {"name": "requiredBoolean", "type": "boolean", "default": False},
            {"name": "optionalBoolean", "type": ["null", "boolean"], "default": None},
            {"name": "requiredInt", "type": "int"},
            {"name": "optionalLong", "type": ["null", "long"], "default": None},
            {"name": "requiredDouble", "type": "double"},
            {"name": "optionalFloat", "type": ["null", "float"], "default": None},
            {"name": "requiredString", "type": "string"},
            {"name": "requiredBytes", "type": "bytes"},
            {
                "name": "requiredEnum",
                "type": {"type": "enum", "name": "REQUIRED_ENUM", "symbols": ["ONE", "TWO"]},
                "default": "ONE",
            },
            {
                "name": "optionalEnum",
                "type": ["null", {"type": "enum", "name": "OPTIONAL_ENUM", "symbols": ["THREE", "FOUR"]}],
                "default": None,
            },
        ],
    }
    st = avro_to_structtype(avro)
    by_name = {f.name: f for f in st.fields}
    assert isinstance(by_name["requiredBoolean"].dataType, T.BooleanType)
    assert not by_name["requiredBoolean"].nullable and by_name["optionalBoolean"].nullable
    assert isinstance(by_name["requiredInt"].dataType, T.IntegerType)
    assert isinstance(by_name["optionalLong"].dataType, T.LongType)
    assert by_name["requiredEnum"].metadata["enumSymbols"] == ["ONE", "TWO"]
    back = structtype_to_avro(st, name="testRecord")
    enum_back = {f["name"]: f for f in back["fields"]}["requiredEnum"]["type"]
    assert enum_back == {"type": "enum", "name": "REQUIRED_ENUM", "symbols": ["ONE", "TWO"]}
    opt_enum = {f["name"]: f for f in back["fields"]}["optionalEnum"]
    assert opt_enum["type"][0] == "null" and opt_enum["default"] is None
    assert opt_enum["type"][1]["symbols"] == ["THREE", "FOUR"]


def test_nested_record_array_map_roundtrip():
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "nested",
                T.StructType([T.StructField("x", T.IntegerType(), True)]),
                True,
            ),
            T.StructField("tags", T.ArrayType(T.StringType(), containsNull=False), True),
            T.StructField(
                "props", T.MapType(T.StringType(), T.DoubleType(), valueContainsNull=True), True
            ),
            T.StructField("ts", T.TimestampNTZType(), True),
            T.StructField("d", T.DecimalType(20, 2), True),
            T.StructField("day", T.DateType(), True),
        ]
    )
    avro = structtype_to_avro(st, name="top")
    back = avro_to_structtype(avro)
    # timestampPrecision metadata appears on the way back; compare types+nullability
    assert [(f.name, f.dataType, f.nullable) for f in back.fields] == [
        (f.name, f.dataType, f.nullable) for f in st.fields
    ]
    # map with non-string keys has no Avro form
    bad = T.StructType([T.StructField("m", T.MapType(T.IntegerType(), T.StringType()), True)])
    with pytest.raises(UnsupportedAvroTypeError):
        structtype_to_avro(bad)


def test_complex_union_rejected():
    avro = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "u", "type": ["null", "int", "string"]}],
    }
    with pytest.raises(UnsupportedAvroTypeError):
        avro_to_structtype(avro)


def test_id_tracking_bfs_assignment():
    avro = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "int"},
            {
                "name": "rec",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "int"}, {"name": "y", "type": "int"}],
                },
            },
            {"name": "arr", "type": {"type": "array", "items": "string"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
        ],
    }
    tracked = add_id_tracking(avro)
    ids = id_tracking_to_field_ids(tracked)
    # level 0 assigned first (BFS), nested children after ALL top-level ids
    assert ids["a"] == 1 and ids["rec"] == 2 and ids["arr"] == 3 and ids["m"] == 4
    assert ids["rec.x"] == 5 and ids["rec.y"] == 6
    assert ids["arr.element"] == 7
    assert ids["m.key"] == 8 and ids["m.value"] == 9
    assert tracked[ID_TRACKING_PROP]["lastIdUsed"] == 9


def test_id_tracking_stable_across_evolution():
    avro1 = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "int"}, {"name": "b", "type": "string"}],
    }
    tracked1 = add_id_tracking(avro1)
    # drop b, add c — a keeps its id, c gets a FRESH id (b's id never reused)
    avro2 = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "int"}, {"name": "c", "type": "long"}],
    }
    tracked2 = add_id_tracking(avro2, previous=tracked1)
    ids1, ids2 = id_tracking_to_field_ids(tracked1), id_tracking_to_field_ids(tracked2)
    assert ids2["a"] == ids1["a"] == 1
    assert ids2["c"] == 3  # lastIdUsed was 2; never collides with dropped b
    assert tracked2[ID_TRACKING_PROP]["lastIdUsed"] == 3


def test_hudi_to_iceberg_sync_is_field_id_stable(spark, sf_dir, tmp_path):
    """IdTracker parity end-to-end: the ids a Hudi table tracks in its Avro
    create schema are the ids the synced Iceberg schema carries."""
    import os
    import shutil

    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import SyncStatus, Table as TableModel, TableFormat
    from onetable_spark.sources.parquet_inventory import inventory_from_directory
    from onetable_spark.sync import SyncClient, source_for, target_for

    table_path = str(tmp_path / "hsrc")
    os.makedirs(table_path)
    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(table_path, "r.parquet"))
    schema = spark.read.parquet(table_path).schema
    tl = HudiTimeline(spark, table_path)
    tl.init_table(
        TableModel(
            name="hsrc",
            base_path=table_path,
            table_format=TableFormat.HUDI,
            read_schema=schema,
        )
    )
    tl.commit(adds=inventory_from_directory(spark, table_path), schema=schema)

    tracked = id_tracking_to_field_ids(
        json.loads(tl.table_properties()["hoodie.table.create.schema"])
    )
    results = SyncClient(spark).sync(
        source_for(spark, TableFormat.HUDI, table_path),
        [target_for(spark, TableFormat.ICEBERG, table_path)],
    )
    assert results[TableFormat.ICEBERG].status == SyncStatus.SUCCESS
    ice_schema = IcebergTable(spark, table_path)._schema_for(
        IcebergTable(spark, table_path).metadata()
    )
    ice_ids = {f["name"]: f["id"] for f in ice_schema["fields"]}
    assert ice_ids == {name: fid for name, fid in tracked.items() if "." not in name}


# ------------------------------------------------------- property tests

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_scalar_types = st.sampled_from(
    [
        T.BooleanType(),
        T.IntegerType(),
        T.LongType(),
        T.FloatType(),
        T.DoubleType(),
        T.StringType(),
        T.BinaryType(),
        T.DateType(),
        T.TimestampType(),
        T.TimestampNTZType(),
        T.DecimalType(20, 4),
    ]
)
_names = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)


def _field(draw_type, name):
    return T.StructField(name, draw_type, True)


_types = st.recursive(
    _scalar_types,
    lambda inner: st.one_of(
        st.builds(lambda t, n: T.ArrayType(t, containsNull=n), inner, st.booleans()),
        st.builds(
            lambda t, n: T.MapType(T.StringType(), t, valueContainsNull=n),
            inner,
            st.booleans(),
        ),
        st.builds(
            lambda fields: T.StructType(fields),
            st.lists(
                st.builds(_field, inner, _names), min_size=1, max_size=3,
                unique_by=lambda f: f.name,
            ),
        ),
    ),
    max_leaves=6,
)
_schemas = st.builds(
    lambda fields: T.StructType(fields),
    st.lists(
        st.builds(
            lambda t, n, nullable: T.StructField(n, t, nullable),
            _types, _names, st.booleans(),
        ),
        min_size=1,
        max_size=5,
        unique_by=lambda f: f.name,
    ),
)


def _shape(dt):
    """Type skeleton ignoring metadata, normalizing what Avro can't carry
    (byte/short widen to int — not generated here, so pure identity)."""
    if isinstance(dt, T.StructType):
        return ("struct", tuple((f.name, _shape(f.dataType), f.nullable) for f in dt.fields))
    if isinstance(dt, T.ArrayType):
        return ("array", _shape(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return ("map", _shape(dt.valueType), dt.valueContainsNull)
    return dt.simpleString()


@settings(max_examples=60, deadline=None)
@given(_schemas)
def test_avro_roundtrip_property(schema):
    """structtype→avro→structtype preserves every type, nullability flag,
    and nesting for the full generatable type algebra."""
    back = avro_to_structtype(structtype_to_avro(schema, name="prop"))
    assert _shape(back) == _shape(schema)


@settings(max_examples=40, deadline=None)
@given(_schemas)
def test_id_tracking_total_and_unique(schema):
    """Every trackable path gets exactly one id; ids are dense 1..last."""
    tracked = add_id_tracking(structtype_to_avro(schema, name="prop"))
    ids = id_tracking_to_field_ids(tracked)
    vals = sorted(ids.values())
    assert vals == list(range(1, len(vals) + 1))
    assert tracked[ID_TRACKING_PROP]["lastIdUsed"] == len(vals)
