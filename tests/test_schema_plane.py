"""Golden tests for schema evolution diffing and partition converters
(mirrors the reference's converter unit-test strategy, SURVEY §5.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from onetable_spark.model.core import PartitionField, PartitionTransform
from onetable_spark.schema.evolution import (
    OpKind,
    apply_ops,
    diff_schemas,
    to_sql_statements,
)
from onetable_spark.schema.partitions import (
    from_iceberg_transform,
    iceberg_value_to_millis,
    millis_to_iceberg_value,
    parse_delta_generation_expr,
    parse_hive_partition_path,
    parse_hudi_partition_config,
    to_delta_generation_expr,
    to_iceberg_transform,
)


def s(*fields):
    return T.StructType(list(fields))


def f(name, dtype, nullable=True, fid=None):
    md = {"fieldId": fid} if fid is not None else {}
    return T.StructField(name, dtype, nullable, metadata=md)


class TestEvolution:
    def test_add_drop_order(self):
        old = s(f("a", T.LongType()), f("b", T.StringType()))
        new = s(f("a", T.LongType()), f("c", T.DoubleType()))
        ops = diff_schemas(old, new)
        assert [op.kind for op in ops] == [OpKind.DROP, OpKind.ADD]
        assert ops[0].path == "b" and ops[1].path == "c"
        assert apply_ops(old, ops) == new

    def test_rename_via_field_id(self):
        old = s(f("a", T.LongType(), fid=1), f("b", T.StringType(), fid=2))
        new = s(f("a", T.LongType(), fid=1), f("b2", T.StringType(), fid=2))
        ops = diff_schemas(old, new)
        assert [op.kind for op in ops] == [OpKind.RENAME]
        assert ops[0].path == "b" and ops[0].new_name == "b2"

    def test_rename_plus_widen(self):
        old = s(f("n", T.IntegerType(), fid=7))
        new = s(f("n2", T.LongType(), fid=7))
        ops = diff_schemas(old, new)
        # widen applies on the OLD name, then the rename
        assert [op.kind for op in ops] == [OpKind.WIDEN_TYPE, OpKind.RENAME]
        out = apply_ops(old, ops)
        assert out.fields[0].name == "n2" and out.fields[0].dataType == T.LongType()

    def test_widen_and_relax(self):
        old = s(f("n", T.IntegerType(), nullable=False), f("x", T.FloatType()))
        new = s(f("n", T.LongType(), nullable=True), f("x", T.DoubleType()))
        ops = diff_schemas(old, new)
        kinds = {op.kind for op in ops}
        assert kinds == {OpKind.WIDEN_TYPE, OpKind.RELAX_NULLABILITY}
        assert apply_ops(old, ops) == new

    def test_nested_struct_and_array(self):
        old = s(f("rec", s(f("x", T.IntegerType()))), f("arr", T.ArrayType(T.IntegerType())))
        new = s(f("rec", s(f("x", T.IntegerType()), f("y", T.StringType()))),
                f("arr", T.ArrayType(T.LongType())))
        ops = diff_schemas(old, new)
        paths = {op.path: op.kind for op in ops}
        assert paths == {"rec.y": OpKind.ADD, "arr.element": OpKind.WIDEN_TYPE}
        assert apply_ops(old, ops) == new

    def test_illegal_narrowing_rejected(self):
        with pytest.raises(ValueError, match="illegal type evolution"):
            diff_schemas(s(f("n", T.LongType())), s(f("n", T.IntegerType())))

    def test_map_key_change_rejected(self):
        old = s(f("m", T.MapType(T.StringType(), T.LongType())))
        new = s(f("m", T.MapType(T.LongType(), T.LongType())))
        with pytest.raises(ValueError, match="map key"):
            diff_schemas(old, new)

    def test_required_add_rejected(self):
        with pytest.raises(ValueError, match="required column"):
            diff_schemas(s(f("a", T.LongType())), s(f("a", T.LongType()), f("b", T.LongType(), nullable=False)))

    def test_decimal_precision_growth(self):
        old = s(f("d", T.DecimalType(10, 2)))
        new = s(f("d", T.DecimalType(18, 2)))
        ops = diff_schemas(old, new)
        assert ops[0].kind is OpKind.WIDEN_TYPE
        with pytest.raises(ValueError):
            diff_schemas(new, old)  # precision shrink
        with pytest.raises(ValueError):
            diff_schemas(old, s(f("d", T.DecimalType(18, 4))))  # scale change

    def test_sql_emitter(self):
        old = s(f("a", T.IntegerType()), f("gone", T.StringType()))
        new = s(f("a", T.LongType()), f("fresh", T.StringType()))
        stmts = to_sql_statements(diff_schemas(old, new), "t")
        assert stmts == [
            "ALTER TABLE t DROP COLUMN gone",
            "ALTER TABLE t ADD COLUMN fresh string",
            "ALTER TABLE t ALTER COLUMN a TYPE bigint",
        ]


class TestPartitions:
    @pytest.mark.parametrize(
        "expr,name,src,transform",
        [
            ("YEAR(ts)", "ts_year", "ts", PartitionTransform.YEAR),
            ("month(ts)", "m", "ts", PartitionTransform.MONTH),
            ("DAY(created)", "d", "created", PartitionTransform.DAY),
            ("HOUR(ts)", "h", "ts", PartitionTransform.HOUR),
            ("CAST(ts AS DATE)", "d", "ts", PartitionTransform.DAY),
            ("DATE_FORMAT(ts, 'yyyy-MM-dd')", "d", "ts", PartitionTransform.DAY),
            ("DATE_FORMAT(ts, 'yyyy-MM')", "m", "ts", PartitionTransform.MONTH),
        ],
    )
    def test_delta_generation_parse(self, expr, name, src, transform):
        pf = parse_delta_generation_expr(expr, name)
        assert pf.source_field == src and pf.transform is transform

    def test_delta_generation_roundtrip(self):
        pf = PartitionField("ts", PartitionTransform.MONTH, "ts_month")
        assert parse_delta_generation_expr(to_delta_generation_expr(pf), "ts_month").transform is PartitionTransform.MONTH

    def test_delta_bad_exprs(self):
        with pytest.raises(ValueError):
            parse_delta_generation_expr("SUBSTRING(c, 1, 2)", "p")
        with pytest.raises(ValueError):
            parse_delta_generation_expr("DATE_FORMAT(ts, 'HH:mm')", "p")

    def test_iceberg_transforms(self):
        pf = from_iceberg_transform("day", "ts")
        assert pf.transform is PartitionTransform.DAY
        assert to_iceberg_transform(pf) == "day"
        assert to_iceberg_transform(from_iceberg_transform("identity", "c")) == "identity"
        # r13: bucket/truncate are SUPPORTED (beyond the reference, which
        # throws — see tests/test_bucket_transform.py); only void refuses
        pf = from_iceberg_transform("bucket[16]", "c")
        assert pf.transform is PartitionTransform.BUCKET and pf.transform_arg == 16
        with pytest.raises(ValueError):
            from_iceberg_transform("void", "c")

    @pytest.mark.parametrize(
        "transform,value,millis",
        [
            (PartitionTransform.YEAR, 54, 1704067200000),       # 2024-01-01
            (PartitionTransform.MONTH, 54 * 12 + 6, 1719792000000),  # 2024-07-01
            (PartitionTransform.DAY, 19723, 19723 * 86_400_000),
            (PartitionTransform.HOUR, 473352, 473352 * 3_600_000),
        ],
    )
    def test_iceberg_value_roundtrip(self, transform, value, millis):
        assert iceberg_value_to_millis(transform, value) == millis
        assert millis_to_iceberg_value(transform, millis) == value

    def test_hudi_config_parse(self):
        pfs = parse_hudi_partition_config("region:VALUE,ts:TIMESTAMP:yyyy-MM-dd")
        assert pfs[0].transform is PartitionTransform.VALUE
        assert pfs[1].transform is PartitionTransform.DAY
        with pytest.raises(ValueError):
            parse_hudi_partition_config("ts:TIMESTAMP")  # missing format

    def test_hive_path_parse(self):
        vals = parse_hive_partition_path("region=EU/day=2024-01-01")
        assert vals == {"region": "EU", "day": "2024-01-01"}
        assert parse_hive_partition_path("k=__HIVE_DEFAULT_PARTITION__") == {"k": None}
        with pytest.raises(ValueError):
            parse_hive_partition_path("noequalsign")


# ---------------------------------------------------------- property-based

from hypothesis import given, settings
from hypothesis import strategies as st

_prims = [T.LongType(), T.IntegerType(), T.StringType(), T.DoubleType(), T.DecimalType(12, 3)]
_names2 = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
_flat_schemas = st.builds(
    lambda fields: T.StructType(fields),
    st.lists(
        st.builds(T.StructField, _names2, st.sampled_from(_prims), st.booleans()),
        min_size=1,
        max_size=6,
        unique_by=lambda f: f.name,
    ),
)


@settings(max_examples=50, deadline=None)
@given(_flat_schemas)
def test_diff_identity_property(schema):
    assert diff_schemas(schema, schema) == []


@settings(max_examples=50, deadline=None)
@given(_flat_schemas, _flat_schemas)
def test_diff_apply_inverse_property(old, new):
    """Whenever the diff is legal, applying it to old must produce new
    exactly (modulo field order for added columns, which append)."""
    # nullable-ize adds so they're always legal; skip cases diff rejects
    new = T.StructType([T.StructField(f.name, f.dataType, True) for f in new.fields])
    old = T.StructType([T.StructField(f.name, f.dataType, True) for f in old.fields])
    try:
        ops = diff_schemas(old, new)
    except ValueError:
        return  # illegal evolution — correctly rejected
    result = apply_ops(old, ops)
    assert {(f.name, f.dataType, f.nullable) for f in result.fields} == {
        (f.name, f.dataType, f.nullable) for f in new.fields
    }
