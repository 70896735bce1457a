"""Golden conformance vectors from the reference's own test resources:
`core/src/test/resources/schemas/catalog_sales.json` and
`partition_specs/catalog_sales.json` — a REAL Iceberg schema (field-ids,
required flags, decimal types) plus an identity partition spec, authored
by the reference project, never by this repo. Round-tripping them through
our C3 (`iceberg_to_structtype`/`structtype_to_iceberg`) and C6
(`from_iceberg_transform`/`to_iceberg_transform`) converters certifies
those converters against bytes we did not write (VERDICT r8/r9 task: the
reference golden fixtures were a free independently-authored conformance
vector going unused)."""

from __future__ import annotations

import json
import os
from pathlib import Path

import pytest
from pyspark.sql import types as T

from onetable_spark.formats.iceberg import (
    IcebergTable,
    iceberg_to_structtype,
    structtype_to_iceberg,
)
from onetable_spark.model import PartitionTransform, Table, TableFormat
from onetable_spark.schema.partitions import (
    from_iceberg_transform,
    to_iceberg_transform,
)

FIXTURES = Path(__file__).parent / "fixtures" / "iceberg_golden"
SCHEMA = json.loads((FIXTURES / "catalog_sales_schema.json").read_text())
SPEC = json.loads((FIXTURES / "catalog_sales_spec.json").read_text())


def test_catalog_sales_schema_to_structtype_exact():
    st = iceberg_to_structtype(SCHEMA)
    assert [f.name for f in st.fields] == [
        "cs_sold_time_sk",
        "cs_ship_date_sk",
        "cs_order_number",
        "cs_quantity",
        "cs_wholesale_cost",
        "cs_list_price",
        "cs_sold_date_sk",
    ]
    assert [f.dataType for f in st.fields] == [
        T.IntegerType(),
        T.IntegerType(),
        T.LongType(),
        T.IntegerType(),
        T.DecimalType(7, 2),
        T.DecimalType(7, 2),
        T.IntegerType(),
    ]
    # required <-> nullable inversion: only cs_sold_date_sk is required
    assert [f.nullable for f in st.fields] == [True] * 6 + [False]
    # field-ids preserved verbatim into StructField.metadata
    assert [f.metadata["fieldId"] for f in st.fields] == [1, 2, 3, 4, 5, 6, 7]


def test_catalog_sales_schema_roundtrip_bit_exact():
    """IR -> Iceberg JSON must reproduce the reference fixture EXACTLY
    (ids, required flags, decimal rendering, field order)."""
    st = iceberg_to_structtype(SCHEMA)
    out, next_id = structtype_to_iceberg(st)
    assert out == {**SCHEMA, "schema-id": 0}
    assert next_id == 8  # counter parked above the highest preassigned id


def test_catalog_sales_identifier_field_ids():
    """recordKeyFields -> identifier-field-ids only when every key is
    required (IcebergSchemaExtractor.java:69-99)."""
    st = iceberg_to_structtype(SCHEMA)
    keyed, _ = structtype_to_iceberg(st, record_keys=("cs_sold_date_sk",))
    assert keyed["identifier-field-ids"] == [7]
    # cs_quantity is optional -> the whole key set is rejected
    mixed, _ = structtype_to_iceberg(st, record_keys=("cs_sold_date_sk", "cs_quantity"))
    assert "identifier-field-ids" not in mixed


def test_catalog_sales_spec_to_ir_and_back():
    [field] = SPEC["fields"]
    pf = from_iceberg_transform(field["transform"], "cs_sold_date_sk", field["name"])
    assert pf.transform is PartitionTransform.VALUE
    assert pf.source_field == "cs_sold_date_sk" and pf.name == "cs_sold_date_sk"
    assert to_iceberg_transform(pf) == "identity"


def test_catalog_sales_table_init_emits_the_golden_spec(spark, tmp_path):
    """End-to-end: init an IcebergTable from the golden schema + spec IR
    and require the on-disk metadata.json to carry the fixture's schema
    and partition-spec fields verbatim (source-id 7, field-id 1000)."""
    st = iceberg_to_structtype(SCHEMA)
    [field] = SPEC["fields"]
    pf = from_iceberg_transform(field["transform"], "cs_sold_date_sk", field["name"])
    base = str(tmp_path / "catalog_sales")
    tbl = IcebergTable(spark, base)
    tbl.init_table(
        Table(
            name="catalog_sales",
            base_path=base,
            table_format=TableFormat.ICEBERG,
            read_schema=st,
            partition_fields=(pf,),
        )
    )
    md_path = os.path.join(base, "metadata", "v1.metadata.json")
    md = json.loads(Path(md_path).read_text())
    assert md["schema"] == {**SCHEMA, "schema-id": 0}
    assert md["partition-specs"] == [{"spec-id": 0, "fields": SPEC["fields"]}]
    assert md["default-spec-id"] == SPEC["spec-id"]
    assert md["last-column-id"] == 7
