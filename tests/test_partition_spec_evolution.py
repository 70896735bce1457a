"""K7 partition-spec evolution sync + K11 Hudi guardrails.

A live source whose partition spec changes mid-stream (VALUE → MONTH) must
replay the diff on Delta/Iceberg targets as the reference does
(IcebergPartitionSpecSync.java:43-68: remove-by-name, add-by-name with
fresh field-ids, retained fields keep theirs); the Hudi target pins its
table config at creation and rejects the change
(HudiTableManager.java:190-240).
"""

from __future__ import annotations

import os
import shutil

import pytest

from onetable_spark.formats.delta import DeltaLog
from onetable_spark.formats.hudi import HudiTimeline
from onetable_spark.formats.iceberg import IcebergTable
from onetable_spark.model import (
    PartitionField,
    PartitionTransform,
    Snapshot,
    Table,
    TableFormat,
    TableMetadata,
)
from onetable_spark.sources.parquet_inventory import inventory_from_directory
from onetable_spark.sync import target_for


@pytest.fixture()
def orders_table(spark, sf_dir, tmp_path):
    table_path = str(tmp_path / "orders")
    os.makedirs(table_path)
    shutil.copy(
        os.path.join(sf_dir, "orders.parquet"), os.path.join(table_path, "o1.parquet")
    )
    schema = spark.read.parquet(table_path).schema
    inv = inventory_from_directory(spark, table_path)
    return table_path, schema, inv


def _snap(table_path, schema, inv, pfields):
    return Snapshot(
        table=Table(
            name="orders",
            base_path=table_path,
            table_format=TableFormat.PARQUET,
            read_schema=schema,
            partition_fields=pfields,
        ),
        files=inv,
        version="1",
    )


SPEC_V1 = (PartitionField(source_field="o_orderpriority"),)
SPEC_V2 = (
    PartitionField(
        source_field="o_orderdate",
        transform=PartitionTransform.MONTH,
        partition_field_name="order_month",
    ),
)


def test_iceberg_spec_evolution_appends_new_spec(spark, orders_table):
    table_path, schema, inv = orders_table
    target = target_for(spark, TableFormat.ICEBERG, table_path)
    target.sync_snapshot(_snap(table_path, schema, inv, SPEC_V1), TableMetadata(1))
    ice = IcebergTable(spark, table_path)
    md = ice.metadata()
    assert md["default-spec-id"] == 0
    v1_field_ids = {f["name"]: f["field-id"] for f in ice._spec_for(md)}
    assert list(v1_field_ids) == ["o_orderpriority"]

    target.sync_snapshot(_snap(table_path, schema, inv, SPEC_V2), TableMetadata(2))
    md = ice.metadata()
    # new immutable spec appended, default moved, old spec untouched
    assert md["default-spec-id"] == 1
    assert len(md["partition-specs"]) == 2
    new_spec = ice._spec_for(md)
    assert [f["name"] for f in new_spec] == ["order_month"]
    assert new_spec[0]["transform"] == "month"
    assert new_spec[0]["field-id"] > v1_field_ids["o_orderpriority"]
    old_spec = next(s for s in md["partition-specs"] if s["spec-id"] == 0)
    assert [f["name"] for f in old_spec["fields"]] == ["o_orderpriority"]
    # descriptor reflects the evolved spec
    desc = ice.table_descriptor()
    assert [(p.source_field, p.transform) for p in desc.partition_fields] == [
        ("o_orderdate", PartitionTransform.MONTH)
    ]
    # file set still hash-identical after the spec replay
    paths = {r["path"] for r in ice.snapshot_files().collect()}
    assert paths == {r["path"] for r in inv.collect()}


def test_iceberg_spec_evolution_retains_field_ids(spark, orders_table):
    """A field surviving the evolution keeps its partition field-id
    (spec: field-ids are stable identifiers across specs)."""
    table_path, schema, inv = orders_table
    both = SPEC_V1 + SPEC_V2
    target = target_for(spark, TableFormat.ICEBERG, table_path)
    target.sync_snapshot(_snap(table_path, schema, inv, both), TableMetadata(1))
    ice = IcebergTable(spark, table_path)
    fid_before = {
        f["name"]: f["field-id"] for f in ice._spec_for(ice.metadata())
    }

    # drop o_orderpriority, keep order_month
    target.sync_snapshot(_snap(table_path, schema, inv, SPEC_V2), TableMetadata(2))
    spec = ice._spec_for(ice.metadata())
    assert [f["name"] for f in spec] == ["order_month"]
    assert spec[0]["field-id"] == fid_before["order_month"]

    # unchanged spec → no new spec appended
    md_before = ice.metadata()
    target.sync_snapshot(_snap(table_path, schema, inv, SPEC_V2), TableMetadata(3))
    assert ice.metadata()["default-spec-id"] == md_before["default-spec-id"]
    assert len(ice.metadata()["partition-specs"]) == len(md_before["partition-specs"])


def test_delta_spec_evolution_replays_partition_columns(spark, orders_table):
    table_path, schema, inv = orders_table
    target = target_for(spark, TableFormat.DELTA, table_path)
    target.sync_snapshot(_snap(table_path, schema, inv, SPEC_V1), TableMetadata(1))
    log = DeltaLog(spark, table_path)
    assert log.snapshot_info().metadata["partitionColumns"] == ["o_orderpriority"]

    target.sync_snapshot(_snap(table_path, schema, inv, SPEC_V2), TableMetadata(2))
    info = log.snapshot_info()
    assert info.metadata["partitionColumns"] == ["order_month"]
    # generated-column expression round-trips through the descriptor
    desc = log.table_descriptor()
    assert [(p.source_field, p.transform) for p in desc.partition_fields] == [
        ("o_orderdate", PartitionTransform.MONTH)
    ]
    paths = {r["path"] for r in log.snapshot_files().collect()}
    assert paths == {r["path"] for r in inv.collect()}


def test_hudi_rejects_spec_and_key_changes(spark, orders_table):
    table_path, schema, inv = orders_table
    target = target_for(spark, TableFormat.HUDI, table_path)
    target.sync_snapshot(_snap(table_path, schema, inv, SPEC_V1), TableMetadata(1))

    with pytest.raises(ValueError, match="partition spec change rejected"):
        target.sync_snapshot(_snap(table_path, schema, inv, SPEC_V2), TableMetadata(2))

    # record-key change equally rejected
    tl = HudiTimeline(spark, table_path)
    assert tl.exists()
    keyed = Snapshot(
        table=Table(
            name="orders",
            base_path=table_path,
            table_format=TableFormat.PARQUET,
            read_schema=schema,
            partition_fields=SPEC_V1,
            record_key_fields=("o_orderkey",),
        ),
        files=inv,
        version="2",
    )
    # first keyed sync is fine only if the table pinned no keys at creation
    target.sync_snapshot(keyed, TableMetadata(3))

    # target untouched by the rejected sync: still exactly the v1 spec
    assert tl.table_properties().get("hoodie.table.partition.fields") == "o_orderpriority"
