"""Post-sync validation plane (api/.../model/validation — the reference
declares ValidationCheck/Checker/Result but never implements them; this
suite pins our real implementation: green across a healthy 3-format sync,
and each check individually RED when its own invariant is broken)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from onetable_spark.formats.delta import DeltaLog
from onetable_spark.formats.hudi import HudiTimeline
from onetable_spark.formats.iceberg import IcebergTable
from onetable_spark.model import Table, TableFormat
from onetable_spark.sources.parquet_inventory import build_inventory
from onetable_spark.sync import (
    ALL_CHECKS,
    SyncClient,
    SyncValidator,
    ValidationCheck,
    source_for,
    target_for,
)


@pytest.fixture()
def synced_tri_format(spark, sf_dir, tmp_path):
    """Delta source with one nation file, synced into Iceberg + Hudi."""
    base = str(tmp_path / "val")
    os.makedirs(base)
    shutil.copy(os.path.join(sf_dir, "nation.parquet"), os.path.join(base, "f1.parquet"))
    schema = spark.read.parquet(base).schema
    log = DeltaLog(spark, base)
    log.init_table(
        Table(name="val", base_path=base, table_format=TableFormat.DELTA, read_schema=schema)
    )
    log.commit(adds=build_inventory(spark, [os.path.join(base, "f1.parquet")], root=base))
    r = SyncClient(spark).sync(
        source_for(spark, TableFormat.DELTA, base),
        [
            target_for(spark, TableFormat.ICEBERG, base),
            target_for(spark, TableFormat.HUDI, base),
        ],
    )
    assert all(x.status.value == "SUCCESS" for x in r.values()), r
    return base


def test_all_checks_pass_after_sync(spark, synced_tri_format):
    base = synced_tri_format
    source = DeltaLog(spark, base)
    validator = SyncValidator()
    for reader in (IcebergTable(spark, base), HudiTimeline(spark, base)):
        results = validator.validate(source, reader)
        assert set(results) == set(ALL_CHECKS)
        for check, res in results.items():
            assert res.success, f"{type(reader).__name__} {check}: {res.error_message}"
            assert res.error_message is None
            assert res.instant_millis > 0


def test_schema_drift_fails_check_schema_only(spark, synced_tri_format):
    """Evolve the SOURCE schema without syncing: the target must now fail
    CHECK_SCHEMA while the file-level checks stay green."""
    base = synced_tri_format
    log = DeltaLog(spark, base)
    meta = log.update_configuration({})
    schema = json.loads(meta["schemaString"])
    schema["fields"].append({"name": "v_extra", "type": "long", "nullable": True, "metadata": {}})
    meta["schemaString"] = json.dumps(schema)
    log.commit(metadata=meta)

    results = SyncValidator().validate(log, IcebergTable(spark, base))
    assert not results[ValidationCheck.CHECK_SCHEMA].success
    assert "v_extra" in results[ValidationCheck.CHECK_SCHEMA].error_message
    assert results[ValidationCheck.CHECK_BASIC_COUNTS].success
    assert results[ValidationCheck.COMPARE_STATISTICS].success


def test_missing_commit_fails_count_and_stats(spark, sf_dir, synced_tri_format):
    """Advance the source one commit WITHOUT syncing: the lagging target
    must fail CHECK_BASIC_COUNTS and COMPARE_STATISTICS (with the missing
    file named), while spec/schema stay green."""
    base = synced_tri_format
    f2 = os.path.join(base, "f2.parquet")
    shutil.copy(os.path.join(sf_dir, "nation.parquet"), f2)
    log = DeltaLog(spark, base)
    log.commit(adds=build_inventory(spark, [f2], root=base))

    results = SyncValidator().validate(log, IcebergTable(spark, base))
    assert results[ValidationCheck.CHECK_TABLE_SPEC].success
    assert results[ValidationCheck.CHECK_SCHEMA].success
    counts = results[ValidationCheck.CHECK_BASIC_COUNTS]
    assert not counts.success and "files=2" in counts.error_message
    stats = results[ValidationCheck.COMPARE_STATISTICS]
    assert not stats.success and "f2.parquet" in stats.error_message


def test_subset_of_checks_runs_only_those(spark, synced_tri_format):
    results = SyncValidator().validate(
        DeltaLog(spark, synced_tri_format),
        HudiTimeline(spark, synced_tri_format),
        checks=(ValidationCheck.CHECK_BASIC_COUNTS,),
    )
    assert set(results) == {ValidationCheck.CHECK_BASIC_COUNTS}
    assert results[ValidationCheck.CHECK_BASIC_COUNTS].success
