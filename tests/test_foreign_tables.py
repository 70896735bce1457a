"""Foreign-table conformance: the native Delta/Hudi readers parse
metadata written by the REAL format runtimes, not just their own.

The reference ships two genuine fixture tables under demo/data/db —
``delta_dimGeography`` (written by real delta-spark 3.2: single-commit
``_delta_log`` with stats JSON) and ``hudi_dimCustomer`` (written by real
Hudi 0.14: pretty-printed commit JSON, Avro schema under
``extraMetadata["schema"]``, an HFILE-based metadata table, and the full
requested→inflight→completed timeline). Every prior round's format tests
read back tables OUR planes wrote — self-certification. This module is
the other half of conformance (the reference's equivalence oracle,
``ITOneTableClient.java:716-813``, in reverse): read the foreign
metadata, assert parity against what DuckDB-style direct parquet reads
see, sync each fixture into the other two formats, and run the full
SyncValidator on every target.

Real-runtime quirks these tests pin:
- real Hudi pretty-prints commit JSON (multiLine read, hudi.py
  ``_commits_df``);
- real Hudi stores the table schema in ``extraMetadata["schema"]``
  (``HoodieCommitMetadata`` SCHEMA_KEY), not top-level ``schemaString``;
- the fixture's metadata table has only the ``files`` partition in HFILE
  format — ``HudiMetadataTable.available()`` must stay False so the
  distributed parquet-footer fallback computes column stats;
- Hudi record keys survive into Iceberg as ``identifier-field-ids``
  (IcebergSchemaExtractor.java:69-99) and legally vanish in Delta.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

FIXTURES = "/root/reference/demo/data/db"
DELTA_FIXTURE = os.path.join(FIXTURES, "delta_dimGeography")
HUDI_FIXTURE = os.path.join(FIXTURES, "hudi_dimCustomer")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(DELTA_FIXTURE) and os.path.isdir(HUDI_FIXTURE)),
    reason="reference demo fixtures not present",
)


@pytest.fixture(scope="module")
def foreign(spark, tmp_path_factory):
    """Copy both fixtures to a writable dir and sync each into the other
    two formats (metadata-only; the real-runtime data files stay put)."""
    from onetable_spark.model import TableFormat
    from onetable_spark.sync import SyncClient, source_for, target_for

    base = tmp_path_factory.mktemp("foreign")
    dd = str(base / "delta_dimGeography")
    hd = str(base / "hudi_dimCustomer")
    shutil.copytree(DELTA_FIXTURE, dd)
    shutil.copytree(HUDI_FIXTURE, hd)
    client = SyncClient(spark)
    r1 = client.sync(
        source_for(spark, TableFormat.DELTA, dd),
        [target_for(spark, TableFormat.ICEBERG, dd), target_for(spark, TableFormat.HUDI, dd)],
    )
    r2 = client.sync(
        source_for(spark, TableFormat.HUDI, hd),
        [target_for(spark, TableFormat.DELTA, hd), target_for(spark, TableFormat.ICEBERG, hd)],
    )
    for res in list(r1.values()) + list(r2.values()):
        if res.status.value != "SUCCESS":
            raise RuntimeError(f"foreign sync failed: {res}")
    return {"delta": dd, "hudi": hd}


# ------------------------------------------------------------ native reads


def test_foreign_delta_snapshot_parity(spark, foreign):
    """DeltaLog decodes the real delta-spark commit: one file whose
    metadata record count equals the actual parquet row count."""
    from onetable_spark.formats.delta import DeltaLog

    log = DeltaLog(spark, foreign["delta"])
    rows = log.snapshot_files().collect()
    assert len(rows) == 1
    f = rows[0]
    actual = spark.read.parquet(f["path"])
    assert f["record_count"] == actual.count() == 674
    assert f["size"] == os.path.getsize(f["path"])
    assert dict(f["partition_values"]) == {}
    # stats JSON written by delta-spark round-trips into the IR
    stats = {s["field"]: s for s in f["column_stats"]}
    mins = actual.agg(*[F.min(c).alias(c) for c in actual.columns]).first()
    maxs = actual.agg(*[F.max(c).alias(c) for c in actual.columns]).first()
    nulls = actual.agg(
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in actual.columns]
    ).first()
    for col in ("GeographyKey", "ContinentName", "RegionCountryName"):
        assert stats[col]["min_value"] == mins[col]
        assert stats[col]["max_value"] == maxs[col]
        assert stats[col]["num_nulls"] == nulls[col]


def test_foreign_delta_schema(spark, foreign):
    from onetable_spark.formats.delta import DeltaLog

    t = DeltaLog(spark, foreign["delta"]).table_descriptor()
    assert [f.name for f in t.read_schema.fields] == [
        "GeographyKey", "GeographyType", "ContinentName",
        "CityName", "StateProvinceName", "RegionCountryName",
    ]
    assert t.partition_fields == ()


def test_foreign_hudi_snapshot_parity(spark, foreign):
    """HudiTimeline decodes the real Hudi commit (pretty-printed JSON,
    write stats under the empty partition key)."""
    from onetable_spark.formats.hudi import HudiTimeline

    tl = HudiTimeline(spark, foreign["hudi"])
    assert [a for _, a in tl.completed_instants()] == ["commit"]
    rows = tl.snapshot_files().collect()
    assert len(rows) == 1
    f = rows[0]
    assert f["record_count"] == spark.read.parquet(f["path"]).count() == 5000
    assert f["size"] == os.path.getsize(f["path"])
    assert dict(f["partition_values"]) == {}


def test_foreign_hudi_schema_from_extra_metadata(spark, foreign):
    """The Avro schema lives at extraMetadata['schema'] in real Hudi
    commits; record keys come from hoodie.properties."""
    from onetable_spark.formats.hudi import HudiTimeline

    t = HudiTimeline(spark, foreign["hudi"]).table_descriptor()
    names = [f.name for f in t.read_schema.fields]
    assert names[:3] == ["_c0", "CustomerKey", "GeographyKey"]
    assert len(names) == 15  # logical schema, no _hoodie_* meta columns
    assert t.record_key_fields == ("CustomerKey",)


def test_foreign_hudi_footer_stats_fallback(spark, foreign):
    """The fixture advertises only the HFILE `files` metadata partition —
    column_stats is unavailable, so stats MUST come from the distributed
    parquet-footer scan (HudiFileStatsExtractor.java:87-103 fallback)."""
    from onetable_spark.formats.hudi_metadata import HudiMetadataTable
    from onetable_spark.sync.client import HudiSource

    assert not HudiMetadataTable(spark, foreign["hudi"]).available()
    snap = HudiSource(spark, foreign["hudi"]).current_snapshot()
    f = snap.files.first()
    stats = {s["field"]: s for s in f["column_stats"]}
    data = spark.read.parquet(f["path"])
    lo, hi = data.agg(F.min("CustomerKey"), F.max("CustomerKey")).first()
    assert stats["CustomerKey"]["min_value"] == lo
    assert stats["CustomerKey"]["max_value"] == hi
    assert stats["CustomerKey"]["num_nulls"] == 0
    assert stats["CustomerKey"]["num_values"] == 5000


# ----------------------------------------------------- sync + validation


@pytest.mark.parametrize("table,targets", [
    ("delta", ("ICEBERG", "HUDI")),
    ("hudi", ("DELTA", "ICEBERG")),
])
def test_foreign_sync_targets_validate(spark, foreign, table, targets):
    """Every target synced FROM a foreign table passes all four
    SyncValidator checks against the foreign source's read-back."""
    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.sync.validation import SyncValidator

    base = foreign[table]
    readers = {
        "DELTA": DeltaLog(spark, base),
        "ICEBERG": IcebergTable(spark, base),
        "HUDI": HudiTimeline(spark, base),
    }
    source = readers["DELTA" if table == "delta" else "HUDI"]
    validator = SyncValidator()
    for fmt in targets:
        results = validator.validate(source, readers[fmt])
        bad = {k.value: v.error_message for k, v in results.items() if not v.success}
        assert not bad, f"{table}->{fmt}: {bad}"


def test_foreign_hudi_record_keys_reach_iceberg(spark, foreign):
    """CustomerKey (required) maps to identifier-field-ids and reads back
    as a record key — the IcebergSchemaExtractor.java:69-99 round-trip."""
    import json

    from onetable_spark.formats.iceberg import IcebergTable

    it = IcebergTable(spark, foreign["hudi"])
    md = it.metadata()
    schemas = {s.get("schema-id", 0): s for s in md.get("schemas", [md["schema"]])}
    current = schemas[md.get("current-schema-id", 0)]
    assert current.get("identifier-field-ids"), json.dumps(current)[:200]
    assert it.table_descriptor().record_key_fields == ("CustomerKey",)


def test_foreign_tables_three_format_read_equivalence(spark, foreign):
    """The crown-jewel shape (ITOneTableClient.java:716-813): after sync,
    all three formats enumerate the SAME files with the SAME record
    counts for both foreign tables."""
    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable

    for base, n_rows in ((foreign["delta"], 674), (foreign["hudi"], 5000)):
        inventories = []
        for reader in (DeltaLog(spark, base), IcebergTable(spark, base), HudiTimeline(spark, base)):
            inv = sorted(
                (os.path.basename(r["path"]), r["record_count"])
                for r in reader.snapshot_files().collect()
            )
            inventories.append(inv)
        assert inventories[0] == inventories[1] == inventories[2]
        assert sum(rc for _, rc in inventories[0]) == n_rows


def test_foreign_fixtures_through_continuous_sync(spark, tmp_path):
    """The continuous-sync service watches REAL-runtime-written metadata:
    fresh fixture copies (never synced) are bootstrapped by one
    availableNow drain in each direction — the marker streams parse real
    delta-spark commit naming and real Hudi instant naming, and an empty
    second drain triggers nothing."""
    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import TableFormat
    from onetable_spark.sync.continuous import ContinuousSync

    dd = str(tmp_path / "delta_geo")
    hd = str(tmp_path / "hudi_cust")
    shutil.copytree(DELTA_FIXTURE, dd)
    shutil.copytree(HUDI_FIXTURE, hd)

    jd = ContinuousSync(
        spark, dd, (TableFormat.ICEBERG, TableFormat.HUDI),
        str(tmp_path / "dckpt"), validate=True,
    ).run_available_now()
    assert len(jd) == 1 and jd[0]["results"] == {
        "ICEBERG": ("SUCCESS", "FULL"),
        "HUDI": ("SUCCESS", "FULL"),
    }
    assert IcebergTable(spark, dd).snapshot_files().count() == 1

    jh = ContinuousSync(
        spark, hd, (TableFormat.DELTA, TableFormat.ICEBERG),
        str(tmp_path / "hckpt"), source_format=TableFormat.HUDI, validate=True,
    ).run_available_now()
    assert len(jh) == 1 and jh[0]["n_commits"] == 1
    assert jh[0]["results"] == {
        "DELTA": ("SUCCESS", "FULL"),
        "ICEBERG": ("SUCCESS", "FULL"),
    }
    assert DeltaLog(spark, hd).snapshot_files().count() == 1

    # drained: nothing left to trigger in either direction
    assert list(ContinuousSync(
        spark, dd, (TableFormat.ICEBERG,), str(tmp_path / "dckpt")
    ).run_available_now()) == []
    assert list(ContinuousSync(
        spark, hd, (TableFormat.ICEBERG,), str(tmp_path / "hckpt"),
        source_format=TableFormat.HUDI,
    ).run_available_now()) == []
