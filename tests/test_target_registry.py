"""Plugin-style format registry (round-5, VERDICT #6).

The reference discovers TargetClient implementations via ServiceLoader
(core/.../client/TableFormatClientFactory.java:49-73); our equivalent is
register_target()/register_source() plus entry-point discovery in the
"onetable_spark.targets" / "onetable_spark.sources" groups. A toy fourth
format must be fully syncable without touching engine code."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from onetable_spark.model import SyncStatus, Table, TableFormat, TableMetadata
from onetable_spark.sync import (
    SyncClient,
    register_target,
    registered_formats,
    source_for,
    target_for,
)
from onetable_spark.sync import client as sync_client_mod


class ToyTarget:
    """Minimal TargetClient: persists the live file set + sync watermark as
    one JSON document under <path>/_toy/ — a stand-in for any external
    catalog a third party might sync to."""

    table_format = "TOYFMT"

    def __init__(self, spark, path, **_):
        self.path = path
        self.state_file = os.path.join(path, "_toy", "state.json")

    def _load(self):
        if not os.path.exists(self.state_file):
            return None
        with open(self.state_file) as f:
            return json.load(f)

    def _store(self, files, metadata):
        os.makedirs(os.path.dirname(self.state_file), exist_ok=True)
        doc = {"files": sorted(files), "metadata": metadata.to_props()}
        with open(self.state_file, "w") as f:
            json.dump(doc, f)

    def get_sync_metadata(self):
        doc = self._load()
        return TableMetadata.from_props(doc["metadata"]) if doc else None

    def sync_snapshot(self, snapshot, metadata):
        files = [r["path"] for r in snapshot.files.select("path").collect()]
        self._store(files, metadata)

    def sync_change(self, change, metadata):
        doc = self._load() or {"files": []}
        live = set(doc["files"])
        live -= {r["path"] for r in change.diff.removed.select("path").collect()}
        live |= {r["path"] for r in change.diff.added.select("path").collect()}
        self._store(live, metadata)


@pytest.fixture(autouse=True)
def _clean_registry():
    """Keep the module-level registry pristine across tests."""
    saved_targets = dict(sync_client_mod._TARGETS)
    saved_sources = dict(sync_client_mod._SOURCES)
    saved_flag = sync_client_mod._ep_scanned
    yield
    sync_client_mod._TARGETS.clear()
    sync_client_mod._TARGETS.update(saved_targets)
    sync_client_mod._SOURCES.clear()
    sync_client_mod._SOURCES.update(saved_sources)
    sync_client_mod._ep_scanned = saved_flag


def test_register_and_sync_toy_target(spark, sf_dir, tmp_path):
    table_path = str(tmp_path / "toy_tbl")
    os.makedirs(table_path)
    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(table_path, "r.parquet"))

    register_target("toyfmt", ToyTarget)  # case-insensitive key
    fmts = registered_formats()
    assert fmts["TOYFMT"] == (False, True)

    target = target_for(spark, "TOYFMT", table_path)
    assert isinstance(target, ToyTarget)

    source = source_for(spark, TableFormat.PARQUET, table_path)
    results = SyncClient(spark).sync(source, [target])
    assert results["TOYFMT"].status == SyncStatus.SUCCESS

    doc = json.load(open(os.path.join(table_path, "_toy", "state.json")))
    assert doc["files"] == [os.path.join(table_path, "r.parquet")]
    # watermark round-trips through the toy target's own persistence
    assert target.get_sync_metadata() is not None

    # second sync with a new file goes through sync_change/sync_snapshot and
    # lands the second file too
    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(table_path, "r2.parquet"))
    source2 = source_for(spark, TableFormat.PARQUET, table_path)
    results2 = SyncClient(spark).sync(source2, [target_for(spark, "toyfmt", table_path)])
    assert results2["TOYFMT"].status == SyncStatus.SUCCESS
    doc2 = json.load(open(os.path.join(table_path, "_toy", "state.json")))
    assert doc2["files"] == sorted(
        [os.path.join(table_path, "r.parquet"), os.path.join(table_path, "r2.parquet")]
    )


def test_unknown_format_raises_with_known_list(spark, tmp_path):
    with pytest.raises(ValueError, match="no target client registered.*nope"):
        target_for(spark, "nope", str(tmp_path))
    with pytest.raises(ValueError, match="no source client registered"):
        source_for(spark, "nope", str(tmp_path))


def test_entry_point_discovery(monkeypatch, spark, tmp_path):
    """Entry points in the onetable_spark.targets group are discovered
    lazily; built-ins are never clobbered by a plugin declaring DELTA."""

    class FakeEp:
        def __init__(self, name, obj):
            self.name = name
            self._obj = obj

        def load(self):
            return self._obj

    class Bogus:  # plugin tries to steal a built-in name — must lose
        table_format = TableFormat.DELTA

    def fake_entry_points(group=None):
        if group == "onetable_spark.targets":
            return [FakeEp("eptoy", ToyTarget), FakeEp("DELTA", Bogus)]
        return []

    import importlib.metadata as ilm

    monkeypatch.setattr(ilm, "entry_points", fake_entry_points)
    monkeypatch.setattr(sync_client_mod, "_ep_scanned", False)

    target = target_for(spark, "EPTOY", str(tmp_path))
    assert isinstance(target, ToyTarget)
    assert sync_client_mod._TARGETS[TableFormat.DELTA] is not Bogus
