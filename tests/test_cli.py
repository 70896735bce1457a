"""CLI runner (RunSync.java:100-171 equivalent): YAML dataset config →
multi-format sync loop with per-table error isolation."""

from __future__ import annotations

import json
import os
import shutil

from onetable_spark.cli import _load_config_file, run_dataset_config
from onetable_spark.formats.delta import DeltaLog
from onetable_spark.formats.iceberg import IcebergTable
from onetable_spark.model import Table, TableFormat
from onetable_spark.sources.parquet_inventory import inventory_from_directory


def _seed_delta(spark, sf_dir, path, table_file="nation.parquet"):
    os.makedirs(path)
    shutil.copy(os.path.join(sf_dir, table_file), os.path.join(path, "f1.parquet"))
    schema = spark.read.parquet(path).schema
    log = DeltaLog(spark, path)
    log.init_table(
        Table(name=os.path.basename(path), base_path=path,
              table_format=TableFormat.DELTA, read_schema=schema)
    )
    log.commit(adds=inventory_from_directory(spark, path))
    return path


def test_yaml_config_multi_dataset_sync(spark, sf_dir, tmp_path):
    t1 = _seed_delta(spark, sf_dir, str(tmp_path / "orders"))
    t2 = _seed_delta(spark, sf_dir, str(tmp_path / "customers"), "region.parquet")
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(
        f"""
sourceFormat: DELTA
targetFormats:
  - ICEBERG
  - HUDI
datasets:
  - tableBasePath: {t1}
    tableName: orders
  - tableBasePath: {t2}
    tableName: customers
  - tableBasePath: {tmp_path}/missing
    tableName: nope
"""
    )
    config = _load_config_file(str(cfg_path))
    results = run_dataset_config(spark, config)
    by_key = {(r["tableBasePath"], r["target"]): r for r in results}
    for base in (t1, t2):
        assert by_key[(base, "ICEBERG")]["status"] == "SUCCESS"
        assert by_key[(base, "HUDI")]["status"] == "SUCCESS"
    # the missing table errored but did not stop the loop
    errs = [r for r in results if r["status"] == "ERROR"]
    assert len(errs) == 1 and "missing" in errs[0]["tableBasePath"]
    assert IcebergTable(spark, t1).snapshot_files().count() == 1


def test_cli_with_catalog_config(spark, sf_dir, tmp_path):
    t1 = _seed_delta(spark, sf_dir, str(tmp_path / "t"))
    config = {
        "sourceFormat": "DELTA",
        "targetFormats": ["ICEBERG"],
        "datasets": [{"tableBasePath": t1, "tableName": "t", "namespace": "db"}],
    }
    catalog = {
        "catalogImpl": "jdbc",
        "catalogName": "cli_cat",
        "catalogOptions": {"uri": f"jdbc:sqlite:{tmp_path / 'cat.db'}"},
    }
    results = run_dataset_config(spark, config, iceberg_catalog=catalog)
    assert all(r["status"] == "SUCCESS" for r in results)
    # the table is registered under the namespace-qualified identifier
    from onetable_spark.formats.iceberg_catalog import (
        IcebergCatalogConfig, TableIdentifier, load_catalog,
    )

    cat = load_catalog(IcebergCatalogConfig("jdbc", "cli_cat", {"uri": str(tmp_path / "cat.db")}))
    assert cat.table_exists(TableIdentifier.parse("db.t"))


def test_main_entrypoint_json_output(spark, sf_dir, tmp_path, capsys, monkeypatch):
    """python -m onetable_spark.cli prints one JSON line per result."""
    import onetable_spark.cli as cli

    t1 = _seed_delta(spark, sf_dir, str(tmp_path / "m"))
    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps({
        "sourceFormat": "DELTA", "targetFormats": ["ICEBERG"],
        "datasets": [{"tableBasePath": t1, "tableName": "m"}],
    }))
    monkeypatch.setattr(cli, "_spark_for_main", lambda: spark, raising=False)
    monkeypatch.setattr("onetable_spark.session.get_spark", lambda name: spark)
    rc = cli.main(["--datasetConfig", str(cfg)])
    out = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert rc == 0
    assert out and all(r["status"] == "SUCCESS" for r in out)


def test_sync_hudi_table_post_commit_hook(spark, sf_dir, tmp_path):
    """OneTableSyncTool analog: formats read from hoodie.properties, sync
    runs incrementally after each commit."""
    import shutil

    from onetable_spark.cli import sync_hudi_table
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.model import Table as TableModel
    from onetable_spark.sources.parquet_inventory import inventory_from_directory

    table_path = str(tmp_path / "hooked")
    os.makedirs(table_path)
    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(table_path, "r.parquet"))
    schema = spark.read.parquet(table_path).schema
    tl = HudiTimeline(spark, table_path)
    tl.init_table(
        TableModel(
            name="hooked", base_path=table_path,
            table_format=TableFormat.HUDI, read_schema=schema,
        )
    )
    # configure the hook targets in the table's own properties
    with open(os.path.join(tl.hoodie_path, "hoodie.properties"), "a") as f:
        f.write("onetable.formats.to.sync=DELTA,ICEBERG\n")

    tl.commit(adds=inventory_from_directory(spark, table_path), schema=schema)
    out = sync_hudi_table(spark, table_path)
    assert out == {"DELTA": "SUCCESS", "ICEBERG": "SUCCESS"}
    assert DeltaLog(spark, table_path).snapshot_files().count() == 1
    assert IcebergTable(spark, table_path).snapshot_files().count() == 1

    # second commit → incremental hook run
    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(table_path, "r2.parquet"))
    inv2 = inventory_from_directory(spark, table_path).where("path like '%r2.parquet'")
    tl.commit(adds=inv2)
    out = sync_hudi_table(spark, table_path)
    assert out == {"DELTA": "SUCCESS", "ICEBERG": "SUCCESS"}
    assert DeltaLog(spark, table_path).snapshot_files().count() == 2


def test_cli_validate_flag_audits_targets(spark, sf_dir, tmp_path):
    """--validate: every successful target carries a validation map with
    all four checks 'ok'; a PARQUET source (no standalone metadata reader)
    validates through the SnapshotReaderAdapter the same way."""
    t1 = _seed_delta(spark, sf_dir, str(tmp_path / "v"))
    config = {
        "sourceFormat": "DELTA",
        "targetFormats": ["ICEBERG", "HUDI"],
        "datasets": [{"tableBasePath": t1, "tableName": "v"}],
    }
    results = run_dataset_config(spark, config, validate=True)
    assert len(results) == 2
    for r in results:
        assert r["status"] == "SUCCESS", r
        assert set(r["validation"]) == {
            "CHECK_TABLE_SPEC", "CHECK_SCHEMA", "CHECK_BASIC_COUNTS", "COMPARE_STATISTICS",
        }
        assert all(v == "ok" for v in r["validation"].values()), r["validation"]


def test_cli_optimize_mode(spark, sf_dir, tmp_path, capsys):
    """--optimize compacts each dataset in its source format with the
    sync loop's per-table error isolation."""
    from onetable_spark.cli import run_optimize

    base = str(tmp_path / "opt_tbl")
    _seed_delta(spark, sf_dir, base)
    # add three more small files in a second commit so there is a bin
    log = DeltaLog(spark, base)
    more = []
    for i in (2, 3, 4):
        p = os.path.join(base, f"f{i}.parquet")
        shutil.copy(os.path.join(sf_dir, "nation.parquet"), p)
        more.append(p)
    from onetable_spark.sources.parquet_inventory import build_inventory

    log.commit(adds=build_inventory(spark, more, root=base))
    total = log.snapshot_files().agg({"size": "sum"}).collect()[0][0]

    config = {
        "sourceFormat": "DELTA",
        "datasets": [
            {"tableBasePath": base},
            {"tableBasePath": f"{tmp_path}/missing_opt"},
        ],
    }
    rc = run_optimize(spark, config, target_bytes=int(total) * 2)
    records = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert rc == 1  # the missing table errored
    by_base = {r["tableBasePath"]: r for r in records}
    assert by_base[base]["status"] == "SUCCESS"
    assert by_base[base]["bins"] == 1 and by_base[base]["files_removed"] == 4
    assert by_base[f"{tmp_path}/missing_opt"]["status"] == "ERROR"
    assert log.snapshot_files().count() == 1


def test_cli_vacuum_mode(spark, sf_dir, tmp_path, capsys):
    """--vacuum removes aged orphans per dataset with the sync loop's
    per-table error isolation and prints per-status counts."""
    from onetable_spark.cli import run_vacuum

    base = str(tmp_path / "vac_tbl")
    _seed_delta(spark, sf_dir, base)
    orphan = os.path.join(base, "stray.parquet")
    shutil.copy(os.path.join(sf_dir, "region.parquet"), orphan)
    os.utime(orphan, (946684800, 946684800))  # 2000-01-01

    config = {
        "sourceFormat": "DELTA",
        "datasets": [
            {"tableBasePath": base},
            {"tableBasePath": f"{tmp_path}/missing_vac"},
        ],
    }
    rc = run_vacuum(spark, config, retention_hours=1)
    records = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert rc == 1  # the missing table errored
    by_base = {r["tableBasePath"]: r for r in records}
    assert by_base[base]["status"] == "SUCCESS"
    assert by_base[base]["removed"] == 1 and by_base[base]["referenced"] >= 1
    assert by_base[f"{tmp_path}/missing_vac"]["status"] == "ERROR"
    assert not os.path.exists(orphan)
    assert DeltaLog(spark, base).snapshot_files().count() >= 1
