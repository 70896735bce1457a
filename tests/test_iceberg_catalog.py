"""S15 Iceberg catalog plane: Hadoop / JDBC / Static catalogs, catalog-
addressed sync, and pointer-CAS conflict semantics.

Reference behavior: IcebergTableManager.java:52-101 (catalog present →
catalog.loadTable(identifier), else HadoopTables.load) and the public
Iceberg JDBC catalog layout (iceberg_tables relation, CAS on
metadata_location in JdbcTableOperations.doCommit)."""

from __future__ import annotations

import os
import shutil

import pytest

from onetable_spark.formats.delta import DeltaLog
from onetable_spark.formats.iceberg import IcebergTable
from onetable_spark.formats.iceberg_catalog import (
    CommitConflictError,
    HadoopCatalog,
    IcebergCatalogConfig,
    JdbcCatalog,
    StaticCatalog,
    TableIdentifier,
    load_catalog,
    metadata_version_of,
)
from onetable_spark.model import SyncStatus, Table, TableFormat
from onetable_spark.sources.parquet_inventory import inventory_from_directory
from onetable_spark.sync import SyncClient, source_for, target_for


def test_identifier_parse_roundtrip():
    ident = TableIdentifier.parse("db.sales.orders")
    assert ident.namespace == ("db", "sales") and ident.name == "orders"
    assert str(ident) == "db.sales.orders"
    with pytest.raises(ValueError):
        TableIdentifier.parse("db..orders")


def test_load_catalog_factory(tmp_path):
    assert isinstance(
        load_catalog(IcebergCatalogConfig("hadoop", catalog_options={"warehouse": str(tmp_path)})),
        HadoopCatalog,
    )
    assert isinstance(
        load_catalog(
            IcebergCatalogConfig("jdbc", catalog_options={"uri": str(tmp_path / "cat.db")})
        ),
        JdbcCatalog,
    )
    assert isinstance(load_catalog(IcebergCatalogConfig("static")), StaticCatalog)
    with pytest.raises(ValueError):
        load_catalog(IcebergCatalogConfig("glue"))


def _seed_table_dir(spark, sf_dir, table_path):
    os.makedirs(table_path, exist_ok=True)
    shutil.copy(os.path.join(sf_dir, "nation.parquet"), os.path.join(table_path, "f1.parquet"))
    schema = spark.read.parquet(table_path).schema
    log = DeltaLog(spark, table_path)
    log.init_table(
        Table(
            name="tbl",
            base_path=table_path,
            table_format=TableFormat.DELTA,
            read_schema=schema,
        )
    )
    log.commit(adds=inventory_from_directory(spark, table_path))
    return table_path


def test_hadoop_catalog_resolves_and_lists(spark, sf_dir, tmp_path):
    warehouse = str(tmp_path / "wh")
    table_path = os.path.join(warehouse, "db", "orders")
    _seed_table_dir(spark, sf_dir, table_path)

    cfg = IcebergCatalogConfig("hadoop", catalog_options={"warehouse": warehouse})
    client = SyncClient(spark)
    source = source_for(spark, TableFormat.DELTA, table_path)
    target = target_for(
        spark, TableFormat.ICEBERG, table_path, catalog_config=cfg, identifier="db.orders"
    )
    results = client.sync(source, [target])
    assert results[TableFormat.ICEBERG].status == SyncStatus.SUCCESS

    catalog = load_catalog(cfg)
    ident = TableIdentifier.parse("db.orders")
    assert catalog.table_exists(ident)
    assert catalog.list_tables(("db",)) == [ident]
    assert metadata_version_of(catalog.metadata_location(ident)) >= 1

    # a catalog-addressed read resolves WITHOUT being handed the path
    tbl = IcebergTable.from_catalog(spark, cfg, "db.orders")
    assert tbl.table_path == table_path
    assert tbl.snapshot_files().count() == 1


def test_jdbc_catalog_sync_end_to_end(spark, sf_dir, tmp_path):
    table_path = _seed_table_dir(spark, sf_dir, str(tmp_path / "tbl"))
    cfg = IcebergCatalogConfig(
        "jdbc",
        catalog_name="test_cat",
        catalog_options={"uri": f"jdbc:sqlite:{tmp_path / 'catalog.db'}"},
    )

    client = SyncClient(spark)
    source = source_for(spark, TableFormat.DELTA, table_path)
    target = target_for(
        spark, TableFormat.ICEBERG, table_path, catalog_config=cfg, identifier="db.tbl"
    )
    results = client.sync(source, [target])
    assert results[TableFormat.ICEBERG].status == SyncStatus.SUCCESS

    catalog = load_catalog(cfg)
    ident = TableIdentifier.parse("db.tbl")
    loc = catalog.metadata_location(ident)
    assert loc is not None and os.path.exists(loc)

    # incremental: add a file, re-sync — the pointer must advance
    shutil.copy(os.path.join(sf_dir, "nation.parquet"), os.path.join(table_path, "f2.parquet"))
    log = DeltaLog(spark, table_path)
    inv = inventory_from_directory(spark, table_path).where("path like '%f2.parquet'")
    log.commit(adds=inv)
    results = client.sync(source, [target])
    assert results[TableFormat.ICEBERG].status == SyncStatus.SUCCESS
    loc2 = catalog.metadata_location(ident)
    assert metadata_version_of(loc2) > metadata_version_of(loc)

    # catalog-addressed load (no path) sees both files
    tbl = IcebergTable.from_catalog(spark, cfg, "db.tbl")
    assert tbl.snapshot_files().count() == 2


def test_jdbc_catalog_cas_conflict(tmp_path):
    cat = JdbcCatalog("c", str(tmp_path / "cat.db"))
    ident = TableIdentifier.parse("ns.t")
    cat.register(ident, "/x/metadata/v1.metadata.json")
    with pytest.raises(CommitConflictError):
        cat.register(ident, "/x/metadata/v1.metadata.json")  # duplicate create
    cat.swap(ident, "/x/metadata/v1.metadata.json", "/x/metadata/v2.metadata.json")
    # a second committer still holding v1 as its expectation must lose
    with pytest.raises(CommitConflictError):
        cat.swap(ident, "/x/metadata/v1.metadata.json", "/x/metadata/v2.metadata.json")
    assert cat.metadata_location(ident) == "/x/metadata/v2.metadata.json"


def test_jdbc_pointer_is_commit_authority(spark, sf_dir, tmp_path):
    """A losing file-claim race surfaces as CommitConflictError and leaves
    the catalog pointer untouched."""
    table_path = _seed_table_dir(spark, sf_dir, str(tmp_path / "tbl"))
    cfg = IcebergCatalogConfig(
        "jdbc", catalog_options={"uri": str(tmp_path / "cat.db")}
    )
    client = SyncClient(spark)
    source = source_for(spark, TableFormat.DELTA, table_path)
    target = target_for(
        spark, TableFormat.ICEBERG, table_path, catalog_config=cfg, identifier="db.tbl"
    )
    client.sync(source, [target])

    catalog = load_catalog(cfg)
    ident = TableIdentifier.parse("db.tbl")
    loc_before = catalog.metadata_location(ident)
    v = metadata_version_of(loc_before)

    # simulate another committer moving the pointer ahead of us
    catalog.swap(ident, loc_before, loc_before.replace(f"v{v}", f"v{v + 99}"))
    tbl = IcebergTable.from_catalog(spark, cfg, "db.tbl")
    with pytest.raises(CommitConflictError):
        tbl._write_metadata(v + 1, {"dummy": True})
    # the losing claim rolled back its file
    assert not os.path.exists(os.path.join(tbl.metadata_dir, f"v{v + 1}.metadata.json"))


def test_static_catalog_resolution(spark, sf_dir, tmp_path):
    table_path = _seed_table_dir(spark, sf_dir, str(tmp_path / "tbl"))
    client = SyncClient(spark)
    source = source_for(spark, TableFormat.DELTA, table_path)
    target = target_for(spark, TableFormat.ICEBERG, table_path)
    client.sync(source, [target])

    cfg = IcebergCatalogConfig("static", catalog_options={"tables": {"a.b": table_path}})
    tbl = IcebergTable.from_catalog(spark, cfg, "a.b")
    assert tbl.exists() and tbl.snapshot_files().count() == 1
    with pytest.raises(ValueError):
        IcebergTable.from_catalog(spark, cfg, "a.unknown")


class _DummyCatalog:
    """Minimal IcebergCatalog protocol implementation for reflection tests."""

    def __init__(self, base: str):
        self.base = base
        self.locations: dict[str, str] = {}

    def table_path(self, ident):
        return f"{self.base}/{ident}"

    def table_exists(self, ident):
        return str(ident) in self.locations

    def metadata_location(self, ident):
        return self.locations.get(str(ident))

    def register(self, ident, metadata_location):
        self.locations[str(ident)] = metadata_location

    def swap(self, ident, expected, new):
        if self.locations.get(str(ident)) != expected:
            from onetable_spark.formats.iceberg_catalog import CommitConflictError

            raise CommitConflictError(str(ident))
        self.locations[str(ident)] = new


def test_pluggable_catalog_impl_loads_reflectively(tmp_path):
    """Any dotted catalogImpl path loads like the reference's reflection
    hook (IcebergTableManager.java:52-85); non-conforming classes are
    rejected with the missing protocol method named."""
    from onetable_spark.formats.iceberg_catalog import (
        IcebergCatalogConfig,
        TableIdentifier,
        load_catalog,
    )

    cfg = IcebergCatalogConfig(
        catalog_name="x",
        catalog_impl="tests.test_iceberg_catalog._DummyCatalog",
        catalog_options={"base": str(tmp_path)},
    )
    cat = load_catalog(cfg)
    ident = TableIdentifier.parse("db.tbl")
    assert cat.table_path(ident).endswith("db.tbl")
    cat.register(ident, "v1.metadata.json")
    cat.swap(ident, "v1.metadata.json", "v2.metadata.json")
    assert cat.metadata_location(ident) == "v2.metadata.json"

    with pytest.raises(ValueError, match="cannot load"):
        load_catalog(
            IcebergCatalogConfig(
                catalog_name="x", catalog_impl="no.such.module.Cat", catalog_options={}
            )
        )
    with pytest.raises(TypeError, match="table_path"):
        load_catalog(
            IcebergCatalogConfig(
                catalog_name="x",
                catalog_impl="pathlib.PurePath",
                catalog_options={},
            )
        )
