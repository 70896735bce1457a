"""Iceberg catalog plane (SURVEY §2.2 S15).

The reference loads Iceberg tables either through a configurable catalog
or straight from a Hadoop path (IcebergTableManager.java:52-101: catalog
present → ``catalog.loadTable(identifier)``, else ``HadoopTables.load``).
This module re-expresses that SPI over three public catalog layouts, all
implementable without Iceberg jars:

- **HadoopCatalog** — the warehouse directory convention
  ``<warehouse>/<namespace...>/<table>/metadata/v<N>.metadata.json`` with a
  ``version-hint.text`` pointer (iceberg.apache.org/spec: "Metadata for
  tables in a Hadoop catalog is stored in a metadata folder under the
  table location");
- **JdbcCatalog** — the documented ``iceberg_tables`` relation keyed by
  (catalog_name, table_namespace, table_name) with ``metadata_location``
  and ``previous_metadata_location`` columns; commits are a CAS UPDATE on
  the current location (public JdbcUtil/JdbcTableOperations layout),
  backed here by stdlib sqlite3;
- **StaticCatalog** — an explicit identifier → table-path mapping from
  catalog options (the reference's catalogOptions map, useful for tests
  and externally-managed locations).

Every catalog resolves a ``TableIdentifier`` to the table base path plus
(for pointer catalogs) the current metadata file; ``IcebergTable`` then
operates unchanged on the filesystem layout, routing the "what is
current?" question and the commit swap through the catalog.
"""

from __future__ import annotations

import os
import re
import sqlite3
from dataclasses import dataclass, field
from typing import Optional, Protocol


@dataclass(frozen=True)
class TableIdentifier:
    """Namespace + name (org.apache.iceberg.catalog.TableIdentifier)."""

    namespace: tuple[str, ...]
    name: str

    @classmethod
    def parse(cls, dotted: str) -> "TableIdentifier":
        parts = dotted.split(".")
        if not parts or not all(parts):
            raise ValueError(f"malformed table identifier {dotted!r}")
        return cls(namespace=tuple(parts[:-1]), name=parts[-1])

    def __str__(self) -> str:
        return ".".join(self.namespace + (self.name,))


@dataclass(frozen=True)
class IcebergCatalogConfig:
    """--icebergCatalogConfig equivalent (RunSync.java, IcebergCatalogConfig):
    implementation name + free-form options."""

    catalog_impl: str  # "hadoop" | "jdbc" | "static"
    catalog_name: str = "onetable"
    catalog_options: dict = field(default_factory=dict)


class IcebergCatalog(Protocol):
    def table_exists(self, ident: TableIdentifier) -> bool: ...

    def table_path(self, ident: TableIdentifier) -> str:
        """Base path holding the table's data + metadata dirs."""
        ...

    def metadata_location(self, ident: TableIdentifier) -> Optional[str]:
        """Absolute path of the current metadata file, None if unknown to
        the catalog (pointer catalogs only; Hadoop catalogs derive it from
        version-hint)."""
        ...

    def register(self, ident: TableIdentifier, metadata_location: str) -> None:
        """Create-if-absent registration of a new table (createTable)."""
        ...

    def swap(self, ident: TableIdentifier, expected: Optional[str], new: str) -> None:
        """CAS the current metadata pointer; raises CommitConflictError when
        another committer won (JdbcTableOperations.doCommit)."""
        ...


class CommitConflictError(RuntimeError):
    """Another committer won the metadata pointer race."""


_VERSION_RE = re.compile(r"v(\d+)\.metadata\.json$")


def metadata_version_of(location: str) -> int:
    m = _VERSION_RE.search(location)
    if not m:
        raise ValueError(f"unversioned metadata location {location!r}")
    return int(m.group(1))


# ---------------------------------------------------------------- hadoop


class HadoopCatalog:
    """Warehouse-directory catalog: identifier maps to a path, currency
    comes from version-hint.text (HadoopCatalog + HadoopTableOperations
    public behavior). No pointer state of its own — swap is a no-op
    because the O_EXCL claim on v<N>.metadata.json IS the commit."""

    def __init__(self, warehouse: str):
        self.warehouse = warehouse.rstrip("/")

    def table_path(self, ident: TableIdentifier) -> str:
        return os.path.join(self.warehouse, *ident.namespace, ident.name)

    def table_exists(self, ident: TableIdentifier) -> bool:
        return os.path.exists(
            os.path.join(self.table_path(ident), "metadata", "version-hint.text")
        )

    def metadata_location(self, ident: TableIdentifier) -> Optional[str]:
        hint = os.path.join(self.table_path(ident), "metadata", "version-hint.text")
        if not os.path.exists(hint):
            return None
        with open(hint) as f:
            v = int(f.read().strip())
        return os.path.join(self.table_path(ident), "metadata", f"v{v}.metadata.json")

    def register(self, ident: TableIdentifier, metadata_location: str) -> None:
        pass  # the filesystem layout is the registration

    def swap(self, ident: TableIdentifier, expected: Optional[str], new: str) -> None:
        pass  # version-file O_EXCL claim already serialized the commit

    def list_tables(self, namespace: tuple[str, ...] = ()) -> list[TableIdentifier]:
        root = os.path.join(self.warehouse, *namespace)
        out = []
        if not os.path.isdir(root):
            return out
        for entry in sorted(os.listdir(root)):
            if os.path.exists(os.path.join(root, entry, "metadata", "version-hint.text")):
                out.append(TableIdentifier(namespace=namespace, name=entry))
        return out


# ------------------------------------------------------------------ jdbc


_JDBC_DDL = """
CREATE TABLE IF NOT EXISTS iceberg_tables (
  catalog_name TEXT NOT NULL,
  table_namespace TEXT NOT NULL,
  table_name TEXT NOT NULL,
  metadata_location TEXT,
  previous_metadata_location TEXT,
  PRIMARY KEY (catalog_name, table_namespace, table_name)
)
"""


class JdbcCatalog:
    """The public Iceberg JDBC catalog relation (JdbcUtil CREATE_CATALOG_TABLE
    layout) over stdlib sqlite3. The metadata pointer is the source of
    truth; commits CAS it (UPDATE ... WHERE metadata_location = expected)."""

    def __init__(self, catalog_name: str, uri: str):
        # accept "jdbc:sqlite:/path/db" or a bare filesystem path
        self.catalog_name = catalog_name
        self.db_path = uri.split("jdbc:sqlite:", 1)[-1]
        with self._conn() as c:
            c.execute(_JDBC_DDL)

    def _conn(self) -> sqlite3.Connection:
        c = sqlite3.connect(self.db_path, timeout=30)
        c.isolation_level = None  # explicit transactions
        return c

    def _row(self, ident: TableIdentifier):
        with self._conn() as c:
            cur = c.execute(
                "SELECT metadata_location FROM iceberg_tables "
                "WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                (self.catalog_name, ".".join(ident.namespace), ident.name),
            )
            return cur.fetchone()

    def table_exists(self, ident: TableIdentifier) -> bool:
        return self._row(ident) is not None

    def metadata_location(self, ident: TableIdentifier) -> Optional[str]:
        row = self._row(ident)
        return row[0] if row else None

    def table_path(self, ident: TableIdentifier) -> str:
        loc = self.metadata_location(ident)
        if loc is None:
            raise ValueError(f"table {ident} not registered in catalog")
        return os.path.dirname(os.path.dirname(loc))

    def register(self, ident: TableIdentifier, metadata_location: str) -> None:
        try:
            with self._conn() as c:
                c.execute(
                    "INSERT INTO iceberg_tables (catalog_name, table_namespace, "
                    "table_name, metadata_location, previous_metadata_location) "
                    "VALUES (?, ?, ?, ?, NULL)",
                    (
                        self.catalog_name,
                        ".".join(ident.namespace),
                        ident.name,
                        metadata_location,
                    ),
                )
        except sqlite3.IntegrityError as e:
            raise CommitConflictError(f"table {ident} already registered") from e

    def swap(self, ident: TableIdentifier, expected: Optional[str], new: str) -> None:
        with self._conn() as c:
            c.execute("BEGIN IMMEDIATE")
            cur = c.execute(
                "UPDATE iceberg_tables SET metadata_location=?, "
                "previous_metadata_location=? WHERE catalog_name=? AND "
                "table_namespace=? AND table_name=? AND metadata_location IS ?",
                (
                    new,
                    expected,
                    self.catalog_name,
                    ".".join(ident.namespace),
                    ident.name,
                    expected,
                ),
            )
            if cur.rowcount != 1:
                c.execute("ROLLBACK")
                raise CommitConflictError(
                    f"metadata pointer for {ident} moved past {expected!r}"
                )
            c.execute("COMMIT")

    def list_tables(self, namespace: tuple[str, ...] = ()) -> list[TableIdentifier]:
        with self._conn() as c:
            cur = c.execute(
                "SELECT table_namespace, table_name FROM iceberg_tables "
                "WHERE catalog_name=? AND table_namespace=? ORDER BY table_name",
                (self.catalog_name, ".".join(namespace)),
            )
            return [
                TableIdentifier(namespace=tuple(ns.split(".")) if ns else (), name=n)
                for ns, n in cur.fetchall()
            ]


# ---------------------------------------------------------------- static


class StaticCatalog:
    """Identifier → base-path mapping straight from catalog options
    (externally-managed table locations)."""

    def __init__(self, tables: dict):
        self.tables = {str(k): v for k, v in tables.items()}

    def table_path(self, ident: TableIdentifier) -> str:
        try:
            return self.tables[str(ident)]
        except KeyError:
            raise ValueError(f"table {ident} not in static catalog") from None

    def table_exists(self, ident: TableIdentifier) -> bool:
        return str(ident) in self.tables and os.path.exists(
            os.path.join(self.tables[str(ident)], "metadata", "version-hint.text")
        )

    def metadata_location(self, ident: TableIdentifier) -> Optional[str]:
        if str(ident) not in self.tables:
            return None
        hint = os.path.join(self.table_path(ident), "metadata", "version-hint.text")
        if not os.path.exists(hint):
            return None
        with open(hint) as f:
            v = int(f.read().strip())
        return os.path.join(self.table_path(ident), "metadata", f"v{v}.metadata.json")

    def register(self, ident: TableIdentifier, metadata_location: str) -> None:
        pass

    def swap(self, ident: TableIdentifier, expected: Optional[str], new: str) -> None:
        pass


# --------------------------------------------------------------- factory


def load_catalog(config: IcebergCatalogConfig) -> IcebergCatalog:
    """CatalogUtil.loadCatalog equivalent keyed by implementation name
    (IcebergTableManager.java:108-121).

    Besides the built-ins, any dotted path loads reflectively — the
    Python analogue of the reference accepting an arbitrary
    ``catalogImpl`` class name (IcebergTableManager.java:52-85): the
    named class is imported, constructed with the catalog options as
    keyword arguments, and duck-type-checked for the four protocol
    methods commits need (``table_path``, ``metadata_location``,
    ``register``, ``swap``)."""
    impl = config.catalog_impl
    opts = config.catalog_options
    if impl.lower() == "hadoop":
        return HadoopCatalog(warehouse=opts["warehouse"])
    if impl.lower() == "jdbc":
        return JdbcCatalog(catalog_name=config.catalog_name, uri=opts["uri"])
    if impl.lower() == "static":
        return StaticCatalog(tables=opts.get("tables", {}))
    if "." in impl:
        import importlib

        module_name, _, cls_name = impl.rpartition(".")
        try:
            cls = getattr(importlib.import_module(module_name), cls_name)
        except (ImportError, AttributeError) as e:
            raise ValueError(f"cannot load catalog implementation {impl!r}: {e}") from e
        cat = cls(**opts)
        for required in ("table_path", "metadata_location", "register", "swap"):
            if not callable(getattr(cat, required, None)):
                raise TypeError(
                    f"{impl} does not implement IcebergCatalog.{required}"
                )
        return cat
    raise ValueError(f"unknown catalog implementation {config.catalog_impl!r}")
