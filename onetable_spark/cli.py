"""CLI runner: the product entry point (utilities/.../RunSync.java:100-171).

Usage::

    python -m onetable_spark.cli --datasetConfig my_config.yaml \
        [--icebergCatalogConfig catalog.yaml] [--mode incremental|full]

Dataset config (YAML or JSON — same shape as the reference's
RunSync.DatasetConfig, RunSync.java:221-250)::

    sourceFormat: DELTA
    targetFormats:
      - ICEBERG
      - HUDI
    datasets:
      - tableBasePath: /data/warehouse/orders
        tableName: orders
        partitionSpec: ts:MONTH          # Hudi partition-config grammar
        namespace: db                    # Iceberg catalog namespace
      - tableBasePath: /data/warehouse/customers

Iceberg catalog config (RunSync --icebergCatalogConfig)::

    catalogImpl: jdbc                    # hadoop | jdbc | static
    catalogName: onetable
    catalogOptions:
      uri: jdbc:sqlite:/tmp/catalog.db

Errors on one dataset are logged and do not stop the loop, matching the
reference's per-table try/catch.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any, Optional

from onetable_spark.model import SyncMode, TableFormat


def _load_config_file(path: str) -> dict:
    """YAML preferred, JSON accepted (JSON is a YAML subset anyway)."""
    with open(path) as f:
        text = f.read()
    try:
        import yaml

        return yaml.safe_load(text) or {}
    except ImportError:  # pragma: no cover - yaml is present in this env
        return json.loads(text)


def _catalog_config(raw: Optional[dict]):
    if not raw:
        return None
    from onetable_spark.formats.iceberg_catalog import IcebergCatalogConfig

    return IcebergCatalogConfig(
        catalog_impl=raw.get("catalogImpl", "hadoop"),
        catalog_name=raw.get("catalogName", "onetable"),
        catalog_options=dict(raw.get("catalogOptions") or {}),
    )


def _target_reader(target):
    """The target's OWN metadata reader (what validation reads it back
    through): DeltaTarget.log / IcebergTarget.table / HudiTarget.timeline.
    Using the target's reader — not a fresh reader built from the base
    path — keeps validation correct for catalog-addressed Iceberg tables,
    whose resolved location can differ from tableBasePath."""
    for attr in ("table", "log", "timeline"):
        reader = getattr(target, attr, None)
        if reader is not None:
            return reader
    raise TypeError(f"target {type(target).__name__} exposes no metadata reader")


def run_dataset_config(
    spark,
    config: dict,
    iceberg_catalog: Optional[dict] = None,
    mode: str = "incremental",
    validate: bool = False,
) -> list[dict[str, Any]]:
    """Run the sync loop over every dataset; returns one result record per
    (table, target-format) pair. With ``validate=True``, every successful
    target is audited by the post-sync validation plane (all four
    ValidationChecks of the target's read-back against the source) and
    the records carry a ``validation`` map plus a downgraded status on
    drift. Importable for tests; the ``main`` entry wraps it with arg
    parsing and a SparkSession."""
    from onetable_spark.sync import SyncClient, SyncConfig, source_for, target_for
    from onetable_spark.sync.validation import SnapshotReaderAdapter, SyncValidator

    source_format = TableFormat(config["sourceFormat"])
    target_formats = [TableFormat(t) for t in config.get("targetFormats", [])]
    if not target_formats:
        raise ValueError("targetFormats must list at least one format")
    catalog_cfg = _catalog_config(iceberg_catalog)
    client = SyncClient(
        spark,
        SyncConfig(mode=SyncMode.INCREMENTAL if mode == "incremental" else SyncMode.FULL),
    )

    results: list[dict[str, Any]] = []
    for ds in config.get("datasets", []):
        base_path = ds["tableBasePath"]
        try:
            source = source_for(spark, source_format, base_path)
            targets = []
            for fmt in target_formats:
                kwargs: dict[str, Any] = {}
                if fmt is TableFormat.ICEBERG and catalog_cfg is not None:
                    ident = ".".join(
                        x for x in (ds.get("namespace"), ds.get("tableName")) if x
                    ) or ds.get("tableName", "table")
                    kwargs = {"catalog_config": catalog_cfg, "identifier": ident}
                targets.append(target_for(spark, fmt, base_path, **kwargs))
            outcome = client.sync(source, targets)
            target_by_fmt = {t.table_format: t for t in targets}
            for fmt, res in outcome.items():
                record: dict[str, Any] = {
                    "tableBasePath": base_path,
                    "target": fmt.value,
                    "status": res.status.value,
                    "mode": res.mode.value,
                    "error": res.error,
                }
                if validate and res.status.value == "SUCCESS":
                    checks = SyncValidator().validate(
                        SnapshotReaderAdapter(source), _target_reader(target_by_fmt[fmt])
                    )
                    record["validation"] = {
                        c.value: (r.error_message or "ok") for c, r in checks.items()
                    }
                    if not all(r.success for r in checks.values()):
                        record["status"] = "VALIDATION_FAILED"
                results.append(record)
        except Exception as e:  # noqa: BLE001 — per-table isolation (RunSync.java:168-170)
            results.append(
                {
                    "tableBasePath": base_path,
                    "target": ",".join(f.value for f in target_formats),
                    "status": "ERROR",
                    "mode": mode.upper(),
                    "error": str(e),
                }
            )
    return results


def sync_hudi_table(spark, base_path: str) -> dict:
    """OneTableSyncTool parity (hudi-support/.../OneTableSyncTool.java:
    52-96): the post-commit hook form of the sync loop — target formats and
    retention are read from the table's OWN ``hoodie.properties``
    (``onetable.formats.to.sync``, ``onetable.target.metadata.retention.hr``)
    so a Hudi writer pipeline can call this after every commit with no
    external config. Incremental mode, exactly like the reference tool."""
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.sync import SyncClient, SyncConfig, source_for, target_for
    from onetable_spark.model import SyncMode

    props = HudiTimeline(spark, base_path).table_properties()
    formats = [
        TableFormat(f.strip().upper())
        for f in (props.get("onetable.formats.to.sync") or "DELTA,ICEBERG").split(",")
        if f.strip()
    ]
    retention = int(props.get("onetable.target.metadata.retention.hr", "168"))
    client = SyncClient(spark, SyncConfig(mode=SyncMode.INCREMENTAL, retention_hours=retention))
    results = client.sync(
        source_for(spark, TableFormat.HUDI, base_path),
        [target_for(spark, fmt, base_path) for fmt in formats],
    )
    return {fmt.value: res.status.value for fmt, res in results.items()}


def main(argv: Optional[list[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="onetable-spark-sync",
        description="Sync a source table's metadata to one or more target formats",
    )
    parser.add_argument(
        "--datasetConfig",
        required=True,
        help="YAML/JSON dataset config (sourceFormat, targetFormats, datasets)",
    )
    parser.add_argument(
        "--icebergCatalogConfig",
        default=None,
        help="optional YAML/JSON Iceberg catalog config (catalogImpl, catalogOptions)",
    )
    parser.add_argument(
        "--mode", choices=("incremental", "full"), default="incremental"
    )
    parser.add_argument(
        "--validate",
        action="store_true",
        help="after each successful sync, audit the target's read-back against "
        "the source (spec/schema/counts/per-file stats); drift downgrades the "
        "record to VALIDATION_FAILED",
    )
    parser.add_argument(
        "--optimize",
        default=None,
        type=int,
        metavar="TARGET_BYTES",
        help="instead of syncing, COMPACT each dataset in its source format: "
        "bin-pack small files to ~TARGET_BYTES, rewrite each bin into one "
        "merged file, and publish one transactional commit per table "
        "(operators/maintenance.py compact_table). Prints one JSON record "
        "per table",
    )
    parser.add_argument(
        "--vacuum",
        default=None,
        type=float,
        metavar="RETENTION_HOURS",
        help="instead of syncing, VACUUM each dataset in its source format: "
        "remove orphan data files no retained metadata version references "
        "and older than RETENTION_HOURS (operators/maintenance.py "
        "vacuum_table — the Delta VACUUM / Iceberg remove_orphan_files "
        "shape). Prints one JSON record per table",
    )
    parser.add_argument(
        "--watch",
        default=None,
        metavar="INTERVAL",
        help="run as a CONTINUOUS sync service instead of one batch pass: a "
        "streaming source over each dataset's commit log (_delta_log JSONs, "
        ".hoodie completed instants, or Iceberg metadata versions) triggers "
        "an incremental sync whenever a commit lands (sync/continuous.py). "
        "INTERVAL is a Structured Streaming processing-time trigger, e.g. "
        "'30 seconds'; blocks until interrupted",
    )
    args = parser.parse_args(argv)

    from onetable_spark.session import get_spark

    config = _load_config_file(args.datasetConfig)
    catalog = _load_config_file(args.icebergCatalogConfig) if args.icebergCatalogConfig else None
    spark = get_spark("onetable-spark-sync")
    if args.optimize is not None:
        return run_optimize(spark, config, target_bytes=args.optimize)
    if args.vacuum is not None:
        return run_vacuum(spark, config, retention_hours=args.vacuum)
    if args.watch is not None:
        return run_watch(spark, config, interval=args.watch)
    results = run_dataset_config(
        spark, config, iceberg_catalog=catalog, mode=args.mode, validate=args.validate
    )
    for r in results:
        print(json.dumps(r))
    return 0 if all(r["status"] == "SUCCESS" for r in results) else 1


def run_optimize(spark, config: dict, target_bytes: int) -> int:
    """OPTIMIZE every dataset in its source format (per-table isolation,
    same error contract as the sync loop)."""
    from onetable_spark.operators.maintenance import compact_table

    source_format = TableFormat(config["sourceFormat"])
    ok = True
    for ds in config.get("datasets", []):
        base = ds["tableBasePath"]
        record: dict[str, Any] = {"tableBasePath": base, "format": source_format.value}
        try:
            record.update(compact_table(spark, source_format, base, target_bytes))
            record["status"] = "SUCCESS"
        except Exception as e:  # noqa: BLE001 — per-table isolation
            record["status"] = "ERROR"
            record["error"] = str(e)
            ok = False
        print(json.dumps(record))
    return 0 if ok else 1


def run_vacuum(spark, config: dict, retention_hours: float) -> int:
    """VACUUM every dataset in its source format (per-table isolation,
    same error contract as the sync loop)."""
    from onetable_spark.operators.maintenance import vacuum_table

    source_format = TableFormat(config["sourceFormat"])
    ok = True
    for ds in config.get("datasets", []):
        base = ds["tableBasePath"]
        record: dict[str, Any] = {"tableBasePath": base, "format": source_format.value}
        try:
            counts = (
                vacuum_table(spark, source_format, base, retention_hours=retention_hours)
                .groupBy("status")
                .count()
                .collect()
            )
            record.update({r["status"]: r["count"] for r in counts})
            record["status"] = "SUCCESS"
        except Exception as e:  # noqa: BLE001 — per-table isolation
            record["status"] = "ERROR"
            record["error"] = str(e)
            ok = False
        print(json.dumps(record))
    return 0 if ok else 1


def run_watch(spark, config: dict, interval: str) -> int:
    """Start one ContinuousSync service per dataset and block.

    Checkpoints live under ``<tableBasePath>/_onetable_watch_ckpt`` so a
    restarted service resumes from the last commit it already synced."""
    import os

    from onetable_spark.sync.continuous import ContinuousSync

    source_format = TableFormat(config["sourceFormat"])
    target_formats = tuple(TableFormat(t) for t in config.get("targetFormats", []))
    queries = []
    for ds in config.get("datasets", []):
        base = ds["tableBasePath"]
        cs = ContinuousSync(
            spark,
            base,
            target_formats,
            checkpoint_dir=os.path.join(base, "_onetable_watch_ckpt"),
            source_format=source_format,
        )
        queries.append(cs.start(interval=interval))
    for q in queries:
        q.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
