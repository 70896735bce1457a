"""Post-sync validation plane.

The reference DECLARES this surface but never implements it:
api/src/main/java/io/onetable/model/validation/ValidationCheck.java:26-31
(the four-check enum), ValidationResult.java:30-38 (instant/check/
success/errorMessage), ValidationChecker.java:33-36 (the interface —
unreferenced even by the reference's own core). This engine implements it
for real: after a sync, every check compares the TARGET format's own
read-back (its snapshot inventory + descriptor, decoded through that
format's commit plane) against the SOURCE's, so a bug in any of the three
metadata encodings surfaces as a failed check instead of a silent drift.

Spark-first: the row-level comparisons (counts, per-file statistics) run
as DataFrame aggregations and joins over the two inventory DataFrames —
the driver only ever sees a handful of counters and ≤3 example file names
for the error message, so validation scales to million-file tables like
every other part of the commit plane.
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass
from typing import Optional, Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onetable_spark.model import Table, TableFormat


class ValidationCheck(str, enum.Enum):
    """api/.../model/validation/ValidationCheck.java:26-31."""

    CHECK_TABLE_SPEC = "CHECK_TABLE_SPEC"
    CHECK_SCHEMA = "CHECK_SCHEMA"
    CHECK_BASIC_COUNTS = "CHECK_BASIC_COUNTS"
    COMPARE_STATISTICS = "COMPARE_STATISTICS"


ALL_CHECKS: tuple[ValidationCheck, ...] = tuple(ValidationCheck)


@dataclass(frozen=True)
class ValidationResult:
    """api/.../model/validation/ValidationResult.java:30-38."""

    instant_millis: int
    check: ValidationCheck
    success: bool
    error_message: Optional[str] = None


class TableReader(Protocol):
    """What a format plane must expose to be validated — all three of
    DeltaLog, IcebergTable and HudiTimeline satisfy it."""

    def table_descriptor(self) -> Table: ...

    def snapshot_files(self) -> DataFrame: ...


def _file_key(files: DataFrame) -> DataFrame:
    """Normalize an inventory to a format-independent join key: formats
    store absolute vs table-relative paths, so compare by the file NAME
    prefixed with its hive partition dirs (``k=v`` components). The name
    alone is NOT unique on partitioned layouts — Spark's ``partitionBy``
    writes the SAME ``part-00000-<uuid>`` basename into every partition
    dir a task touches (r13; the basename-only key made the full-outer
    join fan out and report phantom stats drift on bucketed tables)."""
    parts = F.split("path", "/")
    return files.withColumn(
        "file_name",
        F.concat_ws(
            "/",
            F.concat(
                F.filter(parts, lambda x: x.contains("=")),
                F.slice(parts, -1, 1),
            ),
        ),
    )


class SnapshotReaderAdapter:
    """Adapts any SourceClient (ParquetSource/DeltaSource/HudiSource/
    IcebergSource — everything sync() can read from) into the TableReader
    protocol, so a sync source can be validated against its targets even
    when it has no standalone metadata reader (plain parquet).

    The snapshot is extracted ONCE and cached (r12): a validate() run
    consults descriptor and files several times per check set, and
    ``current_snapshot()`` is not free — a Hudi source re-derives the
    timeline and runs its staleness probes on every call."""

    def __init__(self, source) -> None:
        self._source = source
        self._snap = None

    def _snapshot(self):
        if self._snap is None:
            self._snap = self._source.current_snapshot()
        return self._snap

    def table_descriptor(self) -> Table:
        return self._snapshot().table

    def snapshot_files(self) -> DataFrame:
        return self._snapshot().files


class SyncValidator:
    """Runs the requested checks of a TARGET's read-back against the
    SOURCE (ValidationChecker.validate parity, with the OneTable argument
    replaced by the source's own reader so statistics can be compared
    distributed rather than from a driver-side model object)."""

    def validate(
        self,
        source: TableReader,
        target: TableReader,
        checks: tuple[ValidationCheck, ...] = ALL_CHECKS,
    ) -> dict[ValidationCheck, ValidationResult]:
        # the two inventory-level checks share ONE aggregation job over
        # the full-outer join (r12): file/record totals AND per-file drift
        # fall out of the same pass, halving the Spark-job count of every
        # post-sync validation (13 staged lifecycles run this per target)
        cmp_cache: dict = {}

        def inv_cmp():
            if "row" not in cmp_cache:
                cmp_cache["row"], cmp_cache["bad"] = self._inventory_comparison(
                    source, target
                )
            return cmp_cache["row"], cmp_cache["bad"]

        impl = {
            ValidationCheck.CHECK_TABLE_SPEC: lambda: self._check_table_spec(
                source, target
            ),
            ValidationCheck.CHECK_SCHEMA: lambda: self._check_schema(source, target),
            ValidationCheck.CHECK_BASIC_COUNTS: lambda: self._check_basic_counts(
                inv_cmp
            ),
            ValidationCheck.COMPARE_STATISTICS: lambda: self._compare_statistics(
                inv_cmp
            ),
        }
        out: dict[ValidationCheck, ValidationResult] = {}
        for check in checks:
            err: Optional[str]
            try:
                err = impl[check]()
            except Exception as e:  # noqa: BLE001 — a crash is a failed check
                err = f"{type(e).__name__}: {e}"
            out[check] = ValidationResult(
                instant_millis=int(time.time() * 1000),
                check=check,
                success=err is None,
                error_message=err,
            )
        return out

    @staticmethod
    def _inventory_comparison(source: TableReader, target: TableReader):
        """One aggregation over the full-outer join of both inventories:
        per-side file/record totals plus the per-file drift count. Returns
        (totals_row, bad_frame) — the bad frame is only ACTED on (example
        fetch) when the drift count is non-zero, so the happy path costs a
        single Spark job."""
        cols = ["file_name", "record_count", "size"]
        s = _file_key(source.snapshot_files()).select(*cols).withColumn(
            "_one", F.lit(1)
        )
        t = _file_key(target.snapshot_files()).select(*cols).withColumn(
            "_one", F.lit(1)
        )
        joined = s.alias("s").join(t.alias("t"), "file_name", "full_outer")
        # null-SAFE comparisons: a commit plane that DROPS a stat (NULL on
        # one side) is drift, and a plain != would evaluate to NULL and
        # slip through the filter
        bad_cond = ~F.col("s.record_count").eqNullSafe(F.col("t.record_count")) | ~F.col(
            "s.size"
        ).eqNullSafe(F.col("t.size"))
        bad = joined.filter(bad_cond)
        # driver-ok: single aggregated row for both inventory checks
        row = joined.agg(
            F.coalesce(F.sum("s._one"), F.lit(0)).alias("s_nf"),
            F.coalesce(F.sum("t._one"), F.lit(0)).alias("t_nf"),
            F.sum("s.record_count").alias("s_nr"),
            F.sum("t.record_count").alias("t_nr"),
            F.sum(F.when(bad_cond, 1).otherwise(0)).alias("n_bad"),
        ).first()
        return row, bad

    @staticmethod
    def _check_table_spec(source: TableReader, target: TableReader) -> Optional[str]:
        """Partition spec + record keys survived the sync (source field,
        transform and key ordering — the physical column NAME may legally
        differ across formats, e.g. Iceberg's `col_transform` naming)."""
        s, t = source.table_descriptor(), target.table_descriptor()
        s_spec = [(p.source_field, p.transform.value) for p in s.partition_fields]
        t_spec = [(p.source_field, p.transform.value) for p in t.partition_fields]
        if s_spec != t_spec:
            return f"partition spec drift: source={s_spec} target={t_spec}"
        # Record keys: Delta has no protocol-level key concept, so an empty
        # target key set is always legal there (the reference consumes
        # recordKeyFields only in the Hudi table config and the Iceberg
        # identifierFieldIds mapping, IcebergSchemaExtractor.java:69-99 —
        # DeltaClient has no equivalent). An EMPTY Iceberg key set is legal
        # ONLY when some source key field is nullable in the target schema
        # (identifier fields must be required — the extractor's
        # all-required gate); with all key fields required, an empty set
        # means the identifier-field-id mapping was dropped, which is the
        # drift this check exists to catch.
        if tuple(s.record_key_fields) != tuple(t.record_key_fields):
            waived = False
            if not t.record_key_fields and s.record_key_fields:
                if t.table_format is TableFormat.DELTA:
                    waived = True
                elif t.table_format is TableFormat.ICEBERG:
                    nullable = {f.name for f in t.read_schema.fields if f.nullable}
                    waived = any(k in nullable for k in s.record_key_fields)
            if not waived:
                return (
                    f"record keys drift: source={s.record_key_fields} "
                    f"target={t.record_key_fields}"
                )
        return None

    @staticmethod
    def _check_schema(source: TableReader, target: TableReader) -> Optional[str]:
        """Field names + types in order. Nullability and field ids are
        deliberately out of scope: formats disagree on them by design
        (Hudi's avro union nullability, Delta's columnMapping ids) and the
        schema codecs' own parity is pinned in the C1-C3 pytest suites."""
        s = [(f.name, f.dataType.simpleString()) for f in source.table_descriptor().read_schema.fields]
        t = [(f.name, f.dataType.simpleString()) for f in target.table_descriptor().read_schema.fields]
        if s != t:
            from itertools import zip_longest

            drift = [(a, b) for a, b in zip_longest(s, t) if a != b][:3]
            return f"schema drift (source≠target): first diffs {drift}, lens {len(s)}/{len(t)}"
        return None

    @staticmethod
    def _check_basic_counts(inv_cmp) -> Optional[str]:
        """File count and total record count agree — read off the shared
        inventory-comparison aggregation."""
        row, _ = inv_cmp()
        if (row["s_nf"], row["s_nr"]) != (row["t_nf"], row["t_nr"]):
            return (
                f"counts drift: source files={row['s_nf']} rows={row['s_nr']} "
                f"target files={row['t_nf']} rows={row['t_nr']}"
            )
        return None

    @staticmethod
    def _compare_statistics(inv_cmp) -> Optional[str]:
        """Per-file statistics (record_count, size) agree file-by-file:
        drift count from the shared aggregation; ≤3 example names fetched
        only when drift exists."""
        row, bad = inv_cmp()
        if row["n_bad"]:
            # driver-ok: bounded 3-row example sample on the failure path
            examples = [
                r["file_name"] for r in bad.select("file_name").limit(3).collect()
            ]
            return f"per-file stats drift on {row['n_bad']} files, e.g. {examples}"
        return None
