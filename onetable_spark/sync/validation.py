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
    store absolute vs table-relative paths, so compare by file NAME (data
    file names are unique within a table — they carry UUIDs or unique
    sequence numbers in every real layout)."""
    return files.withColumn("file_name", F.element_at(F.split("path", "/"), -1))


class SnapshotReaderAdapter:
    """Adapts any SourceClient (ParquetSource/DeltaSource/HudiSource/
    IcebergSource — everything sync() can read from) into the TableReader
    protocol, so a sync source can be validated against its targets even
    when it has no standalone metadata reader (plain parquet)."""

    def __init__(self, source) -> None:
        self._source = source

    def table_descriptor(self) -> Table:
        return self._source.current_snapshot().table

    def snapshot_files(self) -> DataFrame:
        return self._source.current_snapshot().files


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
        impl = {
            ValidationCheck.CHECK_TABLE_SPEC: self._check_table_spec,
            ValidationCheck.CHECK_SCHEMA: self._check_schema,
            ValidationCheck.CHECK_BASIC_COUNTS: self._check_basic_counts,
            ValidationCheck.COMPARE_STATISTICS: self._compare_statistics,
        }
        out: dict[ValidationCheck, ValidationResult] = {}
        for check in checks:
            err: Optional[str]
            try:
                err = impl[check](source, target)
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
    def _check_basic_counts(source: TableReader, target: TableReader) -> Optional[str]:
        """File count and total record count agree — one 2-value agg per
        side, nothing else reaches the driver."""
        # driver-ok: single aggregated row per side
        s = source.snapshot_files().agg(
            F.count(F.lit(1)).alias("nf"), F.sum("record_count").alias("nr")
        ).first()
        t = target.snapshot_files().agg(
            F.count(F.lit(1)).alias("nf"), F.sum("record_count").alias("nr")
        ).first()
        if (s["nf"], s["nr"]) != (t["nf"], t["nr"]):
            return (
                f"counts drift: source files={s['nf']} rows={s['nr']} "
                f"target files={t['nf']} rows={t['nr']}"
            )
        return None

    @staticmethod
    def _compare_statistics(source: TableReader, target: TableReader) -> Optional[str]:
        """Per-file statistics (record_count, size) agree file-by-file:
        full-outer join on file name, mismatches counted distributed, ≤3
        example names fetched for the message."""
        cols = ["file_name", "record_count", "size"]
        s = _file_key(source.snapshot_files()).select(*cols)
        t = _file_key(target.snapshot_files()).select(*cols)
        joined = s.alias("s").join(t.alias("t"), "file_name", "full_outer")
        # null-SAFE comparisons: a commit plane that DROPS a stat (NULL on
        # one side) is drift, and a plain != would evaluate to NULL and
        # slip through the filter
        bad = joined.filter(
            ~F.col("s.record_count").eqNullSafe(F.col("t.record_count"))
            | ~F.col("s.size").eqNullSafe(F.col("t.size"))
        )
        # driver-ok: bounded 3-row example sample + one count
        examples = [r["file_name"] for r in bad.select("file_name").limit(3).collect()]
        if examples:
            n_bad = bad.count()
            return f"per-file stats drift on {n_bad} files, e.g. {examples}"
        return None
