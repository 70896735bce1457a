"""Partition-transform converters (SURVEY §2.4 C4-C9) over the canonical
``PartitionField`` IR.

Each table format names the same four time transforms differently:

- **Delta**: generated-column expressions in column metadata —
  ``YEAR(c)``, ``MONTH(c)``, ``DAY(c)``, ``HOUR(c)``, ``CAST(c AS DATE)``,
  ``DATE_FORMAT(c, 'yyyy-MM-dd')`` (DeltaPartitionExtractor.java:104-225);
- **Iceberg**: spec transform names ``year/month/day/hour/identity``;
  ``bucket``/``truncate``/``void`` are rejected exactly like the reference
  (IcebergPartitionSpecExtractor.java:50-78);
- **Hudi**: config strings ``path:type[:format]``
  (ConfigurationBasedPartitionSpecExtractor.java:42-74) and hive-style
  ``col=value/`` paths (HudiPartitionValuesExtractor.java:47-171).

Partition **values**: Iceberg stores transformed ints (years/months since
epoch, days/hours since epoch) — converted to/from epoch millis like
IcebergPartitionValueConverter.java:74-230.
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from onetable_spark.model.core import PartitionField, PartitionTransform

_EPOCH = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)


# ------------------------------------------------------------ Spark column


def transform_column(pf: PartitionField) -> Column:
    """The generated-column expression realizing a partition transform —
    used by writers to derive the physical partition column before
    ``partitionBy`` (SURVEY §1.1 OnePartitionField row)."""
    c = F.col(pf.source_field)
    t = pf.transform
    if t is PartitionTransform.VALUE:
        return c
    if t is PartitionTransform.YEAR:
        return F.date_format(c, "yyyy")
    if t is PartitionTransform.MONTH:
        return F.date_format(c, "yyyy-MM")
    if t is PartitionTransform.DAY:
        return F.date_format(c, "yyyy-MM-dd")
    if t is PartitionTransform.HOUR:
        return F.date_format(c, "yyyy-MM-dd-HH")
    raise ValueError(f"unsupported transform {t}")


# ------------------------------------------------------- Delta (C5 grammar)

_DELTA_FUNCS = {
    "YEAR": PartitionTransform.YEAR,
    "MONTH": PartitionTransform.MONTH,
    "DAY": PartitionTransform.DAY,
    "HOUR": PartitionTransform.HOUR,
}
_FMT_TO_TRANSFORM = {
    "yyyy": PartitionTransform.YEAR,
    "yyyy-MM": PartitionTransform.MONTH,
    "yyyy-MM-dd": PartitionTransform.DAY,
    "yyyy-MM-dd-HH": PartitionTransform.HOUR,
}
_RE_FUNC = re.compile(r"^\s*(YEAR|MONTH|DAY|HOUR)\s*\(\s*(\w+)\s*\)\s*$", re.IGNORECASE)
_RE_CAST_DATE = re.compile(r"^\s*CAST\s*\(\s*(\w+)\s+AS\s+DATE\s*\)\s*$", re.IGNORECASE)
_RE_DATE_FORMAT = re.compile(
    r"^\s*DATE_FORMAT\s*\(\s*(\w+)\s*,\s*'([^']+)'\s*\)\s*$", re.IGNORECASE
)


def parse_delta_generation_expr(expr: str, partition_name: str) -> PartitionField:
    """Delta generated-column expression → IR
    (DeltaPartitionExtractor.java:104-225)."""
    if m := _RE_FUNC.match(expr):
        return PartitionField(
            source_field=m.group(2),
            transform=_DELTA_FUNCS[m.group(1).upper()],
            partition_field_name=partition_name,
        )
    if m := _RE_CAST_DATE.match(expr):
        return PartitionField(
            source_field=m.group(1),
            transform=PartitionTransform.DAY,
            partition_field_name=partition_name,
        )
    if m := _RE_DATE_FORMAT.match(expr):
        fmt = m.group(2)
        if fmt not in _FMT_TO_TRANSFORM:
            raise ValueError(f"unsupported DATE_FORMAT pattern {fmt!r}")
        return PartitionField(
            source_field=m.group(1),
            transform=_FMT_TO_TRANSFORM[fmt],
            partition_field_name=partition_name,
        )
    raise ValueError(f"unparseable generation expression {expr!r}")


def to_delta_generation_expr(pf: PartitionField) -> str:
    """IR → Delta generated-column expression
    (DeltaPartitionExtractor.java:227-248, DATE_FORMAT flavor)."""
    t = pf.transform
    if t is PartitionTransform.VALUE:
        raise ValueError("identity partitions carry no generation expression")
    fmt = {v: k for k, v in _FMT_TO_TRANSFORM.items()}[t]
    return f"DATE_FORMAT({pf.source_field}, '{fmt}')"


# C5 multi-column fusion: YEAR(ts), MONTH(ts), DAY(ts)[, HOUR(ts)] column
# SETS are one logical transform at the finest granularity
# (DeltaPartitionExtractor.java:104-225 + getPartitionColumnsForHourOrDay-
# OrMonthOrYear validation: granularities must be a prefix of this order)
_GRANULARITY_ORDER = (
    PartitionTransform.YEAR,
    PartitionTransform.MONTH,
    PartitionTransform.DAY,
    PartitionTransform.HOUR,
)


def partition_fields_from_delta_columns(
    pcols: list[str], schema
) -> list[PartitionField]:
    """Delta partitionColumns + schema metadata → IR partition fields,
    with the full C5 grammar: identity, CAST(c AS DATE), DATE_FORMAT,
    single YEAR/MONTH/DAY/HOUR, and fused multi-column sets
    (DeltaPartitionExtractor.getOnePartitionFields)."""
    names = set(schema.fieldNames())

    def expr_of(col: str):
        if col in names:
            return ((schema[col].metadata or {}).get("delta.generationExpression") or "").replace("`", "")
        return ""

    out: list[PartitionField] = []
    i = 0
    while i < len(pcols):
        col = pcols[i]
        expr = expr_of(col)
        m = _RE_FUNC.match(expr) if expr else None
        if m is None:
            # identity / CAST / DATE_FORMAT / unknown → single-column forms
            if expr:
                try:
                    out.append(parse_delta_generation_expr(expr, col))
                except ValueError:
                    out.append(PartitionField(source_field=col))
            else:
                out.append(PartitionField(source_field=col))
            i += 1
            continue
        # consume the run of YEAR/MONTH/DAY/HOUR exprs over the same source
        run: list[tuple[str, PartitionTransform, str]] = []
        j = i
        source = m.group(2)
        while j < len(pcols):
            mj = _RE_FUNC.match(expr_of(pcols[j]) or "")
            if mj is None or mj.group(2) != source:
                break
            run.append((pcols[j], _DELTA_FUNCS[mj.group(1).upper()], source))
            j += 1
        transforms = [t for _, t, _ in run]
        if transforms != list(_GRANULARITY_ORDER[: len(run)]):
            raise ValueError(
                f"invalid fused partition transform sequence {[t.name for t in transforms]}"
                f" over {source!r} — must be a prefix of YEAR,MONTH,DAY,HOUR"
            )
        if len(run) == 1:
            out.append(
                PartitionField(
                    source_field=source,
                    transform=transforms[0],
                    partition_field_name=run[0][0],
                )
            )
        else:
            out.append(
                PartitionField(
                    source_field=source,
                    transform=transforms[-1],
                    partition_field_names=tuple(c for c, _, _ in run),
                )
            )
        i = j
    return out


_FUNC_OF_TRANSFORM = {
    PartitionTransform.YEAR: "YEAR",
    PartitionTransform.MONTH: "MONTH",
    PartitionTransform.DAY: "DAY",
    PartitionTransform.HOUR: "HOUR",
}


def delta_generated_columns_for(pf: PartitionField) -> list[tuple[str, str, str]]:
    """(column-name, generation-expr, spark-type) triples a time-transformed
    field materializes in the Delta schema (DeltaPartitionExtractor.
    getGeneratedField / convertToDeltaPartitionFormat :227-248).

    Fused fields emit one INT column per granularity (YEAR(ts), MONTH(ts),
    ...); single fields emit one STRING DATE_FORMAT column."""
    if pf.transform is PartitionTransform.VALUE:
        return []
    if pf.partition_field_names:
        grans = _GRANULARITY_ORDER[: len(pf.partition_field_names)]
        return [
            (col, f"{_FUNC_OF_TRANSFORM[g]}({pf.source_field})", "integer")
            for col, g in zip(pf.partition_field_names, grans)
        ]
    return [(pf.name, to_delta_generation_expr(pf), "string")]


# -------------------------------------------------------- Iceberg (C6 + C9)

_ICEBERG_NAMES = {
    "identity": PartitionTransform.VALUE,
    "year": PartitionTransform.YEAR,
    "month": PartitionTransform.MONTH,
    "day": PartitionTransform.DAY,
    "hour": PartitionTransform.HOUR,
}


def from_iceberg_transform(transform: str, source_field: str, name: str | None = None) -> PartitionField:
    """Iceberg spec transform → IR; bucket/truncate/void rejected
    (IcebergPartitionSpecExtractor.java:50-78)."""
    key = transform.lower()
    if key not in _ICEBERG_NAMES:
        raise ValueError(f"unsupported Iceberg transform {transform!r}")
    return PartitionField(
        source_field=source_field,
        transform=_ICEBERG_NAMES[key],
        partition_field_name=name,
    )


def to_iceberg_transform(pf: PartitionField) -> str:
    return {v: k for k, v in _ICEBERG_NAMES.items()}[pf.transform]


def iceberg_value_to_millis(transform: PartitionTransform, value: int) -> int:
    """Iceberg transformed int → epoch millis of the period start
    (IcebergPartitionValueConverter.java:74-145)."""
    if transform is PartitionTransform.YEAR:
        return int(dt.datetime(1970 + value, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    if transform is PartitionTransform.MONTH:
        y, m = divmod(value, 12)
        return int(dt.datetime(1970 + y, m + 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    if transform is PartitionTransform.DAY:
        return value * 86_400_000
    if transform is PartitionTransform.HOUR:
        return value * 3_600_000
    raise ValueError(f"no int encoding for {transform}")


def millis_to_iceberg_value(transform: PartitionTransform, millis: int) -> int:
    """Epoch millis → Iceberg transformed int
    (IcebergPartitionValueConverter.java:179-230)."""
    when = dt.datetime.fromtimestamp(millis / 1000, tz=dt.timezone.utc)
    if transform is PartitionTransform.YEAR:
        return when.year - 1970
    if transform is PartitionTransform.MONTH:
        return (when.year - 1970) * 12 + when.month - 1
    if transform is PartitionTransform.DAY:
        return millis // 86_400_000
    if transform is PartitionTransform.HOUR:
        return millis // 3_600_000
    raise ValueError(f"no int encoding for {transform}")


# ----------------------------------------------------------- Hudi (C4 + C7)

_HUDI_FMT = _FMT_TO_TRANSFORM  # same pattern vocabulary


def parse_hudi_partition_config(config: str) -> list[PartitionField]:
    """Hudi partition config ``path:type[:format][,...]`` → IR
    (ConfigurationBasedPartitionSpecExtractor.java:42-74 +
    HudiSourceConfigImpl). type VALUE → identity; type TIMESTAMP requires a
    format naming the granularity."""
    out = []
    for spec in config.split(","):
        parts = spec.strip().split(":")
        if len(parts) < 2:
            raise ValueError(f"malformed partition spec {spec!r}")
        path, typ = parts[0], parts[1].upper()
        if typ == "VALUE":
            out.append(PartitionField(source_field=path))
        elif typ == "TIMESTAMP":
            if len(parts) < 3 or parts[2] not in _HUDI_FMT:
                raise ValueError(f"timestamp partition {path!r} needs a known format")
            out.append(
                PartitionField(source_field=path, transform=_HUDI_FMT[parts[2]])
            )
        else:
            raise ValueError(f"unknown partition type {typ!r}")
    return out


HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def parse_hive_partition_path(rel_path: str) -> dict[str, str | None]:
    """Hive-style ``col=value/col2=value2`` directory path → value map;
    the hive NULL sentinel maps to None
    (HudiPartitionValuesExtractor.java:47-171)."""
    out: dict[str, str | None] = {}
    for seg in rel_path.strip("/").split("/"):
        if not seg:
            continue
        if "=" not in seg:
            raise ValueError(f"not a hive-style segment {seg!r}")
        k, v = seg.split("=", 1)
        out[k] = None if v == HIVE_DEFAULT_PARTITION else v
    return out
