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
