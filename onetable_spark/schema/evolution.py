"""Schema-evolution sync: diff two StructTypes into an ordered op list.

Re-expresses the reference's ``IcebergSchemaSync`` diffing
(core/src/main/java/io/onetable/iceberg/IcebergSchemaSync.java:46-154) over
the StructType hub:

- **drops first** (the reference emits deletes at map key 0 so adds can
  reuse a column name without collision), then adds, then in-place updates
  (type widening / nullability / docs);
- **rename detection via field IDs**: a field whose
  ``metadata["fieldId"]`` matches an existing field but whose name differs
  is a RENAME, not drop+add — preserving Iceberg rename-safety semantics
  (IcebergSchemaExtractor.java:143-165 assigns the IDs);
- **recursion** into struct children, array elements and map values;
  **map-key changes are rejected** like the reference
  (IcebergSchemaSync.java rejects map-key struct changes).

The op list is format-agnostic; emitters turn it into Spark SQL DDL
(`to_sql_statements`) or apply it functionally (`apply_ops`) for commit
planes that write full schemas (Delta metadata action, Iceberg
metadata.json, Hudi commit schema).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import types as T

FIELD_ID_KEY = "fieldId"


class OpKind(str, enum.Enum):
    DROP = "DROP"
    ADD = "ADD"
    RENAME = "RENAME"
    WIDEN_TYPE = "WIDEN_TYPE"
    RELAX_NULLABILITY = "RELAX_NULLABILITY"


# legal primitive widenings (Iceberg's promotion rules; Delta's are a
# superset for int→long / float→double)
_WIDENINGS: dict[tuple[str, str], bool] = {
    ("integer", "long"): True,
    ("float", "double"): True,
    ("date", "timestamp_ntz"): True,
}


@dataclass(frozen=True)
class SchemaOp:
    """One evolution step; ``path`` is the dot-joined field path (list
    elements as ``element``, map values as ``value`` — the canonical
    nested-path convention, OneField.java:64-73)."""

    kind: OpKind
    path: str
    new_name: Optional[str] = None
    data_type: Optional[T.DataType] = None
    nullable: Optional[bool] = None
    metadata: dict = field(default_factory=dict, compare=False)


def _fid(f: T.StructField) -> Optional[int]:
    try:
        v = f.metadata.get(FIELD_ID_KEY)
    except AttributeError:
        v = None
    return int(v) if v is not None else None


def _decimal_widens(old: T.DecimalType, new: T.DecimalType) -> bool:
    # precision may grow, scale must not change (Iceberg rule)
    return new.scale == old.scale and new.precision >= old.precision


def _type_widens(old: T.DataType, new: T.DataType) -> bool:
    if isinstance(old, T.DecimalType) and isinstance(new, T.DecimalType):
        return _decimal_widens(old, new)
    return _WIDENINGS.get((old.typeName(), new.typeName()), False)


def diff_schemas(old: T.StructType, new: T.StructType, prefix: str = "") -> list[SchemaOp]:
    """Ordered evolution ops turning ``old`` into ``new``.

    Raises ``ValueError`` for illegal evolutions: type narrowing,
    nullable→required, or map-key changes.
    """
    ops: list[SchemaOp] = []
    old_by_name = {f.name: f for f in old.fields}
    new_by_name = {f.name: f for f in new.fields}
    old_by_id = {fid: f for f in old.fields if (fid := _fid(f)) is not None}

    renames: dict[str, str] = {}  # old name -> new name
    for nf in new.fields:
        nid = _fid(nf)
        if nid is not None and nid in old_by_id and old_by_id[nid].name != nf.name:
            renames[old_by_id[nid].name] = nf.name

    drops = [
        f
        for f in old.fields
        if f.name not in new_by_name and f.name not in renames
    ]
    adds = [
        f
        for f in new.fields
        if f.name not in old_by_name and f.name not in renames.values()
    ]

    # 1) drops first (reference order: deletes at key 0)
    for f in drops:
        ops.append(SchemaOp(OpKind.DROP, f"{prefix}{f.name}"))
    # 2) adds
    for f in adds:
        if not f.nullable:
            raise ValueError(
                f"cannot add required column {prefix}{f.name!r} to existing rows"
            )
        ops.append(
            SchemaOp(
                OpKind.ADD,
                f"{prefix}{f.name}",
                data_type=f.dataType,
                nullable=f.nullable,
                metadata=dict(f.metadata),
            )
        )
    # 3) in-place updates + recursion over surviving fields (old-name paths,
    #    so they must apply BEFORE renames)
    for of in old.fields:
        target_name = renames.get(of.name, of.name)
        nf = new_by_name.get(target_name)
        if nf is None:
            continue
        path = f"{prefix}{of.name}"
        if of.dataType != nf.dataType:
            ops.extend(_diff_types(of.dataType, nf.dataType, path))
        if of.nullable != nf.nullable:
            if of.nullable and not nf.nullable:
                raise ValueError(f"cannot tighten nullability of {path!r}")
            ops.append(SchemaOp(OpKind.RELAX_NULLABILITY, path, nullable=True))
    # 4) renames last
    for old_name, new_name in renames.items():
        ops.append(SchemaOp(OpKind.RENAME, f"{prefix}{old_name}", new_name=new_name))
    return ops


def _diff_types(old: T.DataType, new: T.DataType, path: str) -> list[SchemaOp]:
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        return diff_schemas(old, new, prefix=f"{path}.")
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        return _diff_types(old.elementType, new.elementType, f"{path}.element")
    if isinstance(old, T.MapType) and isinstance(new, T.MapType):
        if old.keyType != new.keyType:
            raise ValueError(f"map key type of {path!r} cannot evolve")
        return _diff_types(old.valueType, new.valueType, f"{path}.value")
    if _type_widens(old, new):
        return [SchemaOp(OpKind.WIDEN_TYPE, path, data_type=new)]
    raise ValueError(
        f"illegal type evolution at {path!r}: {old.simpleString()} -> {new.simpleString()}"
    )


# ----------------------------------------------------------------- appliers


def apply_ops(schema: T.StructType, ops: list[SchemaOp]) -> T.StructType:
    """Pure functional application — the golden-test invariant is
    ``apply_ops(old, diff_schemas(old, new)) == new`` (modulo field order:
    adds append at the end, like ALTER TABLE ADD COLUMN)."""
    out = schema
    for op in ops:
        out = _apply_one(out, op.path.split("."), op)
    return out


def _apply_one(dt: T.DataType, parts: list[str], op: SchemaOp) -> T.DataType:
    head, rest = parts[0], parts[1:]
    if head == "element":
        assert isinstance(dt, T.ArrayType)
        return T.ArrayType(_apply_nested(dt.elementType, rest, op), dt.containsNull)
    if head == "value":
        assert isinstance(dt, T.MapType)
        return T.MapType(dt.keyType, _apply_nested(dt.valueType, rest, op), dt.valueContainsNull)
    assert isinstance(dt, T.StructType)
    if not rest:
        fields = list(dt.fields)
        if op.kind is OpKind.DROP:
            fields = [f for f in fields if f.name != head]
        elif op.kind is OpKind.ADD:
            fields.append(
                T.StructField(head, op.data_type, op.nullable, metadata=op.metadata)
            )
        else:
            fields = [
                f
                if f.name != head
                else T.StructField(
                    op.new_name if op.kind is OpKind.RENAME else f.name,
                    op.data_type if op.kind is OpKind.WIDEN_TYPE else f.dataType,
                    True if op.kind is OpKind.RELAX_NULLABILITY else f.nullable,
                    metadata=f.metadata,
                )
                for f in fields
            ]
        return T.StructType(fields)
    fields = [
        f if f.name != head else T.StructField(f.name, _apply_nested(f.dataType, rest, op), f.nullable, metadata=f.metadata)
        for f in dt.fields
    ]
    return T.StructType(fields)


def _apply_nested(dt: T.DataType, parts: list[str], op: SchemaOp) -> T.DataType:
    if not parts:
        # terminal op on a non-struct container slot (WIDEN on element/value)
        if op.kind is OpKind.WIDEN_TYPE:
            return op.data_type
        raise ValueError(f"cannot apply {op.kind} below a container")
    return _apply_one(dt, parts, op)


_SQL_TYPE = {
    OpKind.ADD: "ALTER TABLE {t} ADD COLUMN {p} {dt}",
    OpKind.DROP: "ALTER TABLE {t} DROP COLUMN {p}",
    OpKind.RENAME: "ALTER TABLE {t} RENAME COLUMN {p} TO {n}",
    OpKind.WIDEN_TYPE: "ALTER TABLE {t} ALTER COLUMN {p} TYPE {dt}",
    OpKind.RELAX_NULLABILITY: "ALTER TABLE {t} ALTER COLUMN {p} DROP NOT NULL",
}


def to_sql_statements(ops: list[SchemaOp], table_name: str) -> list[str]:
    """Render the op list as Spark SQL DDL (the K6 emitter for catalogs
    that speak ALTER TABLE — Iceberg/Delta Spark integrations)."""
    out = []
    for op in ops:
        out.append(
            _SQL_TYPE[op.kind].format(
                t=table_name,
                p=op.path,
                n=op.new_name,
                dt=op.data_type.simpleString() if op.data_type is not None else "",
            )
        )
    return out
