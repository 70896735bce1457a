"""Avro schema ↔ Spark StructType converter with logical types (C1) and
Hudi field-id tracking (IdTracker parity).

The IR of this engine is Spark's StructType (SURVEY §2.4 C2: identity by
design), so the reference's AvroSchemaConverter (core/.../avro/
AvroSchemaConverter.java:90-263 to-IR, :301-420 from-IR) maps here to a
JSON-Avro-dict ↔ StructType pair:

- ``int`` + ``date`` → DateType                 (ref :105-110)
- ``bytes``/``fixed`` + ``decimal(p,s)`` → DecimalType(p,s), fixed size
  preserved in field metadata                   (ref :119-140)
- ``long`` + ``timestamp-millis/micros`` → TimestampType,
  ``local-timestamp-millis/micros`` → TimestampNTZType, precision kept in
  metadata so generation restores the exact logical type (ref :148-164)
- ``enum`` → StringType with symbols in metadata (Spark has no enum;
  symbols survive the round trip)               (ref :166-169)
- ``fixed`` (plain) → BinaryType with size metadata
- ``uuid`` string logical type → StringType with metadata
- nullable = union with ``null`` (ref :246-263); complex non-null unions
  are rejected like the reference's UnsupportedSchemaTypeException.

Field-id tracking mirrors hudi-support/utils/.../IdTracker.java:104-186:
ids are assigned breadth-first per record level (fields first, then
recursion into record/array/map children; array contributes ``element``,
map contributes ``key``/``value``), reusing any id the previous schema
already assigned so renames/evolution stay id-stable, and the result is
stored on the schema as the ``hudi_id_tracking`` object property
``{"idMappings": [...], "lastIdUsed": N}``.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import types as T

_AVRO_PRIMITIVES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


class UnsupportedAvroTypeError(ValueError):
    """Schema shape the converter (and the reference) rejects."""


# ------------------------------------------------------------------ to Spark


def _strip_null(avro: Any) -> tuple[Any, bool]:
    """Unwrap a union-with-null → (branch, nullable). Single-branch unions
    collapse; multi-branch non-null unions are unsupported (ref :246-263)."""
    if not isinstance(avro, list):
        return avro, False
    branches = [b for b in avro if b != "null"]
    if len(branches) == 1:
        return branches[0], True
    raise UnsupportedAvroTypeError(f"complex union {avro!r}")


def avro_to_structtype(avro: Any) -> T.StructType:
    """Top-level record schema → StructType."""
    import json

    if isinstance(avro, str):
        avro = json.loads(avro)
    avro, _ = _strip_null(avro)
    if not (isinstance(avro, dict) and avro.get("type") == "record"):
        raise UnsupportedAvroTypeError("top-level Avro schema must be a record")
    return _record_to_struct(avro)


def _record_to_struct(rec: dict) -> T.StructType:
    fields = []
    for f in rec.get("fields", []):
        branch, nullable = _strip_null(f["type"])
        dt, meta = _avro_type_to_spark(branch)
        if f.get("doc"):
            meta = {**meta, "comment": f["doc"]}
        fields.append(T.StructField(f["name"], dt, nullable, metadata=meta or None))
    return T.StructType(fields)


def _avro_type_to_spark(avro: Any) -> tuple[T.DataType, dict]:
    """One non-union Avro type node → (Spark type, metadata-to-preserve)."""
    if isinstance(avro, str):
        if avro == "null":
            return T.NullType(), {}
        if avro in _AVRO_PRIMITIVES:
            return _AVRO_PRIMITIVES[avro], {}
        raise UnsupportedAvroTypeError(f"unknown primitive {avro!r}")
    if not isinstance(avro, dict):
        raise UnsupportedAvroTypeError(f"malformed node {avro!r}")

    t = avro["type"]
    logical = avro.get("logicalType")

    if t == "int" and logical == "date":
        return T.DateType(), {}
    if t == "long" and logical in ("timestamp-millis", "timestamp-micros"):
        return T.TimestampType(), {"timestampPrecision": logical.rsplit("-", 1)[1]}
    if t == "long" and logical in ("local-timestamp-millis", "local-timestamp-micros"):
        return T.TimestampNTZType(), {"timestampPrecision": logical.rsplit("-", 1)[1]}
    if t in ("bytes", "fixed") and logical == "decimal":
        meta = (
            {"fixedSize": avro["size"], "fixedName": avro.get("name")}
            if t == "fixed"
            else {}
        )
        return T.DecimalType(avro["precision"], avro.get("scale", 0)), meta
    if t == "fixed":
        return T.BinaryType(), {"fixedSize": avro["size"], "fixedName": avro.get("name")}
    if t == "string" and logical == "uuid":
        return T.StringType(), {"logicalType": "uuid"}
    if t == "enum":
        return T.StringType(), {
            "enumSymbols": avro["symbols"],
            "enumName": avro.get("name"),
        }
    if t == "record":
        return _record_to_struct(avro), {}
    if t == "array":
        branch, nullable = _strip_null(avro["items"])
        dt, _ = _avro_type_to_spark(branch)
        return T.ArrayType(dt, containsNull=nullable), {}
    if t == "map":
        branch, nullable = _strip_null(avro["values"])
        dt, _ = _avro_type_to_spark(branch)
        return T.MapType(T.StringType(), dt, valueContainsNull=nullable), {}
    if t in _AVRO_PRIMITIVES or t == "null":
        # wrapped primitive with an unrecognized/absent logical type keeps
        # its base type (LogicalTypes the ref doesn't map fall through too)
        return _avro_type_to_spark(t)
    raise UnsupportedAvroTypeError(f"unsupported Avro type {t!r}")


# ------------------------------------------------------------------ to Avro


def structtype_to_avro(
    schema: T.StructType, name: str = "spark_schema", namespace: Optional[str] = None
) -> dict:
    """StructType → Avro record schema dict (ref fromOneSchema :301-420).

    Nullable fields become ``["null", type]`` unions with null defaults;
    metadata written by :func:`avro_to_structtype` restores enum / fixed /
    timestamp-precision fidelity on the way back out."""
    rec: dict = {"type": "record", "name": name, "fields": []}
    if namespace:
        rec["namespace"] = namespace
    for i, f in enumerate(schema.fields):
        meta = dict(f.metadata or {})
        node = _spark_type_to_avro(f.dataType, meta, _path(namespace, name), f.name)
        entry: dict = {"name": f.name, "type": ["null", node] if f.nullable else node}
        if f.nullable:
            entry["default"] = None
        if meta.get("comment"):
            entry["doc"] = meta["comment"]
        rec["fields"].append(entry)
    return rec


def _path(namespace: Optional[str], name: str) -> str:
    return f"{namespace}.{name}" if namespace else name


def _spark_type_to_avro(dt: T.DataType, meta: dict, ns: str, field_name: str) -> Any:
    if isinstance(dt, T.StructType):
        return structtype_to_avro(dt, name=field_name, namespace=ns)
    if isinstance(dt, T.ArrayType):
        item = _spark_type_to_avro(dt.elementType, {}, ns, f"{field_name}_element")
        return {"type": "array", "items": ["null", item] if dt.containsNull else item}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise UnsupportedAvroTypeError("Avro maps require string keys")
        value = _spark_type_to_avro(dt.valueType, {}, ns, f"{field_name}_value")
        return {
            "type": "map",
            "values": ["null", value] if dt.valueContainsNull else value,
        }
    if isinstance(dt, T.DecimalType):
        node = {
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
        if "fixedSize" in meta:
            return {
                "type": "fixed",
                "name": meta.get("fixedName") or f"{field_name}_fixed",
                "size": meta["fixedSize"],
                **node,
            }
        return {"type": "bytes", **node}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        precision = meta.get("timestampPrecision", "micros")  # Spark stores micros
        return {"type": "long", "logicalType": f"timestamp-{precision}"}
    if isinstance(dt, T.TimestampNTZType):
        precision = meta.get("timestampPrecision", "micros")
        return {"type": "long", "logicalType": f"local-timestamp-{precision}"}
    if isinstance(dt, T.StringType):
        if meta.get("enumSymbols"):
            return {
                "type": "enum",
                "name": meta.get("enumName") or f"{field_name}_enum",
                "symbols": meta["enumSymbols"],
            }
        if meta.get("logicalType") == "uuid":
            return {"type": "string", "logicalType": "uuid"}
        return "string"
    if isinstance(dt, T.BinaryType):
        if "fixedSize" in meta:
            return {
                "type": "fixed",
                "name": meta.get("fixedName") or f"{field_name}_fixed",
                "size": meta["fixedSize"],
            }
        return "bytes"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.NullType):
        return "null"
    raise UnsupportedAvroTypeError(f"no Avro mapping for Spark type {dt.simpleString()}")


# -------------------------------------------------------- field-id tracking

ID_TRACKING_PROP = "hudi_id_tracking"
_ARRAY_FIELD = "element"
_KEY_FIELD = "key"
_VALUE_FIELD = "value"


def _branch_of(avro_type: Any) -> Any:
    """Non-null branch of a (possibly union) field type (IdTracker
    getFieldSchema)."""
    if isinstance(avro_type, list):
        branches = [b for b in avro_type if b != "null"]
        return branches[0] if branches else "null"
    return avro_type


def _children_of(node: Any) -> list[tuple[str, Any]]:
    """(mapping-name, child-node) pairs one level down, in IdTracker's
    order: array → element; map → key, value; record → declared fields."""
    node = _branch_of(node)
    if not isinstance(node, dict):
        return []
    t = node.get("type")
    if t == "array":
        return [(_ARRAY_FIELD, node["items"])]
    if t == "map":
        return [(_KEY_FIELD, "string"), (_VALUE_FIELD, node["values"])]
    if t == "record":
        return [(f["name"], f["type"]) for f in node.get("fields", [])]
    return []


def _generate_id_mappings(node: Any, counter: list, existing: Optional[list]) -> list:
    """IdTracker.generateIdMappings:140-179 — assign this level's ids
    first (reusing existing by name), then recurse into complex children."""
    by_name = {m["name"]: m for m in (existing or [])}
    mappings, nested = [], []
    for child_name, child_type in _children_of(node):
        m = by_name.get(child_name)
        if m is None:
            counter[0] += 1
            m = {"name": child_name, "id": counter[0]}
        else:
            m = dict(m)  # never mutate the previous schema's tracking
        mappings.append(m)
        if _children_of(child_type):
            nested.append((m, child_type))
    for m, child_type in nested:
        sub = _generate_id_mappings(child_type, counter, m.get("fields"))
        if sub:
            m["fields"] = sub
    return sorted(mappings, key=lambda m: m["id"])


def add_id_tracking(avro_schema: dict, previous: Optional[dict] = None) -> dict:
    """Return a copy of ``avro_schema`` carrying the ``hudi_id_tracking``
    property, ids stable w.r.t. ``previous`` (IdTracker.addIdTracking)."""
    prev_tracking = (previous or {}).get(ID_TRACKING_PROP) or {}
    counter = [prev_tracking.get("lastIdUsed", 0)]
    mappings = _generate_id_mappings(
        avro_schema, counter, prev_tracking.get("idMappings")
    )
    out = {k: v for k, v in avro_schema.items() if k != ID_TRACKING_PROP}
    out[ID_TRACKING_PROP] = {"idMappings": mappings, "lastIdUsed": counter[0]}
    return out


def inject_field_ids(schema: T.StructType, ids: dict[str, int], prefix: str = "") -> T.StructType:
    """Stamp tracked ids into StructField metadata as ``fieldId`` so
    Iceberg schema construction honors them (structtype_to_iceberg reads
    the key; ref IcebergSchemaExtractor + IdTracker pairing makes
    Hudi→Iceberg renames id-stable). Fields without a tracked id — and
    array/map child positions, which StructFields can't annotate — keep
    counter-assigned ids."""
    out = []
    for f in schema.fields:
        path = f"{prefix}.{f.name}" if prefix else f.name
        dt = f.dataType
        if isinstance(dt, T.StructType):
            dt = inject_field_ids(dt, ids, path)
        meta = dict(f.metadata or {})
        if path in ids:
            meta["fieldId"] = ids[path]
        out.append(T.StructField(f.name, dt, f.nullable, metadata=meta or None))
    return T.StructType(out)


def id_tracking_to_field_ids(avro_schema: dict) -> dict[str, int]:
    """Flatten the tracked ids to a dot-path → id map (``a.b``, ``arr.element``)
    for id-stable Iceberg schema construction on Hudi→Iceberg syncs."""
    tracking = avro_schema.get(ID_TRACKING_PROP) or {}
    out: dict[str, int] = {}

    def walk(mappings: list, prefix: str) -> None:
        for m in mappings:
            path = f"{prefix}.{m['name']}" if prefix else m["name"]
            out[path] = m["id"]
            walk(m.get("fields", []), path)

    walk(tracking.get("idMappings", []), "")
    return out
