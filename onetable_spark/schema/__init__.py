"""Schema plane: evolution diffing (K6/K7) and partition-transform
converters (C4-C9). The hub type is ``pyspark.sql.types.StructType``
(SURVEY §7 architecture stance)."""

from onetable_spark.schema.evolution import (
    SchemaOp,
    apply_ops,
    diff_schemas,
    to_sql_statements,
)
from onetable_spark.schema.partitions import (
    from_iceberg_transform,
    iceberg_value_to_millis,
    millis_to_iceberg_value,
    parse_delta_generation_expr,
    parse_hive_partition_path,
    parse_hudi_partition_config,
    to_delta_generation_expr,
    to_iceberg_transform,
    transform_column,
)

__all__ = [
    "SchemaOp",
    "diff_schemas",
    "apply_ops",
    "to_sql_statements",
    "transform_column",
    "parse_delta_generation_expr",
    "to_delta_generation_expr",
    "from_iceberg_transform",
    "to_iceberg_transform",
    "parse_hudi_partition_config",
    "parse_hive_partition_path",
    "iceberg_value_to_millis",
    "millis_to_iceberg_value",
]
