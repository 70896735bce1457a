"""onetable_spark — a PySpark-native lakehouse metadata engine.

A from-scratch rebuild of the capabilities of onetable-io/onetable
(reference: an omni-directional Hudi/Iceberg/Delta table-format metadata
converter) re-expressed Spark-first:

- canonical IR = Spark ``StructType`` + lightweight dataclasses
  (``onetable_spark.model``), mirroring the reference's
  ``io.onetable.model.*`` value classes;
- file inventories are **DataFrames**, never driver lists — every
  relational verb the reference hand-rolls over Java collections
  (anti-join diffs, group-bys, min/max aggregation, sorted merges)
  is a Catalyst-optimized DataFrame op (``onetable_spark.operators``);
- format commit planes (Delta ``_delta_log``, Hudi ``.hoodie`` timeline,
  Iceberg metadata) are implemented natively from their public specs
  (``onetable_spark.sources`` / ``onetable_spark.sinks``), since this
  environment ships no delta-spark/iceberg/hudi runtimes;
- beyond the reference: LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) designed shuffle-conscious
  for 100 TB scale (``onetable_spark.functions``).
"""

__version__ = "0.1.0"
