from onetable_spark.sync.client import (
    SyncClient,
    SyncConfig,
    register_source,
    register_target,
    registered_formats,
    source_for,
    target_for,
)

__all__ = [
    "SyncClient",
    "SyncConfig",
    "register_source",
    "register_target",
    "registered_formats",
    "source_for",
    "target_for",
]
