from onetable_spark.sync.client import (
    SyncClient,
    SyncConfig,
    register_source,
    register_target,
    registered_formats,
    source_for,
    target_for,
)
from onetable_spark.sync.validation import (
    ALL_CHECKS,
    SyncValidator,
    ValidationCheck,
    ValidationResult,
)

__all__ = [
    "ALL_CHECKS",
    "SyncClient",
    "SyncConfig",
    "SyncValidator",
    "ValidationCheck",
    "ValidationResult",
    "register_source",
    "register_target",
    "registered_formats",
    "source_for",
    "target_for",
]
