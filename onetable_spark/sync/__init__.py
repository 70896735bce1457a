from onetable_spark.sync.client import SyncClient, SyncConfig, source_for, target_for

__all__ = ["SyncClient", "SyncConfig", "source_for", "target_for"]
