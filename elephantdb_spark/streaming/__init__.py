from elephantdb_spark.streaming.updater import stream_build, sync_domain
from elephantdb_spark.streaming.stateful import running_totals

__all__ = ["stream_build", "sync_domain", "running_totals"]
