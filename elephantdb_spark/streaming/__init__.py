from elephantdb_spark.streaming.updater import stream_build, sync_domain

__all__ = ["stream_build", "sync_domain"]
