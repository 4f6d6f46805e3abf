from elephantdb_spark.streaming.updater import Updater, launch_updater, stream_build, sync_domain
from elephantdb_spark.streaming.stateful import running_totals
from elephantdb_spark.streaming.dedup import dedup_stream, dedup_stream_forever

__all__ = [
    "Updater",
    "launch_updater",
    "stream_build",
    "sync_domain",
    "running_totals",
    "dedup_stream",
    "dedup_stream_forever",
]
