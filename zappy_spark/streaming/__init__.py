from zappy_spark.streaming.jobs import (
    dedup_first,
    enrich_with_static,
    replay_events_dir,
    running_count_stateful,
    session_counts,
    stream_events,
    tumbling_counts,
    tumbling_with_watermark,
)

__all__ = [
    "replay_events_dir",
    "stream_events",
    "tumbling_counts",
    "session_counts",
    "dedup_first",
    "enrich_with_static",
    "tumbling_with_watermark",
    "running_count_stateful",
]
