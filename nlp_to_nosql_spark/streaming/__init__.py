"""Structured Streaming operators (SURVEY §2.1 S7 history sink + windowed
aggregates with watermarks for the event stream)."""

from nlp_to_nosql_spark.streaming.history import (
    HISTORY_SCHEMA,
    append_history,
    history_aggregates,
    windowed_event_counts,
)
from nlp_to_nosql_spark.streaming.replay import (
    replay_sessionize,
    replay_windowed_counts,
)

__all__ = [
    "HISTORY_SCHEMA",
    "append_history",
    "history_aggregates",
    "windowed_event_counts",
    "replay_sessionize",
    "replay_windowed_counts",
]
