"""Streaming: history sink parity + watermarked windowed aggregates driven
through a real Structured Streaming query (file source → memory sink)."""

import datetime
import json

import pytest
from pyspark.sql import functions as F, types as T

from nlp_to_nosql_spark.streaming import (
    append_history,
    history_aggregates,
    windowed_event_counts,
)
from nlp_to_nosql_spark.streaming.history import stream_events_from_dir

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_history_append_and_aggregates(spark, tmp_path):
    path = str(tmp_path / "history")
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    append_history(
        spark,
        [
            {"timestamp": t0, "query": "q1", "db": "d", "collection": "c",
             "success": True, "error": None, "execution_time": 1.5, "result_count": 10},
            {"timestamp": t0, "query": "q2", "db": "d", "collection": "c",
             "success": False, "error": "boom", "execution_time": 0.5, "result_count": None},
        ],
        path,
    )
    append_history(
        spark,
        [{"timestamp": t0, "query": "q3", "db": "d", "collection": "c",
          "success": True, "error": None, "execution_time": 1.0, "result_count": 3}],
        path,
    )
    hist = spark.read.parquet(path)
    assert hist.count() == 3  # appends accumulate (S7)
    agg = history_aggregates(hist).first()
    assert agg["total_queries"] == 3
    assert abs(agg["success_rate_pct"] - 200 / 3) < 1e-3
    assert abs(agg["avg_execution_time"] - 1.0) < 1e-9


def test_windowed_counts_batch(spark):
    rows = [
        (1, datetime.datetime(2024, 1, 1, 10, 5), "click", 1.0),
        (2, datetime.datetime(2024, 1, 1, 10, 55), "click", 2.0),
        (3, datetime.datetime(2024, 1, 1, 11, 5), "view", 3.0),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = {
        (r["window_start"].hour, r["event_type"]): r["n_events"]
        for r in windowed_event_counts(df).collect()
    }
    assert out == {(10, "click"): 2, (11, "view"): 1}


def test_streaming_end_to_end(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()

    def write_batch(name, events):
        with open(src / name, "w") as f:
            for e in events:
                f.write(json.dumps(e) + "\n")

    write_batch(
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T10:05:00", "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T10:20:00", "event_type": "click", "value": 2.0},
        ],
    )

    stream = stream_events_from_dir(spark, str(src), EVENT_SCHEMA)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, window="1 hour", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        # feed a second micro-batch
        write_batch(
            "b2.json",
            [{"event_id": 3, "ts": "2024-01-01T10:45:00", "event_type": "click", "value": 3.0}],
        )
        q.processAllAvailable()
        rows = spark.sql("select * from win_counts").collect()
        by_key = {(r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_value"]) for r in rows}
        assert by_key[(10, "click")] == (3, 6.0)
    finally:
        q.stop()
