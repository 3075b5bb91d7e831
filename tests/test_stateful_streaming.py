"""applyInPandasWithState operators: liveness monitor emits active
rows per batch; sessionization emits one row per expired session."""

from __future__ import annotations

import time

import pyspark.sql.functions as F


def test_no_data_monitor_active_counts(spark, tmp_path):
    from loggie_spark.streaming.stateful import no_data_monitor

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [("a",), ("a",), ("b",)], "source string"
    ).write.parquet(src)
    stream = spark.readStream.schema("source string").parquet(src)
    out = no_data_monitor(stream, "source", timeout_ms=5_000)
    q = (
        out.writeStream.format("memory")
        .queryName("live1")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM live1").collect()
    # availableNow may run extra empty batches after the data batch, so
    # timeout (no_data) rows can legitimately follow the active ones.
    active = {r.key: r.events_seen for r in rows if r.status == "active"}
    assert active == {"a": 2, "b": 1}


def test_session_stats_emits_on_expiry(spark, tmp_path):
    from loggie_spark.streaming.stateful import session_stats

    src = str(tmp_path / "in2")
    rows = [
        ("u1", "2024-03-01 10:00:00"),
        ("u1", "2024-03-01 10:00:10"),
        ("u2", "2024-03-01 10:00:05"),
        # late batch far in the future advances the watermark past the gap
        ("u3", "2024-03-01 11:00:00"),
    ]
    df = spark.createDataFrame(rows, "k string, t string").withColumn(
        "event_time", F.col("t").cast("timestamp")
    )
    df.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = session_stats(stream, "k", "event_time", gap="30 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sess1")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.key: r.n_events for r in spark.sql("SELECT * FROM sess1").collect()}
    # u1/u2 sessions expire once the watermark (driven by u3's 11:00
    # event) passes their last-event + gap.
    assert got.get("u1") == 2
    assert got.get("u2") == 1
