from loggie_spark.streaming.pipeline import (
    stream_metrics,
    stream_pipeline,
    streaming_dedup,
)

__all__ = ["stream_pipeline", "stream_metrics", "streaming_dedup"]
