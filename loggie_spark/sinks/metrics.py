"""Per-sink metric aggregation — loggie's `metric` interceptor contract.

The reference's metric interceptor posts per-(pipeline, source)
success/fail event counts after each sink consume
(pkg/interceptor/metric/interceptor.go:78-112); the eventbus sink
listener accumulates them and derives qps per export period
(pkg/eventbus/listener/sink/listener.go:59-118).

Batch equivalent: one map-side-combinable groupBy over the routed
frame. Partial aggregation means no full shuffle of the data — only
the tiny (pipeline, source, sink) key space moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from loggie_spark.sinks.router import FAILED_COL, SINK_COL


def sink_metrics(
    routed: DataFrame,
    pipeline_name: str,
    source_col: str = "source",
    failed_col: str | None = FAILED_COL,
) -> DataFrame:
    """(pipeline, source, sink, success_count, fail_count) —
    FIXTURES.md §F4 metrics contract, exact counts."""
    failed = (
        F.col(failed_col).cast("boolean")
        if failed_col and failed_col in routed.columns
        else F.lit(False)
    )
    return (
        routed.groupBy(
            F.lit(pipeline_name).alias("pipeline"),
            F.col(source_col).alias("source"),
            F.col(SINK_COL).alias(SINK_COL),
        )
        .agg(
            F.sum(F.when(~failed, 1).otherwise(0)).alias("success_count"),
            F.sum(F.when(failed, 1).otherwise(0)).alias("fail_count"),
        )
    )
