"""Gap-based sessionization over an event stream — the classic
log-analytics rollup a telemetry pipeline feeds (the reference moves
the events; this derives the sessions downstream systems want).

100 TB shape: sessionization is inherently a per-key ordered pass, so
the ONE unavoidable shuffle is hash(user) with an in-partition sort —
the same shuffle a bucketed-by-user table layout would amortize to
zero. Everything after (boundary flags, cumulative session index,
per-session rollup) is window/aggregate over that single partitioning;
Catalyst reuses the exchange, so heavy users cost sort time but never
an extra shuffle. Heavy-hitter users cannot be salted (the order
dependence is the semantics); the mitigations at scale are a bounded
session cap upstream and bucketed layout.

The batch face mirrors streaming/stateful.py's session windows (same
gap semantics) — one definition, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign gap-based sessions and roll them up.

    A new session starts at the first event of a user and at every
    event more than ``gap_sec`` after its predecessor. Returns one row
    per session: ``(user_id, session_idx, n_events, start_ts, end_ts,
    duration_sec)`` with ``session_idx`` 0-based per user in time
    order — deterministic given (user, ts) ordering (ties broken by
    event order within equal timestamps don't affect boundaries, since
    a 0-gap never opens a session).
    """
    # TIMESTAMP_NTZ has no direct long cast in Spark 4; route through
    # TIMESTAMP. Epoch values are only ever used in DIFFERENCES here,
    # so the session-timezone offset the cast introduces cancels.
    def secs(c):
        return c.cast("timestamp").cast("long")

    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_sess = (
        prev.isNull() | (secs(F.col(ts_col)) - secs(prev) > gap_sec)
    ).cast("int")
    with_idx = events.select(user_col, ts_col).withColumn(
        "session_idx",
        (F.sum(new_sess).over(w) - 1).cast("int"),
    )
    return with_idx.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            F.max(ts_col).cast("timestamp").cast("long")
            - F.min(ts_col).cast("timestamp").cast("long")
        )
        .cast("long")
        .alias("duration_sec"),
    )
