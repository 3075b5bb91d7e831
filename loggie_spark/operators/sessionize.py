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


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: how many users performed stage 1,
    then stage 2 strictly AFTER their first stage-1 event, then stage 3
    strictly after that stage-2 event, … — the telemetry rollup behind
    every activation/conversion dashboard. A user counts for stage i+1
    only with an event after their EARLIEST qualifying stage-i time
    (first-touch semantics — deterministic, no path enumeration).

    100 TB shape: per stage one filter (pushed to the scan when
    ``type_col`` is a partition column) + one groupBy(user) min, then a
    user-keyed join with the previous stage's (user, ts) scalars — all
    joins and aggregations share the hash(user) partitioning, so AQE
    plans one Exchange chain with no wide row ever carried. Stage
    frames shrink monotonically (conversion only loses users).

    Returns one row per stage: ``(stage, event_type, users)`` with
    ``stage`` 1-based in funnel order.
    """
    assert stages, "funnel needs at least one stage"
    # Each stage frame is (user, ts) scalars consumed TWICE (the next
    # stage's join + its own count) — per-branch pruning defeats
    # ReuseExchange, so without intervention every stage's scan chain
    # re-executes per consumer (measured 2× the irreducible
    # one-pruned-scan-per-stage). persist() maps every reference onto
    # one InMemoryRelation — computed once within the single output
    # job, no eager extra jobs, evicted LRU; frames are (user, ts)
    # scalars shrinking monotonically down the funnel.
    prev = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
        .persist()
    )
    out_rows = [prev]
    for s in stages[1:]:
        prev = (
            events.filter(F.col(type_col) == s)
            .join(prev.select(user_col, F.col("_t").alias("_pt")), user_col)
            .filter(F.col(ts_col) > F.col("_pt"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
            .persist()
        )
        out_rows.append(prev)
    counts = [
        df.agg(F.count(F.lit(1)).cast("long").alias("users")).select(
            F.lit(i + 1).cast("int").alias("stage"),
            F.lit(stages[i]).alias("event_type"),
            "users",
        )
        for i, df in enumerate(out_rows)
    ]
    result = counts[0]
    for c in counts[1:]:
        result = result.unionByName(c)
    return result


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "day",
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity period,
    counted per period offset — (cohort, offset, users).

    100 TB shape: ONE hash(user) shuffle does all per-user work (first
    period + distinct active periods via one groupBy with min +
    collect_set — the set is calendar-bounded per user, not
    event-bounded), then a scalar explode feeds the tiny
    (cohort, offset) aggregate. An activity row is distinct per
    (user, period) after the set-collapse, so the final count(*) IS
    distinct users — no second distinct pass over the corpus.
    """
    per = F.to_date(F.date_trunc(grain, F.col(ts_col)))
    days = {"day": 1, "week": 7}[grain]
    per_user = (
        events.select(F.col(user_col).alias("u"), per.alias("p"))
        .groupBy("u")
        .agg(F.min("p").alias("cohort"), F.collect_set("p").alias("ps"))
    )
    return (
        per_user.select("cohort", F.explode("ps").alias("p"))
        .select(
            "cohort",
            (F.datediff(F.col("p"), F.col("cohort")) / days)
            .cast("int")
            .alias("offset"),
        )
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
    )


def burst_detect(
    events: DataFrame,
    grain: str = "hour",
    z_threshold: float = 3.0,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Volume-burst detection: flag (event_type, time-bucket) cells
    whose event count sits ``z_threshold`` sample standard deviations
    above that type's mean bucket count — the alerting primitive for
    traffic anomalies (log storms, retry loops, scraper bursts).

    100 TB shape: one groupBy(type, bucket) reduces the corpus to
    scalar counts with map-side partial aggregation; the per-type
    moment aggregate then runs over |types|×|buckets| rows (tiny) and
    joins back by type — broadcast-sized by construction. Cross-engine
    determinism: the moments are EXACT integer sums (count, Σc, Σc²)
    — every float derives from exact longs through one fixed
    expression shape, so Spark and the DuckDB oracle agree bit-for-bit
    (no float accumulation order anywhere). At corpora where a single
    bucket's count² could exceed int64 (~3×10⁹ events per bucket),
    widen the Σc² accumulator to decimal(38,0); counts themselves are
    safe far beyond that.

    Returns ``(event_type, bucket, cnt, mean_cnt, zscore)`` for flagged
    cells; types with fewer than two buckets or zero variance never
    flag (a constant series has no bursts).
    """
    buckets = (
        events.groupBy(
            type_col, F.date_trunc(grain, F.col(ts_col)).alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    stats = buckets.groupBy(type_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("cnt").cast("long").alias("_s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("_s2"),
    )
    n = F.col("_n").cast("double")
    s = F.col("_s").cast("double")
    s2 = F.col("_s2").cast("double")
    mean = s / n
    var = (s2 - s * s / n) / (n - F.lit(1.0))
    joined = buckets.join(F.broadcast(stats), type_col).where(F.col("_n") >= 2)
    z = (F.col("cnt").cast("double") - mean) / F.sqrt(var)
    return (
        joined.where(var > 0)
        .where(z >= F.lit(z_threshold))
        .select(
            type_col,
            "bucket",
            "cnt",
            F.round(mean, 4).alias("mean_cnt"),
            F.round(z, 4).alias("zscore"),
        )
    )
