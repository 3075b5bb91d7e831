"""Temporal join operators Spark's DataFrame API lacks as primitives:
as-of joins (point-in-time lookup) and interval/range joins — both
expressed as compositions of stock operators with scale-safe plans
(no BroadcastNestedLoop, no per-key driver loops).

Reference parity note: the reference engine has no temporal joins (it
moves events); these extend the analytics surface the way the td_*
operators do, covering the two join shapes every telemetry / feature
-store workload eventually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    events: DataFrame,
    dim: DataFrame,
    key: str,
    ts: str = "ts",
    dim_ts: str = "ts",
    dim_cols: list[str] | None = None,
    strict: bool = False,
    bucket_sec: int | None = None,
) -> DataFrame:
    """Point-in-time (as-of) LEFT join: each event row picks up the
    dimension row with the LATEST ``dim_ts`` ≤ its ``ts`` for the same
    ``key`` (strictly < when ``strict=True``) — the lookup a feature
    store / SCD-type-2 enrichment needs, where an ordinary equi-join
    would leak future values.

    Construction (the scalable union trick, not a per-key loop and not
    an inequality join): tag both frames, UNION them, and run ONE
    ``last(ignorenulls)`` window over (key, time) — the dimension
    values "carry forward" onto every later event row. Cost is a
    single hash(key) shuffle with an in-partition sort, identical to
    the shuffle a plain groupBy(key) pays; dimension columns ride the
    shuffle only once per DIM row (events carry nulls), so the width
    cost is O(|dim|), not O(|events|).

    The dimension columns travel as ONE struct column, carried by a
    single ``last(ignorenulls)`` — so a dim row with a legitimately
    NULL column is adopted WHOLE (the NULL included), never stitched
    together with that column's value from an older row. This matches
    true ASOF semantics (DuckDB's ASOF JOIN returns the newer row's
    NULL, not the older row's value).

    Ties: at ``ts == dim_ts`` the dimension row sorts BEFORE the event
    (≤ semantics) unless ``strict``; duplicate (key, dim_ts) dimension
    rows resolve deterministically to the LARGEST dim-value struct
    (the struct is the final window sort key — dim columns must be
    orderable types for this tiebreak). Events with no earlier
    dimension row keep NULLs (left-join semantics).

    Hot-key skew: with ``bucket_sec=None`` one window partition holds a
    key's ENTIRE event+dim history — correct, but a single hot key
    (one device with billions of events) serializes into one task.
    ``bucket_sec=N`` switches to the two-phase bucketed construction:
    (1) per (key, time-bucket) the last dim struct is aggregated
    (map-side combinable), (2) a per-key window over BUCKETS (bounded
    by timespan/N, independent of event count) carries the
    entering-state seed forward, and (3) the final window partitions
    by (key, bucket) — a hot key's history splits across
    timespan/bucket_sec tasks. Identical results; pick ``bucket_sec``
    near the hot key's event inter-arrival × 10⁴ so buckets hold ~10⁴
    rows.
    """
    if dim_cols is None:
        dim_cols = [c for c in dim.columns if c not in (key, dim_ts)]
    clash = sorted(set(dim_cols) & set(events.columns))
    if clash:  # would emit duplicate column names in the result
        raise ValueError(
            f"asof_join: dimension columns {clash} collide with event "
            "columns — rename one side or pass dim_cols explicitly"
        )
    e_cols = list(events.columns)
    d_type = StructType([dim.schema[c] for c in dim_cols])
    d_struct = F.struct(*[F.col(c) for c in dim_cols])
    tag = "_is_event"

    def _unpack(filled: DataFrame) -> DataFrame:
        return filled.filter(F.col(tag) == 1).select(
            *e_cols, *[F.col(f"_d.{c}").alias(c) for c in dim_cols]
        )

    if bucket_sec is None:
        e = events.select(
            *e_cols,
            F.lit(1).alias(tag),
            F.lit(None).cast(d_type).alias("_d"),
        )
        d = dim.select(
            F.col(key),
            F.col(dim_ts).alias(ts),
            *[
                F.lit(None).cast(events.schema[c].dataType).alias(c)
                for c in e_cols
                if c not in (key, ts)
            ],
            F.lit(0).alias(tag),
            d_struct.alias("_d"),
        ).select(*e_cols, tag, "_d")
        u = e.unionByName(d)
        # dim rows first at equal timestamps for <= semantics; events
        # first for strict <. The tag doubles as the tiebreak column;
        # the dim struct is the FINAL key so duplicate (key, dim_ts)
        # dim rows resolve deterministically (last-in-sort = max).
        tag_ord = F.col(tag) if not strict else -F.col(tag)
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts), tag_ord, F.col("_d"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return _unpack(u.withColumn("_d", F.last("_d", ignorenulls=True).over(w)))

    # ---- bucketed (hot-key-safe) construction ----
    sec = F.col(ts).cast("timestamp").cast("long")

    d2 = dim.select(
        F.col(key),
        F.col(dim_ts).alias(ts),
        d_struct.alias("_d"),
    ).withColumn("_ab", F.floor(sec / bucket_sec))
    # (1) last dim state per (key, bucket): max of (ts, struct) orders
    # by time then struct — same tiebreak as the unbucketed window.
    # groupBy is map-side combinable; a hot key's dim rows pre-reduce
    # inside every task before the shuffle.
    per_bucket = d2.groupBy(key, "_ab").agg(
        F.max(F.struct(F.col(ts).alias("_t"), F.col("_d").alias("_d"))).alias(
            "_last"
        )
    )
    ev = events.withColumn("_ab", F.floor(sec / bucket_sec))
    # (2) entering-state seed per bucket that has any row: a per-key
    # window over BUCKETS (one row per distinct bucket — bounded by
    # timespan/bucket_sec, never by event count).
    buckets = (
        ev.select(F.col(key), "_ab")
        .unionByName(d2.select(F.col(key), "_ab"))
        .distinct()
        .join(per_bucket, [key, "_ab"], "left")
    )
    wb = (
        Window.partitionBy(key)
        .orderBy("_ab")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = buckets.select(
        F.col(key),
        F.col("_ab"),
        F.last("_last", ignorenulls=True).over(wb).alias("_prev"),
    ).select(F.col(key), "_ab", F.col("_prev._d").alias("_d"))
    # (3) final carry within each (key, bucket): seed first (its dim
    # row is strictly older than everything in the bucket, so strict
    # vs non-strict is irrelevant for it), then dim/events by the same
    # (ts, tag, struct) order as the unbucketed path.
    e3 = ev.select(
        *e_cols,
        "_ab",
        F.lit(1).alias("_o"),
        F.lit(1).alias(tag),
        F.lit(None).cast(d_type).alias("_d"),
    )
    d3 = d2.select(
        F.col(key),
        F.col(ts),
        *[
            F.lit(None).cast(events.schema[c].dataType).alias(c)
            for c in e_cols
            if c not in (key, ts)
        ],
        "_ab",
        F.lit(1).alias("_o"),
        F.lit(0).alias(tag),
        "_d",
    ).select(*e_cols, "_ab", "_o", tag, "_d")
    s3 = seeds.select(
        F.col(key),
        F.lit(None).cast(events.schema[ts].dataType).alias(ts),
        *[
            F.lit(None).cast(events.schema[c].dataType).alias(c)
            for c in e_cols
            if c not in (key, ts)
        ],
        "_ab",
        F.lit(0).alias("_o"),
        F.lit(-1).alias(tag),
        "_d",
    ).select(*e_cols, "_ab", "_o", tag, "_d")
    u = e3.unionByName(d3).unionByName(s3)
    tag_ord = F.col(tag) if not strict else -F.col(tag)
    w = (
        Window.partitionBy(key, "_ab")
        .orderBy(F.col("_o"), F.col(ts), tag_ord, F.col("_d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _unpack(u.withColumn("_d", F.last("_d", ignorenulls=True).over(w)))


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_sec: int = 3600,
) -> DataFrame:
    """Interval containment join: pair every event with every interval
    where ``start ≤ ts < end`` — maintenance windows, deploy windows,
    incident spans over a telemetry stream.

    Construction: both sides bucket to ``bucket_sec`` grains of the
    timeline (an interval EXPLODES to every grain it covers), the join
    is a plain equi-join on the grain, and the exact containment
    predicate filters after — so the plan is a hash join, never the
    BroadcastNestedLoopJoin a naive inequality join compiles to (the
    registry plan guard forbids it). Candidate volume is
    O(|events| + Σ interval_len/bucket); pick ``bucket_sec`` near the
    typical interval length so each interval explodes to ~2 grains.
    At Iceberg scale the grain column doubles as a partition key and
    the join is partition-local.
    """
    ev = events.withColumn(
        "_g", F.floor(F.col(ts).cast("timestamp").cast("long") / bucket_sec)
    )
    iv = intervals.withColumn(
        "_g",
        F.explode(
            F.sequence(
                F.floor(F.col(start).cast("timestamp").cast("long") / bucket_sec),
                F.floor(F.col(end).cast("timestamp").cast("long") / bucket_sec),
            )
        ),
    )
    return (
        ev.join(iv, "_g")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_g")
    )
