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


def asof_join(
    events: DataFrame,
    dim: DataFrame,
    key: str,
    ts: str = "ts",
    dim_ts: str = "ts",
    dim_cols: list[str] | None = None,
    strict: bool = False,
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

    Ties: at ``ts == dim_ts`` the dimension row sorts BEFORE the event
    (≤ semantics) unless ``strict``; duplicate (key, dim_ts) dimension
    rows are resolved deterministically by last-in-sort of the struct
    of dim values. Events with no earlier dimension row keep NULLs
    (left-join semantics).
    """
    if dim_cols is None:
        dim_cols = [c for c in dim.columns if c not in (key, dim_ts)]
    clash = sorted(set(dim_cols) & set(events.columns))
    if clash:  # would emit duplicate column names in the result
        raise ValueError(
            f"asof_join: dimension columns {clash} collide with event "
            "columns — rename one side or pass dim_cols explicitly"
        )
    e_cols = [c for c in events.columns]
    tag = "_is_event"
    e = events.select(
        *e_cols,
        F.lit(1).alias(tag),
        *[F.lit(None).cast(dim.schema[c].dataType).alias(f"_d_{c}") for c in dim_cols],
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
        *[F.col(c).alias(f"_d_{c}") for c in dim_cols],
    ).select(*e_cols, tag, *[f"_d_{c}" for c in dim_cols])
    u = e.unionByName(d)
    # dim rows first at equal timestamps for <= semantics; events first
    # for strict <. The tag doubles as the tiebreak column.
    order = [F.col(ts), F.col(tag)] if not strict else [F.col(ts), -F.col(tag)]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumns(
        {f"_d_{c}": F.last(f"_d_{c}", ignorenulls=True).over(w) for c in dim_cols}
    )
    return filled.filter(F.col(tag) == 1).select(
        *e_cols, *[F.col(f"_d_{c}").alias(c) for c in dim_cols]
    )


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
