"""The documented-but-unshipped `aggregator` interceptor
(/root/reference/README.md:136-147): interval-windowed ``select`` with
operators COUNT / COUNT-DISTINCT / SUM / AVG / MAX / MIN over
``groupBy`` keys, plus derived ``calculate: ${a}/${b}`` projections.

Implemented as one map-side-combinable groupBy — the partial aggregate
runs before the shuffle, so only (groups × metrics) rows move. The
``interval`` becomes an optional event-time window column (batch
equivalent of the wall-clock flush)."""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {
    "COUNT": lambda c: F.count(F.lit(1)),
    "COUNT-DISTINCT": F.countDistinct,
    "SUM": F.sum,
    "AVG": F.avg,
    "MAX": F.max,
    "MIN": F.min,
}

_CALC_REF = re.compile(r"\$\{(\w+)\}")


def _compile_calculate(expr: str) -> Column:
    """``${a}/${b}`` (also +, -, *) over already-aggregated aliases."""
    tokens = _CALC_REF.sub(r"`\1`", expr)
    return F.expr(tokens)


def aggregate(
    df: DataFrame,
    group_by: list[str],
    select: list[tuple[str, str, str]],
    calculate: list[tuple[str, str]] | None = None,
    window: tuple[str, str] | None = None,
    round_to: int | None = None,
    approx_distinct_rsd: float | None = None,
) -> DataFrame:
    """Run the aggregator program.

    select: (operator, field, alias) triples.
    calculate: (alias, "${a}/${b}") derived projections.
    window: (time_col, duration) — event-time tumbling window standing
    in for the wall-clock ``interval``.
    round_to: round float aggregates on both engine and oracle side.
    approx_distinct_rsd: when set, COUNT-DISTINCT runs as
    HyperLogLog++ (``approx_count_distinct``) with that relative
    error — the 100 TB path: exact distinct keeps every key in the
    aggregation hash map and spills, HLL is a fixed few-KB sketch per
    group that partial-aggregates map-side like everything else.
    Leave None (exact) for tests/oracles.
    """
    keys: list[Column] = [F.col(k) for k in group_by]
    if window is not None:
        time_col, duration = window
        keys = [F.window(F.col(time_col), duration).alias("window")] + keys

    aggs = []
    float_ops = {"SUM", "AVG", "MAX", "MIN"}
    float_aliases = []
    for op, fld, alias in select:
        if op not in _OPS:
            raise KeyError(f"unknown aggregator operator: {op}")
        if op == "COUNT-DISTINCT" and approx_distinct_rsd is not None:
            aggs.append(F.approx_count_distinct(fld, approx_distinct_rsd).alias(alias))
        else:
            aggs.append(_OPS[op](fld).alias(alias))
        if op in float_ops:
            float_aliases.append(alias)

    out = df.groupBy(*keys).agg(*aggs)
    # Derived projections run on UNROUNDED aggregates (rounding first
    # would compound error vs a plain-SQL oracle); everything float is
    # rounded once, at the end.
    for alias, expr in calculate or []:
        out = out.withColumn(alias, _compile_calculate(expr))
        float_aliases.append(alias)
    if round_to is not None:
        for alias in float_aliases:
            out = out.withColumn(alias, F.round(F.col(alias), round_to))
    return out
