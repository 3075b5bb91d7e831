"""logAlert interceptor → alert-table operator
(pkg/interceptor/logalert/alerting.go:200-346).

Reference semantics:
* simple matchers: ``contains`` substrings, ``regexp`` patterns over a
  target field (default body), ``ignore`` patterns that veto a match
* advanced rules: regex with named groups + per-group ops
  (eq/gt/lt, condition registry at logalert/condition/conditions.go:21-32),
  combined with matchType all/any
* ``additions`` copied onto the alert; optional drop-unmatched
* no-data alert: a ticker fires when no events arrive in a window —
  in batch, a count==0 check per (source, window)

Everything compiles to one filter + projection; the alert "sink" is
just a routed table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loggie_spark.fieldpath import col_for_path


@dataclass
class AdvancedRule:
    """One advanced group rule: extract named groups via ``pattern``,
    then apply (group, op, value) checks. op ∈ {eq, gt, lt}."""

    pattern: str
    checks: list[tuple[str, str, str]] = field(default_factory=list)
    match_type: str = "all"  # all | any

    def to_column(self, target: Column) -> Column:
        from loggie_spark.patterns import named_groups, normalize_named_groups

        groups = named_groups(self.pattern)
        jpat = normalize_named_groups(self.pattern).replace("(?P<", "(?<")
        conds: list[Column] = []
        for gname, op, value in self.checks:
            if gname not in groups:
                raise KeyError(f"rule references unknown group {gname!r}")
            val = F.regexp_extract(target, jpat, groups[gname])
            if op == "eq":
                conds.append(val == value)
            elif op == "gt":
                conds.append(val.try_cast("double") > float(value))
            elif op == "lt":
                conds.append(val.try_cast("double") < float(value))
            else:
                raise KeyError(f"unknown op {op!r} (eq/gt/lt)")
        if not conds:
            return target.rlike(jpat)
        out = conds[0]
        for c in conds[1:]:
            out = (out & c) if self.match_type == "all" else (out | c)
        return target.rlike(jpat) & out


@dataclass
class LogAlertConfig:
    target: str = "body"
    contains: list[str] = field(default_factory=list)
    regexps: list[str] = field(default_factory=list)
    ignore: list[str] = field(default_factory=list)
    advanced: list[AdvancedRule] = field(default_factory=list)
    additions: dict[str, str] = field(default_factory=dict)


def match_condition(cfg: LogAlertConfig) -> Column:
    target = col_for_path(cfg.target).cast("string")
    conds: list[Column] = []
    conds += [target.contains(s) for s in cfg.contains]
    conds += [target.rlike(r) for r in cfg.regexps]
    conds += [rule.to_column(target) for rule in cfg.advanced]
    if not conds:
        matched = F.lit(False)
    else:
        matched = conds[0]
        for c in conds[1:]:
            matched = matched | c
    for ig in cfg.ignore:
        matched = matched & ~target.rlike(ig)
    return F.coalesce(matched, F.lit(False))


def alerts(df: DataFrame, cfg: LogAlertConfig) -> DataFrame:
    """Matching rows, with configured additions attached."""
    out = df.filter(match_condition(cfg))
    for k, v in cfg.additions.items():
        out = out.withColumn(k, F.lit(v))
    return out


def no_data_alerts(
    df: DataFrame,
    time_col: str,
    window: str = "10 minutes",
    group_col: str = "source",
) -> DataFrame:
    """(window, group) pairs that received zero events, given the set
    of groups that appear anywhere in the frame — the batch analog of
    the reference's no-data ticker."""
    windows = df.select(F.window(F.col(time_col), window).alias("window")).distinct()
    groups = df.select(group_col).distinct()
    expected = windows.crossJoin(F.broadcast(groups))
    actual = (
        df.groupBy(F.window(F.col(time_col), window).alias("window"), F.col(group_col))
        .count()
    )
    return (
        expected.join(actual, ["window", group_col], "left_anti")
        .withColumn("alert", F.lit("no_data"))
    )
