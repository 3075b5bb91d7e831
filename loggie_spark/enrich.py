"""Enrichment stage — constants and broadcast-join lookups.

Covers the reference's per-source static field merge
(pkg/pipeline/pipeline.go:1054-1123: ``fields``, ``fieldsUnderKey``,
``fieldsFromEnv``), addHostMeta
(pkg/interceptor/addhostmeta/interceptor.go:91-136), and addK8sMeta's
indexed pod lookup (pkg/interceptor/addk8smeta/interceptor.go:88-121).

addK8sMeta is the one true join in loggie: extract keys from a
pattern-shaped field, look them up in a local index, splice workload
metadata in. Spark-first that is a **broadcast left join** — the
lookup (pods/sources) is tiny relative to the fact table, so no
shuffle of the 100 TB side, ever. ``F.broadcast`` pins the strategy
rather than trusting the threshold.
"""

from __future__ import annotations

import os
import socket

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_static_fields(
    df: DataFrame, fields: dict[str, object], under_key: str | None = None
) -> DataFrame:
    """Per-source constant fields (pipeline.go:1098-1123). With
    ``under_key`` the constants nest in one struct column."""
    if under_key:
        return df.withColumn(
            under_key,
            F.struct(*[F.lit(v).alias(k) for k, v in fields.items()]),
        )
    for k, v in fields.items():
        df = df.withColumn(k, F.lit(v))
    return df


def add_env_fields(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """fieldsFromEnv: header key → env var name (pipeline.go:1013-1033).
    Resolved on the driver at plan time — constants on the cluster."""
    for k, env_name in mapping.items():
        df = df.withColumn(k, F.lit(os.environ.get(env_name, "")))
    return df


def add_host_meta(df: DataFrame, target: str = "host") -> DataFrame:
    """addHostMeta: hostname/os/platform computed once, added to every
    event (addhostmeta/interceptor.go:91-136)."""
    import platform

    return df.withColumn(
        target,
        F.struct(
            F.lit(socket.gethostname()).alias("hostname"),
            F.lit(platform.system().lower()).alias("os"),
            F.lit(platform.machine()).alias("arch"),
        ),
    )


def apply_schema_interceptor(
    df: DataFrame,
    pipeline_name: str,
    ts_key: str | None = "@timestamp",
    pipeline_key: str | None = "pipeline",
    source_key: str | None = "sourceName",
    source_col: str = "source",
    time_col: str | None = None,
    remap: dict[str, str] | None = None,
) -> DataFrame:
    """The `schema` interceptor (pkg/interceptor/schema/interceptor.go:
    79-96): expose meta (timestamp / pipelineName / sourceName) under
    configured keys, then ``remap`` renames arbitrary columns."""
    if ts_key:
        t = F.col(time_col) if time_col else F.current_timestamp()
        df = df.withColumn(ts_key, F.date_format(t, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
    if pipeline_key:
        df = df.withColumn(pipeline_key, F.lit(pipeline_name))
    if source_key:
        df = df.withColumn(source_key, F.col(source_col))
    for old, new in (remap or {}).items():
        df = df.withColumnRenamed(old, new)
    return df


def broadcast_enrich(
    df: DataFrame,
    lookup: DataFrame,
    keys: list[str],
    how: str = "left",
) -> DataFrame:
    """addK8sMeta-shaped enrichment: broadcast left join on extracted
    keys. The broadcast hint keeps the big side shuffle-free regardless
    of autoBroadcastJoinThreshold estimation."""
    return df.join(F.broadcast(lookup), on=keys, how=how)
