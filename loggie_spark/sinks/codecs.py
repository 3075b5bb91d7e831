"""Sink codecs — how routed rows serialize at the sink boundary.

* ``json`` codec (pkg/sink/codec/json/json.go:63-108): header fields
  (+ body under ``body``) → one JSON string; ``beatsFormat`` renames to
  ``@timestamp`` + ``message``; ``pretty`` is a no-op at scale.
* ``raw`` codec (pkg/sink/codec/raw/raw.go:49-54): body bytes only.

These are projections — appended to the routed frame right before the
write, they stay inside codegen and cost one to_json per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INTERNAL = {"_bucket", "_route_failed", "_pkey", "_doc_id"}


def json_codec(
    df: DataFrame,
    body_col: str = "body",
    time_col: str | None = None,
    beats_format: bool = False,
    include: list[str] | None = None,
    out_col: str = "payload",
) -> DataFrame:
    """Serialize each row to a JSON payload column.

    ``include`` limits the serialized fields (default: every
    non-internal column except tokens). beatsFormat emits
    ``@timestamp`` (event time) and ``message`` (the body), matching
    the reference's filebeat-compatible shape.
    """
    cols = include or [
        c for c in df.columns if c not in _INTERNAL and c not in ("tokens", out_col)
    ]
    fields: list[Column] = []
    for c in cols:
        if beats_format and c == body_col:
            fields.append(F.col(c).alias("message"))
        else:
            fields.append(F.col(c))
    if beats_format:
        t = F.col(time_col) if time_col else F.current_timestamp()
        fields.append(
            F.date_format(t, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("@timestamp")
        )
    return df.withColumn(out_col, F.to_json(F.struct(*fields)))


def raw_codec(df: DataFrame, body_col: str = "body", out_col: str = "payload") -> DataFrame:
    """Body-only payload (raw.go:49-54)."""
    return df.withColumn(out_col, F.col(body_col).cast("string"))
