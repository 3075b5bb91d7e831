"""Source layer — scans and source-side codecs.

In batch Spark the "file source" IS the table scan: glob watching,
offset checkpointing and multiline merging (pkg/source/file/, ~4k LoC)
collapse into ``spark.read`` + the checkpoint manifest. What survives
as real code:

* addonMeta (source.go:258-312): filename/offset/hostname columns
* the ``dev`` synthetic source (dev/source.go:83-99) → datagen-backed
* source codecs json/regex (pkg/source/codec/) → body decoding before
  the interceptor chain
"""

from __future__ import annotations

import socket

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(
    spark: SparkSession,
    path: str | list[str],
    fmt: str = "parquet",
    include: list[str] | None = None,
    glob: str | None = None,
    exclude: str | None = None,
    ignore_older: str | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Scan with explicit column pruning (``include``) so the parquet
    reader never materializes unused columns.

    file-source collect options (pkg/source/file/config.go paths /
    excludeFiles / ignoreOlder) map onto scan-level features:

    * ``glob``         → ``pathGlobFilter`` (include glob, applied at
      file listing — a driver-side prune, no data touched)
    * ``exclude``      → regex on the file path, filtered via
      ``input_file_name()`` (excludeFiles semantics; listing-level
      excludes beyond one glob need an external catalog)
    * ``ignore_older`` → ``modifiedAfter`` (ISO-8601 timestamp): files
      older than the cutoff never enter the listing, exactly like the
      reference skipping stale files at discovery time
    """
    reader = spark.read.format(fmt)
    if schema:
        # required when the filters can exclude every file (schema
        # inference needs at least one survivor)
        reader = reader.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if ignore_older:
        reader = reader.option("modifiedAfter", ignore_older)
    paths = path if isinstance(path, list) else [path]
    df = reader.load(paths)
    if exclude:
        import re as _re

        _re.compile(exclude)  # fail fast on a bad pattern, like the reference
        df = df.filter(~F.input_file_name().rlike(exclude))
    return df.select(*include) if include else df


def with_addon_meta(df: DataFrame, add_hostname: bool = True) -> DataFrame:
    """file-source addonMeta: source filename + in-file position +
    collecting host (source.go:258-312). ``offset`` here is a stable
    per-file ordinal, not a byte offset (rows are already records)."""
    out = df.withColumn("filename", F.input_file_name()).withColumn(
        "offset", F.monotonically_increasing_id()
    )
    if add_hostname:
        out = out.withColumn("hostname", F.lit(socket.gethostname()))
    return out


def dev_source(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """The dev synthetic source: deterministic generated events
    (qps/byteSize/eventsTotal ≙ row count + line shapes)."""
    from loggie_spark.datagen import generate_sequences

    return generate_sequences(spark, n, partitions=partitions)


def decode_json_codec(
    df: DataFrame,
    body_col: str = "body",
    fields: list[str] | None = None,
    schema: str | None = None,
    body_field: str | None = None,
    prune: bool = True,
) -> DataFrame:
    """Source codec ``json`` (codec/json/json.go:28-37,61): decode the
    body as JSON, lift ``fields`` (or a typed ``schema``); with
    ``body_field`` the named field REPLACES the body (bodyFields), and
    ``prune`` drops the original JSON."""
    src = F.col(body_col).cast("string")
    if schema:
        parsed = F.from_json(src, schema)
        import pyspark.sql.types as T

        names = [f.name for f in T._parse_datatype_string(schema).fields]
        for n in names:
            df = df.withColumn(n, parsed.getField(n))
    else:
        parsed = F.from_json(src, "map<string,string>")
        for n in fields or []:
            df = df.withColumn(n, parsed.getItem(n))
    if body_field:
        df = df.withColumn(body_col, F.col(body_field))
    elif not prune:
        pass
    return df


def decode_regex_codec(
    df: DataFrame, pattern: str, body_col: str = "body", body_field: str | None = None
) -> DataFrame:
    """Source codec ``regex`` (codec/regex/regex.go:12-24,56): named
    groups from the body → columns; optional bodyFields lift."""
    from loggie_spark.actions import apply_program

    out = apply_program(df, [{"action": f"regex({body_col})", "pattern": pattern}]).finish()
    if body_field:
        out = out.withColumn(body_col, F.col(body_field))
    return out
