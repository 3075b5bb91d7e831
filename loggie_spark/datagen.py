"""Deterministic synthetic `sequences` table generator (FIXTURES.md §F1/F2).

Schema matches the BASELINE input_hint exactly:

    doc_id: string, tokens: array<int32>, n_tok: int32, source: string

Each row's ``tokens`` are the UTF-8 bytes of a rendered log line whose
shape depends on ``source``:

* ``access``    (60%) — combined access log, the reference's example
  pipeline input (pkg/interceptor/transformer/example/pipeline.yml:2-15)
* ``container`` (25%) — JSON container log (pipeline.yml:18-28)
* ``app``       (10%) — ``ts level msg`` line (pipeline.yml:31-40)
* ``audit``     (5%)  — the grok test fixture line
  (pkg/interceptor/transformer/action/grok_test.go:29-47)

The skewed source distribution (one 60% heavy hitter) exercises the
salted-repartition path. Generation is entirely JVM-side
(``spark.range`` + format/pmod expressions — whole-stage codegen, no
Python), so bench-scale tables (tens of millions of rows) build fast,
and every value is a pure function of the row id (seedless determinism:
the same ``n`` always yields byte-identical tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from loggie_spark.functions.tokens import encode_text_to_tokens_ascii

SOURCES = ("access", "container", "app", "audit")
# Cumulative percentage boundaries for the skewed distribution.
_SRC_EXPR = (
    "CASE WHEN pct < 60 THEN 'access' "
    "WHEN pct < 85 THEN 'container' "
    "WHEN pct < 95 THEN 'app' "
    "ELSE 'audit' END"
)

STATUSES = ("200", "404", "500", "302")
LEVELS = ("DEBUG", "INFO", "WARN", "ERROR")


def _line_exprs(df: DataFrame) -> DataFrame:
    """Render the per-source log line as pure Catalyst expressions."""
    i = F.col("id")
    # Deterministic wall-clock: base 2021-12-13T12:00:00Z + id seconds.
    ts = F.timestamp_seconds(F.lit(1639396800) + i % 86400)
    ip = F.format_string(
        "10.%d.%d.%d", (i % 250).cast("int"), ((i / F.lit(250)).cast("long") % 250).cast("int"), (i % 254 + 1).cast("int")
    )
    status = F.element_at(F.array(*[F.lit(s) for s in STATUSES]), (i % 4 + 1).cast("int"))
    level = F.element_at(F.array(*[F.lit(s) for s in LEVELS]), (i % 4 + 1).cast("int"))
    size = (i % 1000 + 100).cast("string")
    path = F.format_string("/page/%d", (i % 50).cast("int"))

    access_line = F.concat(
        ip,
        F.lit(" - - ["),
        F.date_format(ts, "dd/MMM/yyyy:HH:mm:ss"),
        F.lit(" +0000] \"GET "),
        path,
        F.lit(" HTTP/1.1\" "),
        status,
        F.lit(" "),
        size,
    )
    container_line = F.concat(
        F.lit('{"log":"I0610 08:29:07.698664 Waiting for caches to sync '),
        (i % 1000).cast("string"),
        F.lit('", "stream":"'),
        F.when(i % 2 == 0, F.lit("stdout")).otherwise(F.lit("stderr")),
        F.lit('", "time":"'),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit(".000000000Z\"}"),
    )
    app_line = F.concat(
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit(".545525544Z "),
        level,
        F.lit(" this is log body "),
        (i % 1000).cast("string"),
    )
    uuid = F.format_string(
        "54ce5d87-b94c-c40a-74a7-%012d", (i % 1000000).cast("int")
    )
    audit_line = F.concat(
        F.date_format(ts, "yyyy/MM/dd HH:mm:ss"),
        F.lit(" logTest.go:"),
        (i % 200 + 1).cast("string"),
        F.lit(": "),
        ip,
        F.lit(" /var/log/test.log "),
        uuid,
    )
    return df.withColumn(
        "line",
        F.when(F.col("source") == "access", access_line)
        .when(F.col("source") == "container", container_line)
        .when(F.col("source") == "app", app_line)
        .otherwise(audit_line),
    )


def generate_sequences(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Build the tokenized sequences table: (doc_id, tokens, n_tok, source).

    ``partitions`` controls input parallelism (defaults to
    spark.sql.shuffle.partitions); at cluster scale this would be an
    Iceberg table write partitioned by ``source`` bucket.
    """
    num_parts = partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    df = spark.range(0, n, 1, num_parts)
    df = df.withColumn("pct", (F.col("id") % 100).cast("int"))
    df = df.withColumn("source", F.expr(_SRC_EXPR)).drop("pct")
    df = _line_exprs(df)
    return df.select(
        F.format_string("doc-%012d", F.col("id").cast("int")).alias("doc_id"),
        encode_text_to_tokens_ascii(F.col("line")).cast("array<int>").alias("tokens"),
        F.length("line").cast("int").alias("n_tok"),
        F.col("source"),
    )


def sequences_from_documents(documents: DataFrame) -> DataFrame:
    """Alternative parse-stage input per FIXTURES.md §F5: derive a
    sequences table from the driver's ``documents`` parquet
    (text → UTF-8 tokens). The driver corpus is ASCII, so the JVM
    encoder is lossless here."""
    return documents.select(
        F.format_string("doc-%012d", F.col("doc_id").cast("int")).alias("doc_id"),
        encode_text_to_tokens_ascii(F.col("text")).cast("array<int>").alias("tokens"),
        F.length("text").cast("int").alias("n_tok"),
        F.col("source"),
    )
