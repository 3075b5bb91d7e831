"""Kafka source connector — loggie's №1 deployment shape
(pkg/source/kafka/kafka.go, pkg/source/kafka/config.go:35-55) mapped
onto Spark's kafka data source.

Config mapping (reference field → Spark reader option):

* ``brokers``            → ``kafka.bootstrap.servers``
* ``topic`` / ``topics`` → ``subscribePattern`` — the reference
  compiles every topic string as a REGEX (config.go:76-90), which is
  exactly Spark's subscribePattern contract; multiple regexes union
  into one alternation.
* ``groupId``            → ``kafka.group.id`` (streaming only)
* ``autoOffsetReset``    → ``startingOffsets`` earliest/latest
* ``maxAcceptedBytes``   → ``kafka.max.partition.fetch.bytes``
* ``clientId``           → ``kafka.client.id``
* worker/queueCapacity/backoff knobs — subsumed by Spark's own task
  scheduling (documented N/A, like loggie's queue tuning).

The wire schema Spark yields is fixed: (key binary, value binary,
topic string, partition int, offset long, timestamp timestamp,
timestampType int, headers array<struct<key string, value binary>>).
:func:`decode_kafka_records` turns that into the pipeline's event
shape: ``body`` from the value bytes plus the reference's addonMeta
header (kafka.go:221-236: offset/partition/timestamp/topic under a
``kafka`` struct, record headers lifted into a map).

The kafka client JAR (spark-sql-kafka) is an external package; this
container has no network, so tests drive :func:`decode_kafka_records`
and the full pipeline over :func:`kafka_records_from_table` — a
file-backed substitute producing the exact wire schema. On a real
cluster ``read_kafka`` is the same plan with the real scan at the
bottom.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int, "
    "headers array<struct<key: string, value: binary>>"
)


@dataclass
class KafkaSourceConfig:
    """pkg/source/kafka/config.go:35-55, spark-relevant subset."""

    brokers: list[str]
    topic: str = ""  # regex, reserved-for-compat spelling
    topics: list[str] = field(default_factory=list)  # regexes
    group_id: str = "loggie"
    client_id: str = ""
    auto_offset_reset: str = "latest"  # earliest | latest
    max_accepted_bytes: int = 1024000
    addon_meta: bool = True
    sasl: dict[str, str] = field(default_factory=dict)  # mechanism/username/password

    def subscribe_pattern(self) -> str:
        pats = [p for p in ([self.topic] + list(self.topics)) if p]
        if not pats:
            raise ValueError("topic or topics is required (config.go:74)")
        return "|".join(f"(?:{p})" for p in pats) if len(pats) > 1 else pats[0]


def read_kafka(
    spark: SparkSession,
    cfg: KafkaSourceConfig,
    streaming: bool = True,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Raw kafka wire frame (batch or streaming). Batch mode reads the
    full earliest→latest range — loggie has no batch kafka mode, so
    this is the backfill analog."""
    reader = spark.readStream if streaming else spark.read
    reader = (
        reader.format("kafka")
        .option("kafka.bootstrap.servers", ",".join(cfg.brokers))
        .option("subscribePattern", cfg.subscribe_pattern())
        .option(
            "startingOffsets",
            "earliest" if cfg.auto_offset_reset == "earliest" else "latest",
        )
        .option("kafka.max.partition.fetch.bytes", str(cfg.max_accepted_bytes))
    )
    if not streaming:
        # Batch reads must span a concrete range.
        reader = reader.option("startingOffsets", "earliest").option(
            "endingOffsets", "latest"
        )
    if streaming and cfg.group_id:
        reader = reader.option("kafka.group.id", cfg.group_id)
    if cfg.client_id:
        reader = reader.option("kafka.client.id", cfg.client_id)
    if max_offsets_per_trigger and streaming:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in cfg.sasl.items():
        reader = reader.option(f"kafka.sasl.{k}", v)
    return reader.load()


def decode_kafka_records(
    df: DataFrame, addon_meta: bool = True, body_col: str = "body"
) -> DataFrame:
    """Wire frame → event frame: ``body`` (value bytes as UTF-8) plus
    the addonMeta header (kafka.go:221-236) — a ``kafka`` struct with
    offset/partition/timestamp(RFC3339)/topic and record headers as a
    ``headers`` map<string,string>. Pure Catalyst projections."""
    out = df.withColumn(body_col, F.col("value").cast("string"))
    if addon_meta:
        out = out.withColumn(
            "kafka",
            F.struct(
                F.col("offset").alias("offset"),
                F.col("partition").alias("partition"),
                F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ssXXX").alias(
                    "timestamp"
                ),
                F.col("topic").alias("topic"),
            ),
        ).withColumn(
            "headers",
            F.map_from_entries(
                F.transform(
                    F.coalesce("headers", F.array()),
                    lambda h: F.struct(
                        h["key"].alias("key"),
                        h["value"].cast("string").alias("value"),
                    ),
                )
            ),
        )
    return out.drop("value", "key", "timestampType") if addon_meta else out.drop(
        "value", "key"
    )


def kafka_records_from_table(
    df: DataFrame,
    body_col: str = "body",
    topic: str | Column = "loggie",
    key_col: str | None = None,
    time_col: str | None = None,
) -> DataFrame:
    """File-backed substitute emitting the EXACT kafka wire schema, for
    integration tests and local runs without the kafka package. The
    offset is a per-partition ordinal like a real consumer would see."""
    topic_col = F.lit(topic) if isinstance(topic, str) else topic
    ts = F.col(time_col) if time_col else F.current_timestamp()
    key = (
        F.col(key_col).cast("string").cast("binary")
        if key_col
        else F.lit(None).cast("binary")
    )
    return df.select(
        key.alias("key"),
        F.col(body_col).cast("string").cast("binary").alias("value"),
        topic_col.cast("string").alias("topic"),
        F.spark_partition_id().alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        ts.alias("timestamp"),
        F.lit(0).alias("timestampType"),
        F.lit(None)
        .cast("array<struct<key: string, value: binary>>")
        .alias("headers"),
    )
