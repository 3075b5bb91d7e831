"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: the reference example pipeline end-to-end
                 (decode tokens → per-source parse programs → enrich →
                 route fan-out → per-sink metric counts) on sequences
                 derived from sf0.001 documents.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops), keyed like loggie_spark.queries.
oracle_sql()   — DuckDB-equivalent SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF1 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse→enrich→route→aggregate over a tokenized
    sequences table (no filesystem writes — pure transform + metrics)."""
    from loggie_spark.datagen import sequences_from_documents
    from loggie_spark.examples import reference_pipeline
    from loggie_spark.pipeline import Pipeline, PipelineConfig, SinkSpec, SourceSpec
    from loggie_spark.sinks.metrics import sink_metrics

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    seq = sequences_from_documents(docs).withColumn(
        "_ptime", F.lit("2024-03-01 00:00:00").cast("timestamp")
    )
    cfg = PipelineConfig(
        name="flagship",
        sources=[
            SourceSpec(
                "any",
                [
                    {"if": "less(n_tok, 40)", "then": [{"action": "dropEvent()"}]},
                    {
                        "action": "split(body, parts)",
                        "separator": " ",
                        "keys": ["w1"],
                        "max": 1,
                    },
                    {"action": "add(topic, kept)"},
                ],
            )
        ],
        sinks=[
            SinkSpec("kafka", "${topic}"),
            SinkSpec("es", "log-${source}-${+YYYY.MM.dd}"),
        ],
        time_col_name="_ptime",
    )
    routed = Pipeline(cfg).transform(seq)
    return sink_metrics(routed, "flagship").orderBy("pipeline", "source", "sink")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from loggie_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from loggie_spark.queries import ORACLES

    return dict(ORACLES)
