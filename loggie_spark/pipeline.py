"""The pipeline orchestrator: scan → parse → enrich → route → write →
metrics, resumable via the checkpoint manifest.

One loggie pipeline (sources → interceptor chain → queue → sink,
pkg/pipeline/pipeline.go:242-270) compiles to ONE declarative DataFrame
program and at most two jobs: the routed write and the (tiny) metrics
aggregate. There is no per-event loop anywhere — per-source interceptor
scoping (``belongTo``, pkg/core/interceptor/extension.go:23-35) becomes
a column gate ``source == name``, and the whole action program runs
inside whole-stage codegen.

Scale design (100 TB / 1000 executors):
* the only wide operations are the final write's repartition (salted,
  bounded by route-key cardinality) and the metrics groupBy (map-side
  combined, key space = pipelines × sources × sinks);
* parse/enrich/route are narrow — filters and projections the optimizer
  pushes into the scan;
* skewed heavy-hitter sources are defused by salting the write
  repartition with ``pmod(xxhash64(doc_id), salt)``;
* resume prunes completed buckets at the scan (checkpoint.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from loggie_spark.actions import DROPPED, RETURNED, _apply_steps, _Ctx
from loggie_spark.checkpoint import BUCKET_COL, Manifest, incomplete_only, with_bucket
from loggie_spark.enrich import add_static_fields, broadcast_enrich
from loggie_spark.functions.tokens import decode_tokens_utf8
from loggie_spark.sinks.metrics import sink_metrics
from loggie_spark.sinks.router import (
    FAILED_COL,
    ROUTE_COL,
    SINK_COL,
    SinkSpec,
    explode_to_sinks,
)


@dataclass
class SourceSpec:
    """One named source: its parse program + static enrichment
    (fillEventMetaAndHeader semantics, pipeline.go:1054-1123)."""

    name: str
    program: list[dict] = field(default_factory=list)
    fields: dict[str, object] = field(default_factory=dict)


@dataclass
class PipelineConfig:
    name: str
    sources: list[SourceSpec]
    sinks: list[SinkSpec]
    lookup: DataFrame | None = None  # addK8sMeta-style broadcast dim
    lookup_keys: list[str] = field(default_factory=list)
    n_buckets: int = 64  # checkpoint/work units; ~4096 at 100 TB
    salt: int = 8  # write-skew salt for heavy-hitter routes
    source_col: str = "source"
    decode_tokens: bool = True  # tokens:array<int32> → body:string
    time_col_name: str | None = None  # deterministic ${+...}; None = now()


class Pipeline:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    # -- logical plan -------------------------------------------------------

    def transform(self, df: DataFrame) -> DataFrame:
        """Build the full parse → enrich → route logical plan (no
        action). Returns the routed frame with sink/route_key columns,
        program-dropped rows removed, render-failures flagged."""
        cfg = self.cfg
        if cfg.decode_tokens and "tokens" in df.columns and "body" not in df.columns:
            # Arrow-native buffer-reuse decode (functions/tokens.py) —
            # the vectorized scale path; the pandas UDF remains as the
            # general fallback for pathological inputs.
            from loggie_spark.functions.tokens import decode_tokens_arrow

            df = decode_tokens_arrow(df, "tokens", "body")

        time_col = F.col(cfg.time_col_name) if cfg.time_col_name else None

        # Per-source action programs, gated by source name (belongTo).
        df = df.withColumn(DROPPED, F.lit(False)).withColumn(RETURNED, F.lit(False))
        ctx = _Ctx(
            df=df,
            gate=~F.col(DROPPED) & ~F.col(RETURNED),
            gate_is_total=True,
            time_col=time_col,
        )
        multi = len(cfg.sources) > 1
        for src in cfg.sources:
            gate = (F.col(cfg.source_col) == src.name) if multi else None
            if multi:
                ctx.program_has_control = True
            _apply_steps(ctx, src.program, extra_gate=gate)
        out = ctx.df.filter(~F.col(DROPPED)).drop(DROPPED, RETURNED)

        # Static per-source constants → one broadcast dim join when any
        # source declares fields (constant-folded when single-source).
        const_fields = {s.name: s.fields for s in cfg.sources if s.fields}
        if const_fields:
            if not multi:
                out = add_static_fields(out, next(iter(const_fields.values())))
            else:
                spark = out.sparkSession
                keys = sorted({k for f in const_fields.values() for k in f})
                rows = [
                    tuple([name] + [str(f.get(k, "")) for k in keys])
                    for name, f in const_fields.items()
                ]
                schema = ", ".join(
                    [f"{cfg.source_col} string"] + [f"{k} string" for k in keys]
                )
                dim = spark.createDataFrame(rows, schema)
                out = broadcast_enrich(out, dim, [cfg.source_col])

        # Lookup enrichment (addK8sMeta-shaped broadcast join).
        if cfg.lookup is not None:
            out = broadcast_enrich(out, cfg.lookup, cfg.lookup_keys)

        # Routed fan-out.
        out = explode_to_sinks(out, cfg.sinks, time_col=time_col)
        # 'fail'-policy render failures are quarantined, not lost —
        # they land under route_key=__failed__ and count as fail_count.
        out = out.withColumn(
            ROUTE_COL,
            F.when(F.col(FAILED_COL), F.lit("__failed__")).otherwise(F.col(ROUTE_COL)),
        )
        return out

    # -- physical run -------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        df: DataFrame,
        out_dir: str,
        run_id: str,
        manifest_dir: str | None = None,
        key: str = "doc_id",
    ) -> DataFrame:
        """Execute resumably; returns the exact per-sink metrics frame.

        Crash-safe: buckets are re-written with dynamic partition
        overwrite, so partially-written buckets heal on resume and
        per-sink counts stay exactly-once (FIXTURES §F4 invariant).
        """
        cfg = self.cfg
        manifest = Manifest(manifest_dir or f"{out_dir}/_manifest")

        bucketed = with_bucket(df, cfg.n_buckets, key=key)
        todo = incomplete_only(bucketed, spark, manifest, run_id)

        in_counts = todo.groupBy(F.col(BUCKET_COL).alias("bucket")).agg(
            F.count(F.lit(1)).alias("rows_in")
        ).collect()
        if not in_counts:
            # Nothing to do (empty input or fully-resumed run).
            return self._final_metrics(spark, out_dir)

        routed = self.transform(todo)

        # Salted repartition: heavy-hitter (sink, route) pairs spread
        # over `salt` writer tasks each; AQE coalesces small ones.
        routed = routed.repartition(
            F.col(BUCKET_COL),
            F.col(SINK_COL),
            F.col(ROUTE_COL),
            F.pmod(F.xxhash64(F.col(key)), F.lit(cfg.salt)),
        )

        (
            routed.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL, SINK_COL, ROUTE_COL)
            .parquet(out_dir)
        )

        # Lineage counters — computed per bucket from input & output.
        rows_in = spark.createDataFrame(in_counts, "bucket int, rows_in long")
        written = spark.read.parquet(out_dir).filter(
            F.col(BUCKET_COL).isin([r.bucket for r in in_counts])
        )
        rows_out = written.groupBy(F.col(BUCKET_COL).alias("bucket")).agg(
            F.count(F.lit(1)).alias("rows_out")
        )
        stats = (
            rows_in.join(rows_out, "bucket", "left")
            .select(
                F.lit(run_id).alias("run_id"),
                F.col("bucket").cast("int"),
                F.lit(cfg.name).alias("source"),
                F.col("rows_in"),
                F.coalesce(F.col("rows_out"), F.lit(0)).alias("rows_out"),
                F.lit("done").alias("status"),
            )
        )
        manifest.record_done(stats)
        return self._final_metrics(spark, out_dir)

    def _final_metrics(self, spark: SparkSession, out_dir: str) -> DataFrame:
        """Exact per-(pipeline, source, sink) counts from the FINAL
        routed table — idempotent across resume; empty frame when
        nothing has ever been written."""
        import os

        cfg = self.cfg
        has_data = os.path.isdir(out_dir) and any(
            name.startswith(SINK_COL + "=") or name.startswith(BUCKET_COL + "=")
            for name in os.listdir(out_dir)
        )
        if not has_data:
            return spark.createDataFrame(
                [],
                "pipeline string, source string, sink string, "
                "success_count long, fail_count long",
            )
        final = spark.read.parquet(out_dir)
        return sink_metrics(final, cfg.name, source_col=cfg.source_col)
