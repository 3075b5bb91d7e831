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

from pyspark.sql import Observation

from loggie_spark.actions import CONTROL_COLS, DROPPED, ERRORED, RETURNED, _apply_steps, _Ctx
from loggie_spark.checkpoint import BUCKET_COL, Manifest, with_bucket
from loggie_spark.enrich import add_static_fields, broadcast_enrich
from loggie_spark.sinks.router import (
    FAILED_COL,
    PKEY_COL,
    ROUTE_COL,
    SINK_COL,
    SinkSpec,
    explode_to_sinks,
)

# Above this many pending buckets the per-bucket rows_in observation is
# skipped (the count_if fan-out would cost O(B) comparisons per row);
# lineage keeps exact per-bucket rows_out + run-level rows_in instead.
OBS_BUCKET_CAP = 1024


FIELDS_FROM_PATH_MAX_BYTES = 1024  # pipeline.go:49 fieldsFromPathMaxBytes
DEFAULT_TS_LAYOUT = "2006-01-02T15:04:05.000Z"  # pipeline.go defaultTsLayout

# The three interceptors every pipeline silently gets unless it
# configures them itself (sysconfig/config.go:58-88 defaultInterceptors,
# verified by test/configuration/pipeline_test.go:89-102).
DEFAULT_INTERCEPTORS: list[dict] = [
    {"type": "metric"},
    {"type": "maxbytes"},
    {"type": "retry"},
]


def merge_interceptor_list(base: list[dict], defaults: list[dict]) -> list[dict]:
    """MergeInterceptorList (core/interceptor/config.go:72-102): a
    configured interceptor of the same type keeps its settings (default
    keys fill gaps); defaults not configured are appended in default
    order."""
    if not base:
        return list(defaults)
    if not defaults:
        return list(base)
    default_by_type = {d["type"]: d for d in defaults}
    merged: list[dict] = []
    seen: set[str] = set()
    for b in base:
        d = default_by_type.get(b["type"])
        merged.append({**d, **b} if d else dict(b))
        seen.add(b["type"])
    for d in defaults:
        if d["type"] not in seen:
            merged.append(dict(d))
    return merged


@dataclass
class SourceSpec:
    """One named source: its parse program + static enrichment
    (fillEventMetaAndHeader semantics, pipeline.go:1054-1123)."""

    name: str
    program: list[dict] = field(default_factory=list)
    fields: dict[str, object] = field(default_factory=dict)
    fields_from_env: dict[str, str] = field(default_factory=dict)  # field → VAR
    fields_from_path: dict[str, str] = field(default_factory=dict)  # field → file
    # fieldsUnderKey nesting (pipeline.go:1098-1123, AddSourceFields;
    # core/source/config.go:35-36). None = under root — NOTE this
    # diverges from the reference default (fieldsUnderRoot=false nests
    # under "fields"); flat root columns are the idiomatic Spark shape
    # and what the routing/oracle surface assumes. Set e.g. "fields"
    # for reference-default nesting.
    fields_under_key: str | None = None
    body_key: str | None = None  # bodyKey remap (pipeline.go:1092-1095)
    timestamp_key: str | None = None  # timestampKey (pipeline.go:1076-1090)
    timestamp_layout: str = ""  # Go layout; "" = defaultTsLayout

    def resolved_fields(self) -> dict[str, object]:
        """Static + env + file fields, resolved once at PLAN time (the
        reference reads env/files once at pipeline init,
        pipeline.go:1006-1052)."""
        import os

        out = dict(self.fields)
        for k, var in self.fields_from_env.items():
            val = os.environ.get(var, "")
            if val:
                out[k] = val
        for k, path in self.fields_from_path.items():
            try:
                with open(path, "rb") as fh:
                    raw = fh.read(FIELDS_FROM_PATH_MAX_BYTES + 1)
            except OSError:
                continue  # pipeline.go:1036: log + skip, never fail
            if len(raw) > FIELDS_FROM_PATH_MAX_BYTES:
                continue  # pipeline.go:1041-1043 size cap
            out[k] = raw.decode("utf-8", "replace").replace("\n", "").replace("\r", "")
        return out


@dataclass
class PipelineConfig:
    name: str
    sources: list[SourceSpec]
    sinks: list[SinkSpec]
    lookup: DataFrame | None = None  # addK8sMeta-style broadcast dim
    lookup_keys: list[str] = field(default_factory=list)
    interceptors: list[dict] = field(default_factory=list)  # pipeline-level
    n_buckets: int = 64  # checkpoint/work units; ~4096 at 100 TB
    salt: int = 8  # write-skew salt for heavy-hitter routes
    source_col: str = "source"
    decode_tokens: bool = True  # tokens:array<int32> → body:string
    # keep the token column through the decode hop: required when the
    # sink writes routed rows (token-array equality invariant); a
    # metrics-only job sets False — Catalyst can't prune through the
    # opaque mapInArrow node, and tokens are ~4x the body's bytes.
    keep_tokens: bool = True
    time_col_name: str | None = None  # deterministic ${+...}; None = now()

    def effective_interceptors(self) -> list[dict]:
        """User-configured + silently-injected defaults
        (sysconfig/config.go:58-88)."""
        return merge_interceptor_list(self.interceptors, DEFAULT_INTERCEPTORS)


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

            df = decode_tokens_arrow(df, "tokens", "body", keep_tokens=cfg.keep_tokens)

        time_col = F.col(cfg.time_col_name) if cfg.time_col_name else None

        # Per-source action programs, gated by source name (belongTo).
        for c in CONTROL_COLS:
            df = df.withColumn(c, F.lit(False))
        ctx = _Ctx(
            df=df,
            gate=~F.col(DROPPED) & ~F.col(RETURNED) & ~F.col(ERRORED),
            gate_is_total=True,
            time_col=time_col,
        )
        multi = len(cfg.sources) > 1
        for src in cfg.sources:
            gate = (F.col(cfg.source_col) == src.name) if multi else None
            if multi:
                ctx.program_has_control = True
            _apply_steps(ctx, src.program, extra_gate=gate)
            self._remap_source_keys(ctx, src, gate, time_col)

        # Pipeline-level interceptors: user-configured merged with the
        # silently-injected defaults (sysconfig/config.go:58-88). metric
        # and retry are structural here — exact per-sink counts and the
        # manifest resume are built into run(); maxbytes and
        # normalize/transformer programs compile into this same pass.
        for icp in self.cfg.effective_interceptors():
            self._apply_interceptor(ctx, icp)

        out = ctx.df.filter(~F.col(DROPPED)).drop(*CONTROL_COLS)

        # Static per-source constants (+ fieldsFromEnv/fieldsFromPath,
        # resolved at plan time) → one broadcast dim join when any
        # source declares fields (constant-folded when single-source).
        const_fields = {
            s.name: s.resolved_fields() for s in cfg.sources if s.resolved_fields()
        }
        under_keys = {
            s.fields_under_key
            for s in cfg.sources
            if s.resolved_fields() and s.fields_under_key
        }
        if len(under_keys) > 1:
            raise ValueError(
                f"sources declare conflicting fields_under_key values: {under_keys}"
            )
        under_key = next(iter(under_keys)) if under_keys else None
        if const_fields:
            if not multi:
                out = add_static_fields(
                    out, next(iter(const_fields.values())), under_key=under_key
                )
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
                if under_key:
                    # Nest the joined field columns into one struct
                    # (fixed schema across sources: a source that never
                    # declares a key carries "" there, mirroring the
                    # dim-join fill above).
                    out = out.withColumn(
                        under_key, F.struct(*[F.col(k) for k in keys])
                    ).drop(*keys)

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

    @staticmethod
    def _remap_source_keys(ctx: _Ctx, src: SourceSpec, gate, time_col) -> None:
        """bodyKey / timestampKey remaps (pipeline.go:1076-1095):
        timestampKey exposes the formatted product time under a header
        key; bodyKey moves the body under a header key and blanks the
        body."""
        if not (src.body_key or src.timestamp_key):
            return
        from loggie_spark.patterns import go_layout_to_jvm

        ctx.gate = (
            (~F.col(DROPPED) & ~F.col(RETURNED) & ~F.col(ERRORED))
            if gate is None
            else (~F.col(DROPPED) & ~F.col(RETURNED) & ~F.col(ERRORED) & gate)
        )
        ctx.gate_is_total = gate is None
        if src.timestamp_key:
            layout = src.timestamp_layout or DEFAULT_TS_LAYOUT
            t = time_col if time_col is not None else F.current_timestamp()
            ctx.set_col(src.timestamp_key, F.date_format(t, go_layout_to_jvm(layout)))
        if src.body_key and "body" in ctx.df.columns:
            ctx.set_col(src.body_key, F.col("body"))
            ctx.set_col("body", F.lit(""))

    @staticmethod
    def _apply_interceptor(ctx: _Ctx, icp: dict) -> None:
        """Compile one pipeline-level interceptor into the pass."""
        typ = icp.get("type")
        if typ in ("metric", "retry"):
            return  # structural: run() computes metrics / manifest resume
        if typ == "maxbytes":
            from loggie_spark.functions.truncate import truncate_utf8_bytes

            target = icp.get("target", "body")
            max_bytes = int(icp.get("maxBytes", 131072))  # maxbytes/config.go:28
            if target in ctx.df.columns:
                ctx.gate = ~F.col(DROPPED) & ~F.col(RETURNED) & ~F.col(ERRORED)
                ctx.gate_is_total = True
                ctx.set_col(target, truncate_utf8_bytes(target, max_bytes))
            return
        if typ in ("normalize", "transformer"):
            from loggie_spark.processors import compile_processors

            program = (
                compile_processors(icp.get("processors", []))
                if typ == "normalize"
                else icp.get("actions", [])
            )
            _apply_steps(ctx, program, extra_gate=None)
            return
        raise KeyError(f"unknown pipeline interceptor type: {typ}")

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

        SINGLE-SCAN: the input is read exactly once — by the routed
        write job. Everything else is accounting on small frames:

        * pending buckets are driver-known (all buckets minus the
          manifest's done set) — no pre-count scan;
        * ``rows_in`` (total + per-bucket up to OBS_BUCKET_CAP) rides
          the write job via ``df.observe`` on the input side;
        * per-bucket rows_out and per-(source, sink) metric deltas come
          from ONE column-pruned aggregation over the buckets this run
          just wrote (partition-pruned; reads two thin columns of the
          run's own output, never the input and never prior output);
        * final metrics are a rollup of the manifest's delta table —
          the output table is never re-read for accounting.

        Crash-safe: buckets are re-written with dynamic partition
        overwrite, so partially-written buckets heal on resume and
        per-sink counts stay exactly-once (FIXTURES §F4 invariant;
        see checkpoint.Manifest for the stale-delta proof).
        """
        cfg = self.cfg
        manifest = Manifest(manifest_dir or f"{out_dir}/_manifest")

        done = set(manifest.completed_buckets(spark, run_id))
        todo_buckets = sorted(b for b in range(cfg.n_buckets) if b not in done)
        if not todo_buckets:
            return manifest.final_metrics(spark)

        bucketed = with_bucket(df, cfg.n_buckets, key=key)
        if done:
            bucketed = bucketed.filter(~F.col(BUCKET_COL).isin(sorted(done)))

        obs = Observation()
        per_bucket_in = len(todo_buckets) <= OBS_BUCKET_CAP
        in_exprs = [F.count(F.lit(1)).alias("rows_in")]
        if per_bucket_in:
            in_exprs += [
                F.count_if(F.col(BUCKET_COL) == F.lit(b)).alias(f"b{b}")
                for b in todo_buckets
            ]
        observed = bucketed.observe(obs, *in_exprs)

        routed = self.transform(observed)

        # Salted repartition: heavy-hitter (sink, route) pairs spread
        # over `salt` writer tasks each; AQE coalesces small ones. A
        # sink's rendered partition_key (kafka partitionKey analog)
        # overrides the salt hash so equal keys co-locate in one file.
        part_hash = F.pmod(
            F.xxhash64(F.coalesce(F.col(PKEY_COL), F.col(key).cast("string"))),
            F.lit(cfg.salt),
        )
        routed = routed.repartition(
            F.col(BUCKET_COL), F.col(SINK_COL), F.col(ROUTE_COL), part_hash
        )

        (
            routed.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL, SINK_COL, ROUTE_COL)
            .parquet(out_dir)
        )

        in_vals = obs.get  # filled by the write job — no extra action
        rows_in_by_bucket = (
            {b: int(in_vals[f"b{b}"]) for b in todo_buckets} if per_bucket_in else {}
        )

        # ONE pruned aggregation over this run's freshly-written buckets:
        # partition-pruned to todo_buckets, reads only (source, failed).
        # Result size is bounded by buckets × sources × sinks — driver-safe.
        agg_rows = []
        if _has_bucket_dirs(out_dir):
            written = spark.read.parquet(out_dir).filter(
                F.col(BUCKET_COL).isin(todo_buckets)
            )
            agg_rows = (
                written.groupBy(BUCKET_COL, cfg.source_col, SINK_COL)
                .agg(
                    F.count_if(~F.col(FAILED_COL)).alias("ok"),
                    F.count_if(F.col(FAILED_COL)).alias("bad"),
                )
                .collect()
            )

        seq = manifest.next_seq(spark)
        rows_out_by_bucket: dict[int, int] = {}
        metrics_rows: list[tuple] = []
        for r in agg_rows:
            b = r[BUCKET_COL]
            rows_out_by_bucket[b] = rows_out_by_bucket.get(b, 0) + r.ok + r.bad
            metrics_rows.append(
                (run_id, seq, b, cfg.name, r[cfg.source_col], r[SINK_COL], r.ok, r.bad)
            )
        lineage_rows = [
            (
                run_id,
                seq,
                b,
                cfg.name,
                rows_in_by_bucket.get(b) if per_bucket_in else None,
                rows_out_by_bucket.get(b, 0),
                "done",
            )
            for b in todo_buckets
        ]
        manifest.record_run(spark, lineage_rows, metrics_rows)
        return manifest.final_metrics(spark)


def _has_bucket_dirs(out_dir: str) -> bool:
    import os

    return os.path.isdir(out_dir) and any(
        name.startswith(BUCKET_COL + "=") for name in os.listdir(out_dir)
    )
