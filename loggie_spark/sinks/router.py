"""Routed fan-out stage — the sink layer re-expressed as columns.

In the reference every sink renders a per-event destination from a
``${...}`` pattern — kafka topic (pkg/sink/kafka/sink.go:124-199), ES
index (pkg/sink/elasticsearch/client.go:41-116), file path
(pkg/sink/file/sink.go:121-177) — and a render failure follows a
policy: ``fail`` the batch, use a ``defaultTopic``, ``dropEvent``, or
``ignoreError`` (kafka/sink.go:132-147).

Here a sink is a :class:`SinkSpec`; the router compiles every sink's
selector + route pattern into one projection, fans rows out via a
single ``explode`` (no shuffle, no per-sink job), and the writer does
one ``partitionBy(sink, route_key)`` append — kafka topics, ES indexes
and file dirs all collapse onto partition directories, which is exactly
how a 100 TB cluster job should route: directory-partitioned Iceberg
appends, one pass over the data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loggie_spark.expr import compile_condition
from loggie_spark.patterns import compile_pattern, pattern_is_strict_ok

SINK_COL = "sink"
ROUTE_COL = "route_key"
FAILED_COL = "_route_failed"
PKEY_COL = "_pkey"
DOCID_COL = "_doc_id"


@dataclass
class SinkSpec:
    """One routed sink (file-/kafka-/ES-shaped are all the same shape).

    ``selector`` — optional condition expression (loggie's unshipped
    Selector interface, pkg/core/api/base.go:149-152); rows not
    matching any selector are dropped from that sink only.
    ``on_render_fail`` — 'fail' | 'default' | 'drop' | 'ignore'
    (kafka ifRenderTopicFailed semantics).
    """

    name: str
    route_pattern: str = "loggie"
    selector: str | None = None  # condition expr; None = all rows
    on_render_fail: str = "fail"
    default_route: str = "loggie"
    partition_key: str | None = None  # kafka partitionKey analog
    document_id: str | None = None  # ES documentId pattern (client.go:209-216)
    base_dirs: list[str] = field(default_factory=list)  # file sink dirs
    dir_hash_key: str | None = None  # consistent-hash key (file/sink.go:81-92)

    def selector_col(self) -> Column:
        if self.selector is None:
            return F.lit(True)
        return F.coalesce(compile_condition(self.selector), F.lit(False))


def rendezvous_dir(key: Column, dirs: list[str]) -> Column:
    """Deterministic consistent-hash dir selection — the batch analog
    of the file sink's stathat ring (file/sink.go:81-92,153-163).

    Highest-random-weight (rendezvous) hashing over the engine-agnostic
    md5-60bit family: same consistency contract as the ring (removing a
    dir reassigns only its keys), reproducible in any SQL engine for
    oracles — the exact stathat crc32 ring layout is NOT copied.
    """
    from loggie_spark.functions.hashing import md5_60bit

    candidates = F.array(
        *[
            F.struct(
                md5_60bit(F.concat(F.lit(d + "|"), key.cast("string"))).alias("h"),
                F.lit(d).alias("d"),
            )
            for d in dirs
        ]
    )
    return F.array_max(candidates)["d"]


def attach_routes(
    df: DataFrame, sink: SinkSpec, time_col: Column | None = None
) -> DataFrame:
    """Single-sink routing: add ``route_key`` + ``_route_failed``
    columns applying the render-failure policy."""
    route = compile_pattern(sink.route_pattern, time_col=time_col)
    ok = pattern_is_strict_ok(sink.route_pattern)
    if sink.on_render_fail == "default":
        route = F.when(ok, route).otherwise(F.lit(sink.default_route))
        failed = F.lit(False)
    elif sink.on_render_fail == "drop":
        failed = ~ok
    elif sink.on_render_fail == "ignore":
        failed = F.lit(False)
        route = F.when(ok, route).otherwise(F.lit(""))
    else:  # 'fail' — surfaced as failed rows; the caller raises/counts
        failed = ~ok
    return df.withColumn(SINK_COL, F.lit(sink.name)).withColumn(
        ROUTE_COL, route
    ).withColumn(FAILED_COL, failed)


def explode_to_sinks(
    df: DataFrame, sinks: list[SinkSpec], time_col: Column | None = None
) -> DataFrame:
    """Fan one row out to every sink whose selector matches, in ONE
    narrow pass (array-of-structs + explode; no shuffle, no N jobs).

    Adds ``sink``, ``route_key``, ``_route_failed`` and ``_pkey`` (the
    sink's rendered ``partition_key``, null when unset — the kafka
    partitionKey analog used to co-locate equal keys in one writer
    task, sink.go:197-199). Rows matching no sink disappear (reference:
    an event always has exactly one sink per pipeline; multi-sink here
    generalizes the Selector interface).

    ``on_render_fail='drop'`` silently omits the event from that sink —
    the entry never enters the array, matching the reference's
    DropEvent (kafka/sink.go:139-141: no failure accounting, no output).
    """
    entries = []
    for s in sinks:
        route = compile_pattern(s.route_pattern, time_col=time_col)
        ok = pattern_is_strict_ok(s.route_pattern)
        emit = s.selector_col()
        if s.on_render_fail == "default":
            route = F.when(ok, route).otherwise(F.lit(s.default_route))
            failed = F.lit(False)
        elif s.on_render_fail == "drop":
            emit = emit & F.coalesce(ok, F.lit(False))
            failed = F.lit(False)
        elif s.on_render_fail == "ignore":
            failed = F.lit(False)
            route = F.when(ok, route).otherwise(F.lit(""))
        else:  # 'fail' — quarantined + counted by the metrics contract
            failed = ~ok
            route = F.when(ok, route).otherwise(F.lit(""))
        pkey = (
            compile_pattern(s.partition_key, time_col=time_col).cast("string")
            if s.partition_key
            else F.lit(None).cast("string")
        )
        doc_id = (
            compile_pattern(s.document_id, time_col=time_col).cast("string")
            if s.document_id
            else F.lit(None).cast("string")
        )
        if s.base_dirs:
            # file sink consistent hashing: pick a base dir from the
            # rendered dirHashKey, prefix the filename route
            # (selectFilename, file/sink.go:153-177).
            hash_key = (
                compile_pattern(s.dir_hash_key, time_col=time_col)
                if s.dir_hash_key
                else F.lit("")
            )
            route = F.concat(rendezvous_dir(hash_key, s.base_dirs), route)
        if len(sinks) == 1:
            # Fast path — one sink is the reference's own shape (an
            # event has exactly one sink per pipeline): plain column
            # projection, no Generate in the plan. A 'drop'-policy or
            # selector miss is a filter instead of an empty array.
            out = df
            if s.selector is not None or s.on_render_fail == "drop":
                out = out.filter(emit)
            return (
                out.withColumn(SINK_COL, F.lit(s.name))
                .withColumn(ROUTE_COL, route)
                .withColumn(FAILED_COL, failed)
                .withColumn(PKEY_COL, pkey)
                .withColumn(DOCID_COL, doc_id)
            )
        entry = F.when(
            emit,
            F.struct(
                F.lit(s.name).alias(SINK_COL),
                route.alias(ROUTE_COL),
                failed.alias(FAILED_COL),
                pkey.alias(PKEY_COL),
                doc_id.alias(DOCID_COL),
            ),
        )
        entries.append(entry)

    routed = df.withColumn("_sinks", F.filter(F.array(*entries), lambda x: x.isNotNull()))
    routed = routed.withColumn("_s", F.explode("_sinks")).drop("_sinks")
    return (
        routed.withColumn(SINK_COL, F.col("_s")[SINK_COL])
        .withColumn(ROUTE_COL, F.col("_s")[ROUTE_COL])
        .withColumn(FAILED_COL, F.col("_s")[FAILED_COL])
        .withColumn(PKEY_COL, F.col("_s")[PKEY_COL])
        .withColumn(DOCID_COL, F.col("_s")[DOCID_COL])
        .drop("_s")
    )


def iceberg_available(spark) -> bool:
    """True iff the Iceberg Spark runtime is on the session classpath.
    The sandbox container ships no Iceberg jar, so the iceberg write
    path below is capability-gated the same way the multimodal codecs
    are: real plumbing, clear error when the environment lacks it."""
    try:
        # py4j resolves attribute paths lazily (a missing class is just
        # a JavaPackage), so probe with an actual classloader lookup.
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Schema")
        return True
    except Exception:
        return False


def write_routed_iceberg(df: DataFrame, table: str) -> None:
    """Iceberg append of the routed frame — the production sink shape
    the north rule names (`file/kafka/ES-shaped sinks as partitioned
    Iceberg appends`). The table's partition spec carries (sink,
    route_key), so this is byte-for-byte the same fan-out as the
    parquet path with Iceberg's snapshot/commit semantics on top:

    - append is atomic per job (no torn partitions on failure; the
      manifest-resume layer still dedups replays by bucket),
    - ``write.target-file-size-bytes`` replaces ``maxRecordsPerFile``,
    - rotation-retention analogs are ``expire_snapshots`` +
      ``remove_orphan_files`` table maintenance.

    Uses the DataFrameWriterV2 API (`create` with the fan-out partition
    spec on first write; normal path is append into the existing spec).
    """
    spark = df.sparkSession
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath: submit with "
            "--packages org.apache.iceberg:iceberg-spark-runtime and a "
            "configured catalog (spark.sql.catalog.<name>), or use the "
            "parquet path (write_routed)."
        )
    # Probe existence explicitly rather than catch-all around append():
    # a genuine append failure (schema mismatch, auth, commit conflict)
    # must surface as itself, not as a confusing 'table already exists'
    # from a blind create() retry.
    if spark.catalog.tableExists(table):
        df.writeTo(table).append()
    else:
        df.writeTo(table).partitionedBy(F.col(SINK_COL), F.col(ROUTE_COL)).create()


def write_routed(
    df: DataFrame,
    out_dir: str,
    extra_partition_cols: list[str] | None = None,
    mode: str = "append",
    max_size_mb: int | None = None,
    avg_record_bytes: int = 512,
    compress: bool = False,
) -> None:
    """Append the routed frame partitioned by (sink, route_key) — the
    physical fan-out. At scale this is an Iceberg append with the same
    partition spec; route_key cardinality is bounded by the sinks'
    patterns (dates × topics), so directory explosion is capped by
    construction.

    File-rotation analog (file/config.go:21-53): the reference rotates
    a live log file; a batch/Iceberg append has no live file, so the
    honest mapping is file SIZING, not rotation —

    - ``maxSize`` → ``max_size_mb``: caps bytes per output file via
      ``maxRecordsPerFile`` = max_size_mb·2²⁰ / avg_record_bytes (Spark
      caps by record count, not bytes; at the Iceberg layer the same
      knob is ``write.target-file-size-bytes``).
    - ``compress`` → parquet codec (gzip vs the snappy default).
    - ``maxAge`` / ``maxBackups`` / ``localTime`` are retention of
      rotated-out backups — table/lifecycle maintenance in a batch
      world (Iceberg ``expire_snapshots`` / object-store lifecycle
      rules), deliberately not mapped here.
    """
    parts = [SINK_COL, ROUTE_COL] + (extra_partition_cols or [])
    w = df.write.mode(mode)
    if max_size_mb is not None:
        w = w.option(
            "maxRecordsPerFile", max(1, max_size_mb * (1 << 20) // avg_record_bytes)
        )
    if compress:
        w = w.option("compression", "gzip")
    w.partitionBy(*parts).parquet(out_dir)
