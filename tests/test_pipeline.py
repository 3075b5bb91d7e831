"""End-to-end pipeline tests: exact per-sink counts vs a pure-Python
oracle, routed-row token equality, and crash/resume exactly-once
(FIXTURES.md §F4 contracts)."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from loggie_spark.datagen import generate_sequences
from loggie_spark.examples import reference_pipeline
from loggie_spark.pipeline import Pipeline

N = 2000
SOURCES = ["access", "container", "app", "audit"]
STATUSES = ["200", "404", "500", "302"]
LEVELS = ["DEBUG", "INFO", "WARN", "ERROR"]


def python_oracle(n: int):
    """Independent reimplementation of datagen + routing semantics:
    returns {(source, kafka_topic): count} for surviving rows and the
    per-source survivor counts."""
    topic_counts: dict[tuple[str, str], int] = {}
    survivors: dict[str, int] = {}
    for i in range(n):
        pct = i % 100
        src = (
            "access" if pct < 60 else "container" if pct < 85 else "app" if pct < 95 else "audit"
        )
        if src == "access":
            status = STATUSES[i % 4]
            if status == "500":
                continue
            topic = "not_found" if status == "404" else "common"
        elif src == "container":
            topic = "json"
        elif src == "app":
            level = LEVELS[i % 4]
            if level == "DEBUG":
                continue
            topic = "app"
        else:
            topic = "audit"
        topic_counts[(src, topic)] = topic_counts.get((src, topic), 0) + 1
        survivors[src] = survivors.get(src, 0) + 1
    return topic_counts, survivors


@pytest.fixture(scope="module")
def run_dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    return str(d / "out"), str(d / "manifest")


def _run(spark, out_dir, manifest_dir, run_id="r1"):
    seq = generate_sequences(spark, N).withColumn(
        "_ptime", F.lit("2024-03-01 00:00:00").cast("timestamp")
    )
    cfg = reference_pipeline(time_col_name="_ptime")
    metrics = Pipeline(cfg).run(
        spark, seq, out_dir, run_id=run_id, manifest_dir=manifest_dir
    )
    return seq, metrics


def test_e2e_counts_and_tokens(spark, run_dirs):
    out_dir, manifest_dir = run_dirs
    seq, metrics = _run(spark, out_dir, manifest_dir)
    topic_counts, survivors = python_oracle(N)
    total_survivors = sum(survivors.values())

    m = {(r.source, r.sink): (r.success_count, r.fail_count) for r in metrics.collect()}
    # Every source × sink pair has exact success counts, zero fails.
    for src, cnt in survivors.items():
        for sink in ("kafka", "es", "file"):
            assert m[(src, sink)] == (cnt, 0), (src, sink, m[(src, sink)])

    final = spark.read.parquet(out_dir)
    # kafka sink routes by ${topic} — exact per-topic counts.
    kafka = (
        final.filter(F.col("sink") == "kafka")
        .groupBy("source", "route_key")
        .count()
        .collect()
    )
    got = {(r.source, r.route_key): r["count"] for r in kafka}
    assert got == topic_counts

    # es sink routes by dated index from the deterministic time col.
    es_keys = {
        r.route_key
        for r in final.filter(F.col("sink") == "es").select("route_key").distinct().collect()
    }
    assert es_keys == {f"log-{s}-2024.03.01" for s in survivors}

    # Token-array equality per routed row (north-rule invariant).
    joined = (
        final.filter(F.col("sink") == "file")
        .select("doc_id", F.col("tokens").alias("out_tokens"))
        .join(seq.select("doc_id", "tokens"), "doc_id")
    )
    mismatches = joined.filter(F.col("out_tokens") != F.col("tokens")).count()
    assert mismatches == 0
    assert joined.count() == total_survivors


def test_resume_exactly_once(spark, run_dirs):
    """Simulate a crash after some buckets committed: wipe manifest
    rows for half the buckets (their output remains — worst case for
    duplication) and re-run. Output and metrics must be unchanged."""
    out_dir, manifest_dir = run_dirs
    final_before = spark.read.parquet(out_dir)
    count_before = final_before.count()
    kafka_before = sorted(
        (r.source, r.route_key, r["count"])
        for r in final_before.filter(F.col("sink") == "kafka")
        .groupBy("source", "route_key")
        .count()
        .collect()
    )

    # Crash simulation: the lineage table loses half its buckets (their
    # output remains), while the METRICS delta table keeps its now-stale
    # rows — the rollup must ignore deltas whose (bucket, seq) no longer
    # wins in lineage, or resumed buckets double-count.
    from loggie_spark.checkpoint import LINEAGE_SCHEMA

    lineage_dir = f"{manifest_dir}/lineage"
    manifest = spark.read.parquet(lineage_dir)
    kept = manifest.filter(F.col("bucket") % 2 == 0)
    kept_pd = kept.toPandas()
    shutil.rmtree(lineage_dir)
    spark.createDataFrame(kept_pd, LINEAGE_SCHEMA).write.mode("overwrite").parquet(
        lineage_dir
    )

    _, metrics2 = _run(spark, out_dir, manifest_dir)

    # Exactly-once metrics across the resume: per-sink counts unchanged.
    _, survivors = python_oracle(N)
    m2 = {(r.source, r.sink): (r.success_count, r.fail_count) for r in metrics2.collect()}
    for src, cnt in survivors.items():
        for sink in ("kafka", "es", "file"):
            assert m2[(src, sink)] == (cnt, 0), (src, sink, m2[(src, sink)])

    final_after = spark.read.parquet(out_dir)
    assert final_after.count() == count_before  # no dupes, no loss
    kafka_after = sorted(
        (r.source, r.route_key, r["count"])
        for r in final_after.filter(F.col("sink") == "kafka")
        .groupBy("source", "route_key")
        .count()
        .collect()
    )
    assert kafka_after == kafka_before

    # Second resume with complete manifest = pure no-op.
    _, metrics3 = _run(spark, out_dir, manifest_dir)
    assert spark.read.parquet(out_dir).count() == count_before


def test_render_fail_policies(spark, tmp_path):
    """kafka ifRenderTopicFailed policies: default / drop / fail
    (pkg/sink/kafka/sink.go:132-147)."""
    from loggie_spark.sinks.router import SinkSpec, explode_to_sinks

    df = spark.createDataFrame(
        [("a", "t1"), ("b", None)], "doc_id string, topic string"
    )
    out_default = explode_to_sinks(
        df, [SinkSpec("k", "${topic}", on_render_fail="default", default_route="dflt")]
    )
    got = {r.doc_id: r.route_key for r in out_default.collect()}
    assert got == {"a": "t1", "b": "dflt"}

    # drop = the event silently skips that sink: no row, no fail count
    # (kafka/sink.go:139-141 DropEvent semantics).
    out_drop = explode_to_sinks(df, [SinkSpec("k", "${topic}", on_render_fail="drop")])
    rows = out_drop.collect()
    assert {r.doc_id: r._route_failed for r in rows} == {"a": False}


def test_write_routed_rotation_analog(spark, tmp_path):
    """file/config.go:21-53 rotation analog: max_size_mb caps bytes per
    output file via maxRecordsPerFile; compress=True selects gzip."""
    import glob

    from loggie_spark.sinks.router import write_routed

    df = (
        spark.range(1000)
        .select(
            F.col("id"),
            F.lit("file").alias("sink"),
            (F.col("id") % 2).cast("string").alias("route_key"),
            F.sha2(F.col("id").cast("string"), 256).alias("body"),
        )
        .coalesce(1)
    )
    out = str(tmp_path / "routed")
    # avg_record_bytes chosen so the cap lands at 100 records/file:
    # 1000 rows / 2 routes / cap 100 → ≥5 files per route directory.
    write_routed(df, out, max_size_mb=1, avg_record_bytes=10486, compress=True)
    per_route = glob.glob(f"{out}/sink=file/route_key=0/*.parquet")
    assert len(per_route) >= 5, per_route
    assert all(".gz.parquet" in p for p in per_route), per_route[:2]
    back = spark.read.parquet(out)
    assert back.count() == 1000


def test_flagship_plan_shape(spark):
    """Lock the single-scan property the r01→r02 rewrite earned: the
    flagship physical plan must contain exactly ONE shuffle Exchange
    (the metrics aggregate), ONE BroadcastExchange (enrich), ONE
    FileScan, and ZERO SortMergeJoin / CartesianProduct — so later
    rounds can't silently regress to multi-pass."""
    from loggie_spark.datagen import sequences_from_documents
    from loggie_spark.sinks.metrics import sink_metrics

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seq = sequences_from_documents(docs).withColumn(
        "_ptime", F.lit("2024-03-01 00:00:00").cast("timestamp")
    )
    cfg = reference_pipeline(time_col_name="_ptime")
    df = sink_metrics(Pipeline(cfg).transform(seq), cfg.name)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_broadcast = plan.count("BroadcastExchange")
    n_shuffle = plan.count("Exchange") - n_broadcast
    assert n_shuffle == 1, f"expected 1 shuffle Exchange, got {n_shuffle}:\n{plan}"
    assert n_broadcast == 1, f"expected 1 BroadcastExchange, got {n_broadcast}:\n{plan}"
    assert plan.count("FileScan") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_iceberg_write_capability_gate(spark):
    """The Iceberg routed-append path is capability-gated: without the
    runtime jar (this container) it must fail with the documented
    actionable error, not an opaque ClassNotFound from deep inside the
    writer."""
    import pytest as _pytest

    from loggie_spark.sinks.router import iceberg_available, write_routed_iceberg

    assert iceberg_available(spark) is False
    df = spark.createDataFrame([("a", "t", "x")], ["_sink", "_route_key", "body"])
    with _pytest.raises(RuntimeError, match="Iceberg runtime not on the classpath"):
        write_routed_iceberg(df, "cat.db.routed")


def test_run_curation_job_end_to_end(spark, tmp_path):
    """The spark-submit curation entrypoint runs against real testdata:
    funnel counts are monotone non-increasing, the shard export
    verifies against its manifest, and the report lands next to it."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import run_curation

    from loggie_spark.layout import verify_training_shards

    out = str(tmp_path / "curated")
    report = run_curation.main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out,
            "--n-shards", "4",
            "--master", "local[4]",
        ]
    )
    assert report["input_docs"] == 500
    assert (
        report["input_docs"]
        >= report["after_exact_dedup"]
        >= report["after_near_dedup"]
        >= report["after_quality_gates"]
        >= 1
    )
    assert report["exported_rows"] == report["after_quality_gates"]
    verify_training_shards(spark, out)
    on_disk = json.load(open(os.path.join(out, "_curation_report.json")))
    assert on_disk == report

    # optional stages: SemDeDup (embeddings keyed by doc_id) + DSIR
    # resample toward a target slice — funnel stays monotone and the
    # two new stage counts appear in order
    out2 = str(tmp_path / "curated2")
    report2 = run_curation.main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out2,
            "--n-shards", "4",
            "--master", "local[4]",
            "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
            "--semdedup-threshold", "0.4",
            "--dsir-target", "/root/testdata/sf0.001/documents.parquet",
            "--dsir-keep-fraction", "0.5",
        ]
    )
    assert (
        report2["after_near_dedup"]
        >= report2["after_semantic_dedup"]
        >= report2["after_quality_gates"]
        >= report2["after_dsir_resample"]
        >= 1
    )
    assert report2["after_semantic_dedup"] < report2["after_near_dedup"]
    assert report2["after_dsir_resample"] < report2["after_quality_gates"]
    assert report2["exported_rows"] == report2["after_dsir_resample"]
    verify_training_shards(spark, out2)
