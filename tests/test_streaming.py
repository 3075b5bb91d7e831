"""Streaming pipeline: same transform over readStream must produce the
same routed rows/counts as the batch path, via availableNow drain."""

from __future__ import annotations

import pyspark.sql.functions as F

from loggie_spark.datagen import generate_sequences
from loggie_spark.examples import reference_pipeline
from loggie_spark.pipeline import Pipeline
from loggie_spark.streaming import stream_metrics, stream_pipeline, streaming_dedup

N = 500


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    seq = generate_sequences(spark, N).withColumn(
        "_ptime", F.lit("2024-03-01 00:00:00").cast("timestamp")
    )
    seq.write.parquet(src)
    schema = spark.read.parquet(src).schema

    cfg = reference_pipeline(time_col_name="_ptime")
    q = stream_pipeline(spark, cfg, src, out, ckpt, schema, available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    expected = Pipeline(cfg).transform(seq)
    assert got.count() == expected.count()
    g = {(r.sink, r.route_key, r["count"]) for r in got.groupBy("sink", "route_key").count().collect()}
    e = {
        (r.sink, r.route_key, r["count"])
        for r in expected.groupBy("sink", "route_key").count().collect()
    }
    assert g == e

    # Restart on the same checkpoint: no new input → no duplicates.
    q2 = stream_pipeline(spark, cfg, src, out, ckpt, schema, available_now=True)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == expected.count()


def test_stream_metrics_windowed(spark, tmp_path):
    src = str(tmp_path / "in2")
    generate_sequences(spark, 200).withColumn(
        "event_time", F.lit("2024-03-01 00:00:05").cast("timestamp")
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    cfg = reference_pipeline(time_col_name="event_time")
    routed = Pipeline(cfg).transform(stream)
    m = stream_metrics(routed, "p1")
    q = (
        m.writeStream.format("memory")
        .queryName("m1")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM m1").collect()
    assert rows
    assert {"window", "pipeline", "source", "sink", "success_count", "fail_count"} <= set(
        rows[0].asDict()
    )


def test_streaming_dedup(spark, tmp_path):
    src = str(tmp_path / "in3")
    df = spark.createDataFrame(
        [("a", "2024-03-01 00:00:01"), ("a", "2024-03-01 00:00:02"), ("b", "2024-03-01 00:00:03")],
        "k string, t string",
    ).withColumn("event_time", F.col("t").cast("timestamp"))
    df.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    deduped = streaming_dedup(stream, ["k"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("d1")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    ks = sorted(r.k for r in spark.sql("SELECT k FROM d1").collect())
    assert ks == ["a", "b"]


def test_streaming_incremental_dedup_against_static_index(spark, tmp_path):
    """The streaming face of dedup_incremental: a live ingest stream
    anti-joins the accumulated corpus's static digest index (stream ×
    static left_anti is fully supported — the index broadcasts or
    hash-joins per micro-batch), so only genuinely new content reaches
    the sink."""
    src = str(tmp_path / "in_inc")
    corpus = spark.createDataFrame(
        [("c1", "already in corpus"), ("c2", "also old news")],
        "doc_id string, text string",
    )
    index = corpus.select(F.sha2("text", 256).alias("_d"))
    spark.createDataFrame(
        [("n1", "already in corpus"), ("n2", "fresh document body")],
        "doc_id string, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    survivors = stream.withColumn("_d", F.sha2("text", 256)).join(
        index, "_d", "left_anti"
    )
    q = (
        survivors.writeStream.format("memory")
        .queryName("inc1")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(r.doc_id for r in spark.sql("SELECT doc_id FROM inc1").collect())
    assert got == ["n2"]


def test_streaming_curation_composition(spark, tmp_path):
    """The curation gates are pure projections, so they lift onto a
    stream unchanged: quality gate -> exact dedup against the static
    corpus index -> append survivors. Certifies the batch operators
    compose with readStream without a separate streaming codepath."""
    from loggie_spark.operators.textstats import quality_score

    src = str(tmp_path / "in_cur")
    good = ("fresh high quality document with many varied interesting words "
            "covering several distinct topics and ideas today")
    dup = "already indexed content"
    junk = "a a a a a a a a a a a a"  # repetitive -> low quality
    spark.createDataFrame(
        [("n1", good), ("n2", dup), ("n3", junk)], "doc_id string, text string"
    ).write.parquet(src)
    index = spark.createDataFrame([(dup,)], "text string").select(
        F.sha2("text", 256).alias("_d")
    )
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    survivors = (
        stream.withColumn("q", quality_score(F.col("text")))
        .filter(F.col("q") >= 0.5)
        .withColumn("_d", F.sha2("text", 256))
        .join(index, "_d", "left_anti")
    )
    q = (
        survivors.writeStream.format("memory")
        .queryName("cur1")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(r.doc_id for r in spark.sql("SELECT doc_id FROM cur1").collect())
    assert got == ["n1"]


def test_write_stream_exactly_once_resume(spark, tmp_path):
    """Two runs over a growing input with ONE checkpoint: the second
    run processes only the new file, and the output holds exactly one
    copy of every input row (batch-id partitions are idempotent under
    replay)."""
    from loggie_spark.streaming.pipeline import write_stream_exactly_once

    src = str(tmp_path / "in_eo")
    out = str(tmp_path / "out_eo")
    ckpt = str(tmp_path / "ckpt_eo")
    spark.createDataFrame([("a",), ("b",)], "k string").write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    stream = lambda: spark.readStream.schema(schema).parquet(src)  # noqa: E731
    q = write_stream_exactly_once(stream(), out, ckpt)
    q.awaitTermination(60)
    spark.createDataFrame([("c",)], "k string").write.mode("append").parquet(src)
    q2 = write_stream_exactly_once(stream(), out, ckpt)
    q2.awaitTermination(60)
    got = sorted(r.k for r in spark.read.parquet(out).select("k").collect())
    assert got == ["a", "b", "c"]


def test_stream_countmin_matches_batch_sketch(spark, tmp_path):
    """The continuously-maintained sketch equals the batch sketch over
    the same items: per-batch partials merged at read time, replays
    idempotent by batch partition."""
    from loggie_spark.operators.sketches import cms_build, cms_estimate
    from loggie_spark.streaming.pipeline import read_countmin, stream_countmin

    src = str(tmp_path / "in")
    rows = [(w,) for w in ["x"] * 20 + ["y"] * 7 + ["z"] * 3]
    static = spark.createDataFrame(rows, "word string")
    static.repartition(3).write.parquet(src)

    stream = spark.readStream.schema("word string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream_countmin(
        stream,
        "word",
        sketch_dir=str(tmp_path / "sketch"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        depth=4,
        width=32,
    )
    q.awaitTermination(120)

    merged = read_countmin(spark, str(tmp_path / "sketch"))
    want = {
        (r.seed, r.bucket): r.cnt
        for r in cms_build(static, "word", depth=4, width=32).collect()
    }
    got = {(r.seed, r.bucket): r.cnt for r in merged.collect()}
    assert got == want

    qdf = spark.createDataFrame([("x",), ("y",), ("z",), ("nope",)], "word string")
    est = {
        r.word: r.est
        for r in cms_estimate(merged, qdf, "word", depth=4, width=32).collect()
    }
    assert est["x"] >= 20 and est["y"] >= 7 and est["z"] >= 3


def test_stream_source_drift_matches_python(spark, tmp_path):
    """Windowed chi² drift vs a frozen reference: the streamed result
    reproduces a hand-computed chi² for each (window, source); a
    source with zero vocab tokens reports NULL."""
    import datetime

    import pyspark.sql.functions as F

    from loggie_spark.streaming.pipeline import stream_source_drift

    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (t0, "s1", "aa bb aa cc"),
        (t0, "s1", "aa bb"),
        (t0, "s2", "cc cc cc zz"),   # zz outside vocab -> ignored
        (t0, "s3", "zz zz"),         # no vocab tokens -> NULL chi2
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "event_time timestamp, source string, text string"
    ).write.parquet(src)

    ref = [("aa", 0.5), ("bb", 0.3), ("cc", 0.2)]
    stream = spark.readStream.schema(
        "event_time timestamp, source string, text string"
    ).parquet(src)
    q = (
        stream_source_drift(stream, ref, window="1 minute")
        .writeStream.format("memory")
        .queryName("drift_t")
        .outputMode("complete")  # static input: append would hold windows open forever
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.source: (r.n_tokens_v, r.chi2) for r in spark.sql(
        "SELECT * FROM drift_t").collect()}

    def chi2(counts):
        n = sum(counts.values())
        tot = 0.0
        for w, p in sorted(ref):
            qq = counts.get(w, 0) / n
            tot += (qq - p) * (qq - p) / p
        return round(tot, 4)

    assert got["s1"] == (6, chi2({"aa": 3, "bb": 2, "cc": 1}))
    assert got["s2"] == (3, chi2({"cc": 3}))
    assert got["s3"] == (0, None)
