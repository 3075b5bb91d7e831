"""Registry-wide physical-plan guard: no query may plan a
CartesianProduct, and BroadcastNestedLoopJoin is allowed only for the
two brute-force similarity queries whose CONTRACT is a bounded
broadcast side (every other operator must reduce candidates via an
equi-join before any wide op — the 100 TB invariant)."""

from __future__ import annotations

import pytest

from loggie_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

# Brute-force cosine top-k IS a broadcast nested loop by definition;
# the broadcast side is contractually bounded (query set / shard).
# td_bloom_decontaminate's build side is STRUCTURALLY one row (the
# global-aggregate bitmap fold in bloom_maybe_contains): a 1-row-build
# BNLJ is a map-side evaluation of the probe stream, the degenerate
# safe case — Catalyst folds the constant join key away, so no
# equi-join shape is reachable and none would be cheaper.
BNLJ_ALLOWED = {
    "td_sim_topk_brute",
    "td_embed_dup_pairs",
    "td_bloom_decontaminate",
    # source-drift's (source × top-V-vocab) grid: the broadcast side is
    # ≤ top_v (100) scalar rows by TakeOrdered construction and the
    # stream side is one row per source — bounded on both axes
    # (operators/corpusstats.py:source_token_drift docstring).
    "td_source_drift",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unbounded_join_shapes(spark, name):
    plan = QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a BroadcastNestedLoopJoin without a "
            "bounded-broadcast contract"
        )


def test_bucketed_layout_joins_without_shuffle(spark, tmp_path):
    """Certify the bucketed-layout claim the operator docstrings make:
    a doc-keyed join between two tables bucketed on doc_id plans ZERO
    shuffle Exchanges, while the identical join on plain frames plans
    two. (Broadcast disabled so bucketing, not broadcast, is what
    removes the shuffle.)"""
    import pyspark.sql.functions as F

    from loggie_spark.layout import save_bucketed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = docs.select("doc_id", F.length("text").alias("n"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        save_bucketed(docs, "pl_docs_b", "doc_id", buckets=4)
        save_bucketed(stats, "pl_stats_b", "doc_id", buckets=4)
        j = spark.table("pl_docs_b").join(spark.table("pl_stats_b"), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        bucketed = plan.count("Exchange") - plan.count("BroadcastExchange")
        plan2 = docs.join(stats, "doc_id")._jdf.queryExecution().executedPlan().toString()
        control = plan2.count("Exchange") - plan2.count("BroadcastExchange")
        assert bucketed == 0, plan
        assert control >= 2
        assert j.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS pl_docs_b")
        spark.sql("DROP TABLE IF EXISTS pl_stats_b")


def test_salted_repartition_spreads_heavy_route(spark):
    """Certify the skew story: with salt=s, a single dominant
    (sink, route) pair lands on multiple writer partitions instead of
    one straggler task; a partition_key override forces co-location
    back to one partition (the kafka partitionKey contract)."""
    import pyspark.sql.functions as F

    n = 10_000
    df = spark.range(n).select(
        F.lit("b0").alias("_bucket"),
        F.lit("kafka").alias("_sink"),
        F.lit("hot-topic").alias("_route_key"),
        F.col("id").cast("string").alias("doc_id"),
        F.lit(None).cast("string").alias("_partition_key"),
    )
    salt = 8
    part_hash = F.pmod(
        F.xxhash64(F.coalesce(F.col("_partition_key"), F.col("doc_id"))),
        F.lit(salt),
    )
    # Disable AQE for the observation only: at test size AQE correctly
    # coalesces the tiny salted partitions back together (they are far
    # below advisoryPartitionSizeInBytes); at scale a heavy route's
    # salted partitions exceed it and stay split — the static layout
    # is what certifies the mechanism.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        spread = df.repartition(
            F.col("_bucket"), F.col("_sink"), F.col("_route_key"), part_hash
        )
        n_parts = (
            spread.select(F.spark_partition_id().alias("p")).distinct().count()
        )
        assert n_parts >= 2  # the hot route fans across writer tasks

        pinned = df.withColumn("_partition_key", F.lit("k1"))
        spread2 = pinned.repartition(
            F.col("_bucket"), F.col("_sink"), F.col("_route_key"), part_hash
        )
        assert (
            spread2.select(F.spark_partition_id().alias("p")).distinct().count()
            == 1
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bigram_lm_score_join_broadcast_only_when_floored(spark):
    """The broadcast hint on the bigram-LM model is applied ONLY when
    the min_count floor bounds it (≥2): a floored model pins a
    BroadcastHashJoin (the skewed probe stream rides no shuffle), while
    the unbounded min_count=1 model carries NO forced hint — AQE
    decides, so a web-scale distinct-bigram table can never OOM an
    executor through a pinned broadcast."""
    from loggie_spark.operators.corpusstats import bigram_lm_scores

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    floored = bigram_lm_scores(docs, min_count=2)
    plan = floored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    unbounded = bigram_lm_scores(docs, min_count=1)
    logical = unbounded._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in logical, logical


def test_tfidf_df_table_broadcast_only_when_bounded(spark):
    """Same contract for the TF-IDF document-frequency table (one row
    per DISTINCT word — unbounded at web scale): min_df/max_vocab cap
    it and pin a broadcast; the uncapped default carries no hint."""
    from loggie_spark.operators.corpusstats import tfidf_keywords

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    capped = tfidf_keywords(docs, min_df=2)
    logical = capped._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" in logical, logical
    uncapped = tfidf_keywords(docs)
    logical = uncapped._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in logical, logical


def test_ccnet_buckets_has_no_full_group_window(spark):
    """ccnet_buckets must never rank a whole group's rows in one window
    task: every window spec that ORDERS by the doc id (the row-level
    ranking) must also PARTITION by the score class — the worst
    partition is one tie-class inside one group, not a whole group."""
    import re

    plan = (
        QUERIES["td_ccnet_buckets"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    # row_number over ids: any spec ORDERING by doc_id must carry the
    # score column _s in its PARTITION clause (the comma-separated
    # tokens before the first token bearing an ASC/DESC marker)
    checked = 0
    for s in specs:
        part_cols, order_cols = [], []
        for t in s.split(", "):
            if order_cols or " ASC" in t or " DESC" in t:
                order_cols.append(t)
            else:
                part_cols.append(t)
        if any("doc_id" in t for t in order_cols):
            assert any("_s#" in t for t in part_cols), s
            checked += 1
    assert checked >= 1, specs


def test_dsir_weights_builds_lazily_single_scan(spark):
    """Constructing the dsir_weights frame must run ZERO Spark jobs:
    the corpus totals roll up from the aggregated bucket counts inside
    the one lazy plan, not from eager .count() actions that would each
    re-scan the tokenize/explode lineage over the full corpus."""
    from loggie_spark.operators.curation import dsir_weights

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    df = dsir_weights(docs, docs.limit(50))
    after = len(tracker.getJobIdsForGroup(None))
    assert after == before, "dsir_weights ran eager jobs while building its plan"
    assert df.columns == ["doc_id", "n_feats", "dsir_score"]


def test_scan_pushdown_and_column_pruning(spark):
    """The read path must reach the parquet scan with both the filter
    and the projection: PushedFilters carries the predicate (row-group
    stats pruning at scale) and ReadSchema carries ONLY the referenced
    columns — a scan reading all columns for a 2-column projection is
    wrong at 100 TB."""
    df = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("source = 'src3'")
        .select("doc_id", "n_chars")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "src3" in plan, plan
    # ReadSchema lists only the needed columns (filter col + projection)
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "n_chars", "source"}, cols
    assert "text" not in cols  # the wide column stays on disk


def test_bloom_probe_stream_never_shuffles(spark):
    """Certify bloom_maybe_contains' zero-probe-shuffle contract: the
    probe stream is never exploded (no Generate) and never shuffled —
    every (non-broadcast) Exchange in the plan belongs to the two-stage
    bitmap fold of the ≤ n_bits-row set-bit table, so the count is
    exactly 2 regardless of probe size."""
    import pyspark.sql.functions as F

    from loggie_spark.operators.sketches import bloom_build, bloom_maybe_contains

    # bloom as a plain position table (no bloom_build, whose bounded
    # member-side seed explode would add its own Generate to the plan):
    # any Generate left in the plan is then probe-attributable.
    probes = spark.range(5000).select(F.concat(F.lit("p"), "id").alias("g"))
    bloom = spark.range(64).select((F.col("id") * 61 % 4096).alias("pos"))
    out = bloom_maybe_contains(bloom, probes, "g", n_bits=4096, k=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan
    import re

    # \bExchange\b does not match BroadcastExchange (word boundary), so
    # this counts shuffle exchanges only: the groupBy(_w) fold and the
    # SinglePartition global collect — both on the ≤ n_bits-row side.
    shuffles = len(re.findall(r"\bExchange\b", plan))
    assert shuffles == 2, f"expected only the 2 bitmap-fold exchanges:\n{plan}"
