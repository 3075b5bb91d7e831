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
BNLJ_ALLOWED = {"td_sim_topk_brute", "td_embed_dup_pairs"}


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


def test_bigram_lm_score_join_is_broadcast(spark):
    """The bigram-LM probe stream (one row per bigram OCCURRENCE, skewed
    on natural keys) must never ride a shuffle: the model side is
    explicitly broadcast, so the plan carries a BroadcastHashJoin and no
    SortMergeJoin on the score join."""
    plan = (
        QUERIES["td_bigram_lm"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


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
