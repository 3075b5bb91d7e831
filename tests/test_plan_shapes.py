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
