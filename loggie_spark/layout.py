"""Table-layout utilities: bucketed tables for shuffle-free co-located
joins.

Most operators in this repo join or fold on a stable document key
(dedup survivor joins, kept-position rebuilds, enrichment by doc).
Every such join on plain parquet shuffles BOTH sides; writing the
corpus ONCE bucketed by that key amortizes the shuffle to zero for
every later join on it — measured here: the same doc-keyed join plans
0 shuffle Exchanges against bucketed tables vs 2 against plain parquet
(tests/test_plan_shapes.py). This is the batch-table analog of the
kafka partitionKey co-location contract, and at Iceberg scale the same
layout is the table's bucket partition transform (``bucket(N, key)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table on ``key``.

    Reads via ``spark.table(table)`` then carry the bucket layout, so
    joins/aggregations keyed on ``key`` between tables with the SAME
    bucket count plan no Exchange at all. ``buckets`` must match
    across the tables you intend to co-join (64 locally; at cluster
    scale pick buckets ≈ executors × cores so one bucket is one task).
    """
    (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
