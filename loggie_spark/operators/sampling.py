"""Deterministic data-mixing for training pipelines: per-source
stratified sampling with down- AND up-sampling rates.

A 10^12-sequence corpus is never trained on uniformly — each source
gets a mix rate (wiki 3.2 epochs, web 0.4, …). Requirements at scale:

* **deterministic** — the same doc_id always makes the same cut, so
  reruns/backfills/resumes produce identical mixes (no RNG state, no
  ``rand()`` whose value changes under task retry);
* **single narrow pass** — rate application is a filter/Generate on
  the scan, no shuffle;
* **engine-agnostic** — decisions come from the md5-60bit family
  (functions/hashing.py), so a DuckDB/Trino oracle reproduces the
  exact sample.

``rate`` semantics: floor(rate) full copies of every row, plus one
more copy for the id-hash fraction of rows selected with probability
``rate - floor(rate)``. rate=0.4 → 40% of rows once; rate=3.2 → every
row 3 times plus a 20% cohort a 4th time (epoch-style upsampling).
Copies carry ``mix_epoch`` (0-based) so downstream shuffling/packing
can interleave epochs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from loggie_spark.functions.hashing import md5_60bit

_SCALE = 1_000_000


def _rate_col(rates: dict[str, float], source_col: str, default_rate: float) -> Column:
    expr = F.lit(float(default_rate))
    for src, r in rates.items():
        expr = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(expr)
    return expr


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Apply per-source mix rates; returns one row per (row, epoch).

    The fractional-cohort test is ``md5_60bit(seed|id) % 1e6 <
    frac(rate)*1e6`` — uniform, deterministic, reproducible in any
    engine with md5. Rows with rate<1 keep no guaranteed copy; rates
    must be non-negative.
    """
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("mix rates must be non-negative")
    rate = _rate_col(rates, source_col, default_rate)
    h = md5_60bit(F.col(id_col).cast("string"), seed=seed) % _SCALE
    # Explicit floor() on BOTH engines: Spark's cast-to-long truncates
    # but DuckDB's CAST(... AS BIGINT) rounds, so a rate whose
    # frac·1e6 lands just under an integer (0.15 → 149999.999…) would
    # otherwise use different cutoffs — breaking bit-exact cross-engine
    # reproducibility on boundary doc_ids.
    n_copies = F.floor(rate).cast("int") + F.when(
        h < F.floor((rate - F.floor(rate)) * _SCALE).cast("long"), 1
    ).otherwise(0)
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("mix_epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


def sample_rates_sql(
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    seed: int = 0,
) -> str:
    """DuckDB fragment reproducing :func:`stratified_sample`'s
    (n_copies) expression — for oracle queries and cross-engine
    audits."""
    from loggie_spark.functions.hashing import md5_60bit_sql

    cases = " ".join(
        f"WHEN '{s}' THEN {float(r)!r}" for s, r in rates.items()
    )
    rate = f"(CASE {source_col} {cases} ELSE {float(default_rate)!r} END)"
    h = f"({md5_60bit_sql(f'CAST({id_col} AS VARCHAR)', seed=seed)} % {_SCALE})"
    return (
        f"(CAST(floor({rate}) AS INTEGER) + CASE WHEN {h} < "
        f"CAST(floor(({rate} - floor({rate})) * {_SCALE}) AS BIGINT) THEN 1 ELSE 0 END)"
    )


def epoch_order(
    docs,
    epoch: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
):
    """Deterministic per-epoch training order: every doc gets a
    ``(shard, pos)`` — the order a dataloader reads for epoch N —
    derived purely from ``md5(epoch|id)``, so the permutation is
    reproducible across reruns/resumes/engines and differs per epoch.

    100 TB shape: a GLOBAL sort of the corpus per epoch would be a
    full-corpus range shuffle; instead the hash assigns a shard
    (pmod → one co-keyed shuffle of (id, key) scalars) and rank is
    computed WITHIN each shard (in-partition sort, no cross-shard
    coordination) — exactly how training shards are consumed anyway.

    Returns ``(id_col, shard, pos)``; pos is 0-based within shard.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from loggie_spark.functions.hashing import md5_60bit

    key = md5_60bit(F.concat(F.lit(f"{epoch}|"), F.col(id_col).cast("string")))
    base = docs.select(F.col(id_col), key.alias("_k")).withColumn(
        "shard", F.pmod(F.col("_k"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_k", id_col)
    return base.select(
        id_col,
        "shard",
        (F.row_number().over(w) - 1).cast("int").alias("pos"),
    )


def group_sample(
    docs,
    k: int = 5,
    group_col: str = "source",
    id_col: str = "doc_id",
):
    """Deterministic k-per-group sample: the ``k`` rows of each group
    with the smallest ``md5(id)`` — a uniform-at-random-looking but
    fully reproducible pick (same rows on rerun/resume/any engine),
    the standard way to pull eyeball/debug samples out of a 100 TB
    corpus without rand() breaking retry idempotence.

    One hash(group) shuffle + per-group in-partition sort; rank is a
    window over the group, never a global sort.

    Returns ``(group_col, id_col, rank)`` with rank 1..k.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from loggie_spark.functions.hashing import md5_60bit

    h = md5_60bit(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h, id_col)
    return (
        docs.select(group_col, id_col)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    val_pct: int = 10,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Train/validation split that cannot leak through near-duplicates:
    the unit of assignment is the near-dup CLUSTER, not the document.
    A doc-level hash split puts a validation doc's near-copy in train
    — the classic eval-contamination bug; here every member of a
    connected dup component shares the component's min-id label, so
    the whole cluster lands on one side. Singleton docs split by their
    own id (equivalently: they are their own cluster).

    Deterministic (seeded md5 of the salted cluster label — no rand(),
    retry/backfill-safe: re-running on a grown corpus never moves an
    existing doc across sides unless new edges merge its cluster).
    Shuffle cost = dup_clusters' scalar label propagation + one
    left join of (id, cluster) scalars.

    Returns ``(id_col, split_unit, split)`` with split ∈ train|val.
    """
    from loggie_spark.functions.hashing import md5_60bit
    from loggie_spark.operators.dedup import dup_clusters

    clusters = dup_clusters(dup_pairs)
    unit = F.coalesce(F.col("cluster_id"), F.col(id_col))
    side = F.when(
        F.pmod(md5_60bit(F.concat(F.lit(f"{salt}|"), unit.cast("string"))), F.lit(100))
        < val_pct,
        F.lit("val"),
    ).otherwise(F.lit("train"))
    return (
        docs.select(id_col)
        .join(clusters, id_col, "left")
        .select(
            id_col,
            unit.alias("split_unit"),
            side.alias("split"),
        )
    )


def token_budget_plan(
    docs: DataFrame,
    budget_tokens: int,
    alpha: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-weighted token-budget allocation per source: the
    planning step before ``stratified_sample`` — given a total token
    budget, compute each source's share ∝ tokens^alpha (alpha<1
    flattens the mix toward small high-quality sources, the standard
    multilingual/LLM-mix trick), capped at the tokens the source
    actually has, and the resulting sampling rate.

    100 TB shape: one corpus scan -> per-source (docs, tokens)
    aggregate (map-side combine); everything after runs on the
    source-bounded table (a handful of rows), where the share
    denominator is an explicitly SORTED sequential fold so the float
    sum is bit-reproducible cross-engine (the repo's list_reduce
    pattern — never an unordered window sum).
    """
    from loggie_spark.operators.dedup import tokenize

    per_src = (
        docs.select(
            F.col(source_col).alias("source"),
            F.size(tokenize(F.col(text_col))).alias("_nt"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("tokens"),
        )
    )
    w = F.pow(F.col("tokens").cast("double"), F.lit(float(alpha)))
    weighted = per_src.withColumn("_w", w)
    # source-bounded table: collect all weights into one sorted array,
    # sequential-fold the denominator (deterministic float order)
    denom = F.aggregate(
        F.array_sort(F.collect_list("_w").over(Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        ))),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    out = weighted.withColumn("_denom", denom)
    share = F.col("_w") / F.col("_denom")
    alloc = F.least(
        F.col("tokens"),
        F.floor(share * F.lit(float(budget_tokens))).cast("long"),
    )
    rate = F.when(
        F.col("tokens") > 0,
        F.round(alloc.cast("double") / F.col("tokens"), 4),
    ).otherwise(F.lit(0.0))
    return out.select(
        "source",
        "n_docs",
        "tokens",
        F.round(share, 4).alias("share"),
        alloc.alias("alloc_tokens"),
        rate.alias("sample_rate"),
    )
