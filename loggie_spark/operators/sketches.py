"""Mergeable frequency sketches: count-min over item streams.

The exact heavy-hitter query (queries.py:th_heavy_hitters) shuffles one
row per distinct item; at 100 TB an UNBOUNDED-cardinality item domain
(urls, user agents, raw tokens) makes even that shuffle data-sized. A
count-min sketch caps the state at depth×width counters regardless of
corpus size, is mergeable by plain addition (partial aggregation IS the
merge — map-side combine gives per-task sketches that sum), and answers
point frequency queries with one-sided error: estimate ≥ true count,
and ≤ true + εN with probability 1-δ for width = ⌈e/ε⌉, depth =
⌈ln 1/δ⌉.

Hashing is the engine-agnostic seeded md5 family (functions/hashing.py)
so a DuckDB oracle rebuilds the identical sketch and estimates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loggie_spark.functions.hashing import md5_60bit


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build a count-min sketch over one row per item OCCURRENCE.

    Returns the sketch AS A TABLE ``(seed, bucket, cnt)`` of exactly
    ``depth × width`` rows (absent cells are implicit zeros) — the
    representation that makes every sketch operation a DataFrame op:
    building is one groupBy (map-side combined, so each task reduces
    its partition to ≤ depth×width partial counters before the
    shuffle); merging two sketches is ``unionByName + groupBy + sum``;
    the sketch rides a broadcast into estimate joins.
    """
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed")
    hashed = items.select(F.col(item_col).alias("_v"), seeds).select(
        "seed",
        _bucket(F.col("_v"), F.col("seed"), width).alias("bucket"),
    )
    return hashed.groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def _bucket(value: Column, seed: Column, width: int) -> Column:
    # seeded family h_i(v) = md5_60bit(str(i) || '|' || v) — the seed
    # rides in-band so one expression serves the exploded seed column.
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(seed.cast("string"), F.lit("|"), value.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    ).cast("int")


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (depth, width) — counts
    add cell-wise. This is how per-shard / per-day sketches roll up
    without touching the raw streams again."""
    return (
        a.unionByName(b)
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates: for each query item, min over the
    ``depth`` rows of its bucket counters. The sketch (≤ depth×width
    rows) is BROADCAST; the query side computes its buckets in-row and
    probes with an equi-join — no shuffle of either input.

    Returns ``(item_col, est)`` with the one-sided guarantee
    ``est ≥ true count`` (collisions only inflate).
    """
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed")
    probes = queries.select(F.col(item_col), seeds).select(
        item_col,
        "seed",
        _bucket(F.col(item_col), F.col("seed"), width).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


def bloom_build(
    items: DataFrame,
    item_col: str,
    n_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Build a Bloom filter as a table of DISTINCT set bit positions
    ``(pos)`` — membership's counterpart to :func:`cms_build`'s counter
    table. At most ``n_bits`` rows regardless of input size; merging
    two filters is ``union + distinct``; the filter broadcasts into
    probe joins. k seeded md5 positions per item (same hash family as
    the sketches and dedup indexes, so DuckDB rebuilds it exactly).

    Use it as the cheap FIRST gate of incremental dedup /
    decontamination: a Bloom miss proves non-membership (no false
    negatives), so only Bloom hits proceed to the exact digest join —
    at web scale that turns "join every shard gram against the corpus
    index" into "join the ~fp-rate fraction that might match".
    """
    seeds = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("seed")
    return (
        items.select(F.col(item_col).alias("_v"), seeds)
        .select(_bucket(F.col("_v"), F.col("seed"), n_bits).alias("pos"))
        .distinct()
    )


def bloom_maybe_contains(
    bloom: DataFrame,
    probes: DataFrame,
    item_col: str,
    n_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Append ``maybe_member`` to ``probes``: true iff ALL k bit
    positions of the item are set (the Bloom contract — false
    positives possible at ~(1-e^{-kn/m})^k, false negatives never).

    The probe stream NEVER shuffles: the set-bit table folds into a
    single-row ``word → 64-bit-mask`` map (``pos DIV 64`` plus a
    bit_or of shifted bits — ≤ n_bits/64 entries, 64× denser than the
    bit-position table), that one row broadcast-hash-joins in on a
    constant key, and each probe row tests its k positions in-row with
    ``getbit`` — no explode, no rollup, no join back. Size contract:
    the map row is n_bits/8 bytes (8 KiB at the default 2¹⁶ bits); at
    gigabit-scale filters keep n_bits ≤ ~2³⁰ so the broadcast stays
    ≤ 128 MiB. NULL probe items report false, as does every probe
    against an empty filter.
    """
    bitmap = (
        bloom.groupBy(F.expr("pos DIV 64").alias("_w"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
            ).alias("_bits")
        )
        .agg(
            F.map_from_entries(F.collect_list(F.struct("_w", "_bits"))).alias(
                "_bm"
            )
        )
        .withColumn("_one", F.lit(1))
    )
    joined = probes.withColumn("_one", F.lit(1)).join(F.broadcast(bitmap), "_one")
    item = F.col(item_col)
    checks = []
    for i in range(k):
        pos = _bucket(item, F.lit(i), n_bits).cast("long")
        word = F.try_element_at("_bm", (pos / 64).cast("long"))
        checks.append(
            F.coalesce(F.getbit(word, pos % 64) == 1, F.lit(False))
        )
    maybe = checks[0]
    for c in checks[1:]:
        maybe = maybe & c
    return joined.withColumn("maybe_member", maybe).drop("_one", "_bm")


def cms_heavy_hitters(
    items: DataFrame,
    item_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Sketch-gated EXACT heavy hitters — the composition pattern the
    sketches exist for: candidates come from the count-min estimate
    (one-sided ``est ≥ true``, so no real hitter can be missed), and
    only candidates pay the exact count (which then discards the
    sketch's false positives). The result is EXACTLY the rows of
    ``GROUP BY item HAVING count ≥ min_count`` — sketch error affects
    cost, never the answer.

    100 TB shape: the sketch is depth×width counters regardless of
    stream size (map-side combine IS the merge); the candidate set is
    bounded by N/min_count + the εN collision tail, so it broadcasts
    into a semi-join that prunes the exact aggregation to candidate
    rows only — the full-cardinality (item, count) result table of a
    naive exact query (unbounded for urls / raw tokens) never
    materializes. The distinct-item probe shuffles item values once;
    a naive exact query pays the same shuffle WITH counts attached.

    Returns ``(item_col, cnt)`` for every item with true count ≥
    ``min_count``.
    """
    sketch = cms_build(items, item_col, depth, width)
    cand = cms_estimate(
        sketch, items.select(item_col).distinct(), item_col, depth, width
    ).filter(F.col("est") >= F.lit(int(min_count)))
    return (
        items.join(F.broadcast(cand.select(item_col)), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(int(min_count)))
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (register table form)
# ---------------------------------------------------------------------------


def hll_build(
    items: DataFrame,
    item_col: str,
    p: int = 12,
) -> DataFrame:
    """HyperLogLog register table over one row per item occurrence
    (Flajolet et al. 2007): the 60-bit md5 hash splits into a ``p``-bit
    register index (top bits) and a (60-p)-bit tail whose
    leading-zero-run length+1 is the rank ρ; each register keeps its
    max ρ. State is ≤ 2^p rows of (idx, rho) scalars regardless of
    corpus size — the distinct-count member of the sketch family
    (count-min: frequencies; Bloom: membership).

    Table form makes every operation a DataFrame op: build is one
    map-side-combined max-groupBy (the partial aggregation IS the
    per-task sketch), merge is ``unionByName + groupBy max``, estimate
    rides a broadcast. The rank computes EXACTLY (no log): the tail's
    bit length is ``length(conv(tail, 10, 2))``, an integer both
    engines agree on; DuckDB's oracle uses ``bin()`` the same way.

    Spark's own ``approx_count_distinct`` is the right call inside a
    single query; this table form exists for what it cannot do — merge
    sketches ACROSS jobs/days/streams that never co-execute, persist
    them as plain parquet, and replay them in any engine.
    """
    tail_bits = 60 - p
    h = md5_60bit(F.col(item_col))
    idx = F.floor(h / F.lit(1 << tail_bits)).cast("int")
    tail = F.pmod(h, F.lit(1 << tail_bits))
    nbits = F.length(F.conv(tail, 10, 2))
    rho = F.when(tail == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits) - nbits + 1
    ).cast("int")
    return (
        items.select(idx.alias("idx"), rho.alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two register tables — max per register. Associative,
    commutative, idempotent (re-merging a shard is harmless)."""
    return a.unionByName(b).groupBy("idx").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, p: int = 12) -> DataFrame:
    """Raw HLL estimate ``E = α_m · m² / Σ_j 2^(−ρ_j)`` (empty
    registers contribute 2⁰ = 1 each). Deliberately the RAW estimator:
    the small-range LinearCounting correction needs a logarithm, whose
    last-ulp varies across libm implementations — raw keeps every step
    (1/2^ρ dyadic divisions, an idx-ordered sequential fold, one
    rational α_m) bit-reproducible in any engine, at the documented
    cost of bias below ~2.5·m distinct. Returns one row
    ``(m, n_filled, estimate)`` with the estimate rounded to 2.
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = sketch.agg(
        F.count(F.lit(1)).cast("long").alias("n_filled"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("idx", "rho"))),
            F.lit(0.0),
            # call_function: the F.shiftleft wrapper only takes an int
            # shift, but the SQL function accepts a column — the shift
            # keeps 1/2^rho an exact dyadic (pow() would round through
            # libm).
            lambda acc, s: acc
            + 1.0
            / F.call_function("shiftleft", F.lit(1).cast("long"), s["rho"]),
        ).alias("_s_filled"),
    )
    total = F.col("_s_filled") + (F.lit(m) - F.col("n_filled")).cast("double")
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        "n_filled",
        F.round(F.lit(alpha) * F.lit(float(m * m)) / total, 2).alias("estimate"),
    )
