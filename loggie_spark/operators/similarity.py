"""Similarity search over embedding columns (`array<float>`).

* :func:`brute_force_topk` — exact cosine top-k: the correctness
  baseline. Query side is broadcast; the corpus is never shuffled.
* :func:`lsh_buckets` / :func:`lsh_topk` — the scale path: sign-random-
  projection buckets shrink the candidate set, then the exact scorer
  runs per bucket. Hyperplanes are generated from an integer LCG
  formula (exact rational arithmetic) so buckets are reproducible
  across engines and runs — no RNG state to ship.

At 100 TB the corpus stays partitioned by bucket (Iceberg partition),
queries broadcast, and each executor scores only its bucket's
candidates — a classic IVF-style layout built from stock DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from loggie_spark.functions.vectors import cosine, dot, norm


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against
    the corpus, score JVM-side, per-query window top-k.

    Returns (query_id, neighbor_id, cos, rank); self-matches excluded;
    ties broken by neighbor id for determinism.
    """
    # Norms once per ROW on each side before the join (not per pair);
    # dot/(qn*cn) keeps cosine()'s exact grouping so results are
    # bit-identical.
    q = queries.select(
        F.col(q_id).alias("query_id"),
        F.col(q_vec).alias("_qv"),
        norm(F.col(q_vec)).alias("_qn"),
    )
    c = corpus.select(
        F.col(c_id).alias("neighbor_id"),
        F.col(c_vec).alias("_cv"),
        norm(F.col(c_vec)).alias("_cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 4
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# -- deterministic hyperplanes (engine-agnostic integer arithmetic) --------


def _plane_component(p: int, j: int) -> float:
    """Pseudo-random in [-0.5, 0.5) from exact integer ops: the same
    value is computable in any SQL engine (no libm, no RNG)."""
    x = ((p * 1_000_003 + j) * 2_654_435_761) % 2_000_003
    return (x % 1000) / 1000.0 - 0.5


def plane_vector(p: int, dim: int) -> list[float]:
    return [_plane_component(p, j) for j in range(dim)]


def lsh_bucket(vec: Column, n_planes: int, dim: int, plane_offset: int = 0) -> Column:
    """Sign-random-projection bucket id: bit p = (v · plane_p) >= 0.
    ``plane_offset`` selects an independent plane family (used by
    banded SRP dedup, dedup.embedding_lsh_pairs)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in plane_vector(plane_offset + p, dim)])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine + window top-k inside it. Recall is
    tunable via n_planes (fewer planes → bigger buckets → higher
    recall, more compute)."""
    q = queries.select(
        F.col(q_id).alias("query_id"),
        F.col(q_vec).alias("_qv"),
        norm(F.col(q_vec)).alias("_qn"),
        lsh_bucket(F.col(q_vec), n_planes, dim).alias("_bucket"),
    )
    c = corpus.select(
        F.col(c_id).alias("neighbor_id"),
        F.col(c_vec).alias("_cv"),
        norm(F.col(c_vec)).alias("_cn"),
        lsh_bucket(F.col(c_vec), n_planes, dim).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), ["_bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 4
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank", "_bucket")
    )


# -- IVF-flat: coarse-quantizer cells, deterministic seeding ----------------


def ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the ``n_cells`` corpus vectors
    with the smallest md5 hash of their id become the cell centroids
    (hash-seeded sampling instead of k-means — no RNG or iteration
    state to ship, bit-reproducible in any engine, and for ANN recall
    a random corpus sample is the standard zero-training quantizer).
    Returns [(cell_id, centroid)] with cell_id ordered by the hash.

    Driver-side collect is config-sized (n_cells × dim floats), not
    data-sized — same contract as the LSH hyperplane literals.
    """
    from loggie_spark.functions.hashing import md5_60bit

    rows = (
        corpus.select(
            md5_60bit(F.col(c_id).cast("string")).alias("_h"),
            F.col(c_vec).alias("_v"),
        )
        .orderBy("_h")
        .limit(n_cells)
        .collect()
    )
    return [(i, [float(x) for x in r._v]) for i, r in enumerate(rows)]


def save_centroids(
    spark, cents: list[tuple[int, list[float]]], path: str
) -> None:
    """Persist a quantizer (from :func:`ivf_centroids` or
    :func:`kmeans_refine`) as a tiny parquet table ``(cell, centroid)``.

    A standing corpus should train its quantizer ONCE and reuse it:
    without persistence every :func:`ivf_topk` call re-runs the
    corpus-wide hash-ordered TakeOrdered (or Lloyd refinement) just to
    rebuild the same few-KB centroid list. The table is n_cells rows —
    driver/executor cost of reloading is microseconds."""
    spark.createDataFrame(
        [(int(cid), [float(x) for x in cv]) for cid, cv in cents],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_centroids(spark, path: str) -> list[tuple[int, list[float]]]:
    """Load a persisted quantizer for ``ivf_topk(..., centroids=...)`` /
    ``kmeans_refine`` reuse — the second and every later query against a
    standing corpus never rescans it for centroids."""
    rows = spark.read.parquet(path).orderBy("cell").collect()
    return [(int(r.cell), [float(x) for x in r.centroid]) for r in rows]


def _cell_scores(vec: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """array<struct<cos,cid>> of rounded cosine vs every centroid —
    struct ordering gives (max cos, then max cid) argmax/sort for free.

    ``norm(vec)`` binds once per row (let_bind) instead of once per
    centroid; each centroid's own norm is an expression over literals
    that ConstantFolding evaluates at plan time. dot/(n*norm(c)) keeps
    cosine()'s exact grouping — bit-identical scores."""
    from loggie_spark.functions.gofmt import let_bind

    def scores(t: Column) -> Column:
        v, n = t["v"], t["n"]
        return F.array(
            *[
                F.struct(
                    F.round(
                        dot(v, F.array(*[F.lit(x) for x in cv]))
                        / (n * norm(F.array(*[F.lit(x) for x in cv]))),
                        4,
                    ).alias("cos"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cv in cents
            ]
        )

    return let_bind(F.struct(vec.alias("v"), norm(vec).alias("n")), scores)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: assign every corpus vector to its
    nearest centroid cell (one narrow codegen pass — the centroid set
    is a plan-time literal, zero shuffle, zero join), probe each
    query's ``nprobe`` nearest cells, exact cosine + window top-k over
    the probed candidates only.

    100 TB shape: the corpus is written partitioned by ``cell``
    (Iceberg partition column), so a query scans nprobe/n_cells of the
    data; assignment never shuffles; only the (small, broadcast) query
    side and the per-cell candidates meet. Recall tunes with nprobe.
    """
    cents = centroids or ivf_centroids(corpus, n_cells, c_id, c_vec)

    best_cell = lambda v: F.array_max(_cell_scores(v, cents)).getField(  # noqa: E731
        "cid"
    )
    c = corpus.select(
        F.col(c_id).alias("neighbor_id"),
        F.col(c_vec).alias("_cv"),
        norm(F.col(c_vec)).alias("_cn"),
        best_cell(F.col(c_vec)).alias("cell"),
    )
    # nprobe nearest cells per query: sort the scores descending by
    # (cos, cid) and take the first nprobe cell ids.
    probed = F.transform(
        F.slice(F.reverse(F.array_sort(_cell_scores(F.col(q_vec), cents))), 1, nprobe),
        lambda s: s.getField("cid"),
    )
    q = queries.select(
        F.col(q_id).alias("query_id"),
        F.col(q_vec).alias("_qv"),
        norm(F.col(q_vec)).alias("_qn"),
        F.explode(probed).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), ["cell"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 4
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank", "cell")
    )


def kmeans_refine(
    corpus: DataFrame,
    n_cells: int = 8,
    iters: int = 1,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    max_members: int | None = 4096,
    keep_vectors: bool = False,
    init_centroids: list[tuple[int, list[float]]] | None = None,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Lloyd-refined quantizer over the hash-seeded IVF init: assign
    every vector to its max-cosine centroid, recompute each centroid
    as the mean of its members, repeat ``iters`` times. The learned
    counterpart of :func:`ivf_centroids` — a couple of iterations
    noticeably tightens ANN cells on clustered corpora.

    Engine-deterministic by construction: member vectors are folded in
    ``c_id`` order (sorted collect_list + sequential aggregate), so
    every centroid coordinate is the SAME sequence of IEEE double
    additions a DuckDB ordered ``list_reduce`` performs — bit-equal
    across engines, no RNG, retry-safe. Empty cells keep their
    previous centroid (standard Lloyd handling).

    100 TB shape: per iteration one narrow assignment pass (centroid
    set is a broadcast literal, same contract as IVF/LSH) + one
    groupBy(cell) whose shuffle carries (cell, id, vector) — k·dim
    floats return to the driver, never the corpus. ``max_members``
    ENFORCES the sample-bounded training recipe: each cell's mean folds
    at most that many members (the ``max_members`` smallest by
    deterministic (md5-hash, id) order — no RNG, retry-safe), so a
    popular cell can never blow the per-group aggregation buffer at
    scale. Lloyd on a sample is the standard IVF training recipe;
    ``max_members=None`` disables the cap (exact whole-corpus mode).
    The rank window partitions by ``cell`` — the same key the mean
    aggregation groups on — so both run off ONE Exchange.

    Returns (assignments ``(c_id, cell, cos)``, final centroids).
    """
    # init_centroids (e.g. load_centroids of a persisted quantizer)
    # skips the hash-seeded init scan; with iters=0 the call is a pure
    # assignment pass against the standing quantizer — the incremental
    # shape for a new shard joining a standing corpus.
    cents = init_centroids or ivf_centroids(corpus, n_cells, c_id, c_vec)
    dim = len(cents[0][1])

    def assign(cs: list[tuple[int, list[float]]]) -> DataFrame:
        # Two getFields off ONE projected _best column (two-step select):
        # a single-expression form would evaluate the k-cosine argmax
        # twice per row (CollapseProject keeps the split — _best is
        # non-cheap and referenced twice).
        best = F.array_max(_cell_scores(F.col(c_vec), cs))
        return corpus.select(
            F.col(c_id), F.col(c_vec).alias("_v"), best.alias("_best")
        ).select(
            F.col(c_id),
            "_v",
            F.col("_best.cid").alias("cell"),
            F.col("_best.cos").alias("cos"),
        )

    from loggie_spark.functions.hashing import md5_60bit

    for _ in range(iters):
        assigned = assign(cents)
        members = assigned
        if max_members is not None:
            w = Window.partitionBy("cell").orderBy(
                md5_60bit(F.col(c_id).cast("string")), c_id
            )
            members = (
                assigned.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= max_members)
                .drop("_rk")
            )
        zero = F.array(*[F.lit(0.0) for _ in range(dim)])
        sums = (
            members.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(c_id, "_v"))),
                        lambda s: s["_v"],
                    ),
                    zero,
                    lambda acc, v: F.zip_with(
                        acc, v, lambda x, y: x + y.cast("double")
                    ),
                ).alias("s"),
            )
            .select(
                "cell", F.transform("s", lambda x: x / F.col("n")).alias("cent")
            )
            .collect()
        )
        new = {int(r.cell): [float(x) for x in r.cent] for r in sums}
        cents = [(cid, new.get(cid, cv)) for cid, cv in cents]
    final = assign(cents)
    if keep_vectors:
        # callers composing a vector-consuming stage (semdedup's pair
        # verify) reuse the assignment's projection instead of paying a
        # second corpus scan + id join to re-fetch vectors
        return final.select(c_id, F.col("_v").alias(c_vec), "cell", "cos"), cents
    return final.select(c_id, "cell", "cos"), cents


def quantize_embeddings(
    corpus: DataFrame,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Max-abs symmetric int quantization of an embedding column — the
    storage transform that shrinks a 100 TB float32 embedding table 4×
    (int8) before it lands in the ANN layout, at a bounded cosine-
    recall cost. Per vector: ``scale = max|x|``, ``q_i =
    floor(x_i·(2^{bits-1}-1)/scale)``.

    ``floor`` (not ``round``) keeps the transform bit-reproducible
    across engines: Spark rounds the shortest decimal repr HALF_UP
    while DuckDB rounds the exact binary double, so ties diverge — but
    multiply, divide and floor are all exactly-rounded IEEE ops with
    one defined result. Zero vectors quantize to zeros with scale 0.

    Pure narrow Catalyst (one projection, no shuffle, no UDF).
    Returns ``(c_id, dim, scale, q)`` with q ``array<int>``.
    """
    levels = (1 << (bits - 1)) - 1
    x = F.transform(F.col(c_vec), lambda v: v.cast("double"))
    scale = F.array_max(F.transform(x, lambda v: F.abs(v)))
    q = F.when(
        scale > 0,
        F.transform(x, lambda v: F.floor(v * levels / scale).cast("int")),
    ).otherwise(F.transform(x, lambda v: F.lit(0)))
    return corpus.select(
        F.col(c_id),
        F.size(c_vec).cast("int").alias("dim"),
        scale.alias("scale"),
        q.alias("q"),
    )
