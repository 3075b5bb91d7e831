"""Training-data curation operators beyond dedup: benchmark
decontamination and PII redaction.

Both are standard steps in large-scale LLM data pipelines (the
reference engine has no analog — these extend the training-data
surface the same way dedup/similarity do). Everything stays JVM-side
Catalyst: tokenize/shingle with built-in array functions, match with a
broadcast semi-join, redact with regexp_replace chains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loggie_spark.operators.dedup import spread_small_input, tokenize, word_ngrams


# ---------------------------------------------------------------------------
# test-set decontamination
# ---------------------------------------------------------------------------


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    bench_text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training docs that share any word ``n``-gram with a
    benchmark/test set (GPT-3-style 13-gram decontamination).

    100 TB shape: the benchmark side is small by construction (eval
    sets are thousands of rows, not billions), so its distinct n-gram
    set is BROADCAST; the corpus side explodes its n-grams and
    LEFT SEMI joins — the corpus is never shuffled on data, only a
    narrow (id, gram) stream meets a broadcast hash table, and the
    semi-join stops at the first matching gram per row group. Docs
    shorter than ``n`` words contribute their whole text as a single
    shingle (word_ngrams' short-doc branch), so an exact short-doc
    match still counts as contamination.

    Returns (id_col, contaminated:boolean) for every doc.
    """
    grams = lambda c: word_ngrams(tokenize(F.col(c)), n)  # noqa: E731
    bench_grams = (
        benchmark.select(F.explode(grams(bench_text_col)).alias("gram")).distinct()
    )
    doc_grams = spread_small_input(docs).select(
        F.col(id_col), F.explode(grams(text_col)).alias("gram")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col, F.coalesce("contaminated", F.lit(False)).alias("contaminated")
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Deliberately conservative, engine-portable patterns (no lookaround —
# must run identically under Java regex and any SQL engine's RE2-style
# matcher). Order matters: emails before bare domains would, IPs before
# bare number runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ -]\d{2,4}[ -]\d{3,4}[ -]\d{3,4}", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii(text: Column, kinds: list[str] | None = None) -> Column:
    """Mask PII spans in ``text`` with typed placeholders.

    A chain of ``regexp_replace`` — whole-stage-codegen resident, one
    pass per pattern over the string, zero Python. ``kinds`` subsets
    ``PII_PATTERNS`` by name (default: all, in declaration order).
    """
    out = text
    for name, pat, repl in PII_PATTERNS:
        if kinds is not None and name not in kinds:
            continue
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII hit counts per kind + the redacted text — the audit
    frame a curation pass writes next to the cleaned corpus."""
    cols = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, pat, _ in PII_PATTERNS
    ]
    return df.select(
        "*", *cols, redact_pii(F.col(text_col)).alias("redacted")
    )


# ---------------------------------------------------------------------------
# span-level dedup (C4-style repeated-span removal)
# ---------------------------------------------------------------------------


def span_dedup(
    docs: DataFrame,
    span_words: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style span-level dedup: slice every document into
    non-overlapping ``span_words``-word spans, keep exactly ONE
    occurrence of each duplicated span corpus-wide (the one with the
    lexicographically smallest ``(doc_id, pos)``), and rebuild each
    document from its surviving spans. C4 does this with three-sentence
    spans; this corpus has no sentence structure, so the span unit is a
    fixed word window — the semantics (corpus-global span-occurrence
    dedup + in-place document reconstruction) are the same.

    100 TB shape — the span TEXT never rides a shuffle:

    1. spans are hashed to 60-bit ints in-row (md5 family, so the
       DuckDB oracle reproduces the dedup decision bit-exactly);
       only ``(doc_id, pos, h)`` scalars shuffle into the keeper
       aggregation (map-side combine on ``h``);
    2. the keeper per span value is ``min(struct(doc_id, pos))`` —
       deterministic, retry-safe;
    3. surviving positions fold back to one ``array<int>`` per doc
       (scalar shuffle), and the document is REBUILT by re-slicing the
       original word array in a narrow projection after a single
       co-located join of the corpus against the (id, positions)
       frame — small enough for AQE to broadcast at moderate scale.

    Returns ``(id_col, n_spans, n_kept, clean_hash)`` where
    ``clean_hash`` is the md5 of the reconstructed text.
    """
    from loggie_spark.functions.hashing import md5_60bit

    docs = spread_small_input(docs)
    k = span_words
    words = tokenize(F.col(text_col))
    n_spans = F.ceil(F.size(words) / F.lit(k)).cast("int")
    pos_seq = F.when(
        F.size(words) > 0, F.sequence(F.lit(0), n_spans - 1)
    ).otherwise(F.array().cast("array<int>"))
    occ = docs.select(
        F.col(id_col), words.alias("_w"), F.explode(pos_seq).alias("pos")
    ).select(
        id_col,
        "pos",
        md5_60bit(
            F.array_join(F.slice("_w", F.col("pos") * k + 1, F.lit(k)), " ")
        ).alias("h"),
    )
    # The keeper rows ARE the kept occurrences — one (doc_id, pos) per
    # distinct span hash — so no join-back against occ is needed: fold
    # them straight into per-doc position arrays. Two scalar shuffles
    # total for the whole dedup decision.
    keeper = occ.groupBy("h").agg(
        F.min(F.struct(id_col, "pos")).alias("k")
    )
    kept_pos = (
        keeper.select(
            F.col(f"k.{id_col}").alias(id_col), F.col("k.pos").alias("pos")
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("kp"))
    )
    words2 = tokenize(F.col(text_col))
    kp = F.coalesce(F.col("kp"), F.array().cast("array<int>"))
    clean = F.array_join(
        F.flatten(
            F.transform(kp, lambda j: F.slice(words2, j * k + 1, F.lit(k)))
        ),
        " ",
    )
    return (
        docs.select(id_col, text_col)
        .join(kept_pos, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.ceil(F.size(words2) / F.lit(k)).cast("int"), F.lit(0)).alias(
                "n_spans"
            ),
            F.coalesce(F.size("kp"), F.lit(0)).cast("int").alias("n_kept"),
            F.md5(clean).alias("clean_hash"),
        )
    )


# ---------------------------------------------------------------------------
# corpus-level boilerplate detection (repeated n-gram fraction)
# ---------------------------------------------------------------------------


def boilerplate_fraction(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc fraction of word ``n``-grams that occur in at least
    ``min_docs`` DISTINCT documents — the C4/CCNet-style boilerplate
    signal (navbars, cookie banners, license headers repeat across
    pages; prose doesn't). High fraction = template page.

    100 TB shape: grams are hashed to 60-bit ints (md5 family — the
    engine-agnostic choice so the DuckDB oracle reproduces counts
    bit-exactly) and de-duplicated per doc BEFORE the explode, so the
    document-frequency aggregation shuffles only (hash) scalars with
    map-side combine, and the hit join shuffles (id, hash) pairs —
    text never rides a shuffle. Two scalar shuffles total; no
    broadcast assumption on the common-gram side (boilerplate sets
    can be huge at web scale), so the join degrades safely to a
    shuffle join and AQE broadcasts it when it is small.

    Returns (id_col, n_grams, n_common, boilerplate_frac) per doc.
    """
    from loggie_spark.functions.hashing import md5_60bit

    gram_hashes = F.array_distinct(
        F.transform(
            word_ngrams(tokenize(F.col(text_col)), n), lambda g: md5_60bit(g)
        )
    )
    docs = spread_small_input(docs)
    per_doc = docs.select(
        F.col(id_col), F.explode(gram_hashes).alias("gh")
    )
    common = (
        per_doc.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .filter(F.col("df_count") >= min_docs)
        .select("gh")
    )
    hits = (
        per_doc.join(common, "gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    totals = docs.select(F.col(id_col), F.size(gram_hashes).alias("n_grams"))
    return totals.join(hits, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
        F.when(
            F.col("n_grams") > 0,
            F.round(
                F.coalesce("n_common", F.lit(0)).cast("double") / F.col("n_grams"), 4
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("boilerplate_frac"),
    )


# ---------------------------------------------------------------------------
# URL / domain filtering (CCNet/RefinedWeb-style source gating)
# ---------------------------------------------------------------------------

URL_RE = r"https?://([A-Za-z0-9.-]+)(/[^\s]*)?"


def domain_filter(
    docs: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Web-curation source gating: extract every URL's registrable
    domain from the text, flag documents that cite a blocklisted
    domain — the first stage of CCNet/RefinedWeb-style pipelines
    (filter by where the text came from / what it links to, before
    any content scoring).

    Pure codegen: one ``regexp_extract_all`` per row for the domains
    (no Python), and the blocklist — inherently a curated, bounded
    list — compiles to an in-row ``arrays_overlap`` against a literal
    array, so there is no join at all; at the 10⁶-domain blocklist
    scale you swap the literal for a broadcast join on the exploded
    domain column (same frame shape).

    Returns ``(id_col, n_urls, domains, blocked)``.
    """
    domains = F.array_distinct(
        F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(1))
    )
    n_urls = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(0))
    )
    block = F.array(*[F.lit(d) for d in blocklist])
    return docs.select(
        F.col(id_col),
        n_urls.cast("int").alias("n_urls"),
        F.array_sort(domains).alias("domains"),
        F.arrays_overlap(domains, block).alias("blocked"),
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score each raw document by how
    target-like its hashed-bigram features are, for importance-weighted
    selection of a raw corpus toward a small target domain.

    Feature model: word bigrams hashed into ``n_buckets`` buckets
    (engine-agnostic md5 family) with add-one smoothing on both the
    target and raw unigram-of-bucket distributions. The per-doc score
    is the MEAN of its buckets' smoothed probability ratios
    ``((c_T+1)·(N_R+B)) / ((c_R+1)·(N_T+B))`` — a rational surrogate of
    DSIR's mean log-likelihood ratio: same feature model and the same
    ordering direction (target-like buckets score > 1, raw-typical
    buckets < 1), but every arithmetic step is exact-integer products
    and one IEEE division, so DuckDB reproduces the score bit-for-bit
    where ``ln`` could drift an ulp. At production scale flip to
    log-space sums (cross-engine parity is not a constraint there) and
    mind the c·N integer products against 2^53.

    100 TB shape: the raw corpus reduces to (id, bucket) scalar pairs
    in-row; bucket-count aggregations are map-side combined and
    B-bounded; the model (≤ n_buckets rows) is BROADCAST into the score
    join; the two corpus totals are config-sized driver scalars. Text
    never shuffles. Returns ``(id_col, n_feats, dsir_score)`` — docs
    with no bigrams score NULL.
    """
    from loggie_spark.functions.hashing import md5_60bit
    from loggie_spark.operators.dedup import _materialize

    def pairs(frame: DataFrame) -> DataFrame:
        base = _materialize(
            spread_small_input(frame).select(id_col, text_col),
            {"_w": tokenize(F.col(text_col))},
        )
        w = F.col("_w")
        bigrams = F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(w, i), F.element_at(w, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return base.select(
            F.col(id_col), F.explode(bigrams).alias("_bg")
        ).select(
            id_col, F.pmod(md5_60bit(F.col("_bg")), F.lit(n_buckets)).alias("_b")
        )

    raw_pairs = pairs(docs)
    tgt_pairs = pairs(target)
    c_r = raw_pairs.groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
    c_t = tgt_pairs.groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
    # Corpus totals roll up from the ALREADY-AGGREGATED bucket counts
    # (N_R = Σ_b c_R(b), each bucket appears exactly once in the
    # full-outer join) as global window sums OVER THE MODEL FRAME —
    # NOT a pair of .count() actions, each of which would re-execute
    # the tokenize/explode lineage over the full corpus. The raw
    # corpus is scanned exactly once per side this way, and the
    # single-partition window is over the B-bounded model
    # (≤ n_buckets rows by construction), never over data.
    from pyspark.sql import Window

    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n_r = F.sum(F.coalesce("_cr", F.lit(0))).over(w_all)
    n_t = F.sum(F.coalesce("_ct", F.lit(0))).over(w_all)
    model = (
        c_r.join(c_t, "_b", "full_outer")
        .select(
            "_b",
            (
                (F.coalesce("_ct", F.lit(0)) + 1).cast("double")
                * (n_r + F.lit(n_buckets)).cast("double")
                / (
                    (F.coalesce("_cr", F.lit(0)) + 1).cast("double")
                    * (n_t + F.lit(n_buckets)).cast("double")
                )
            ).alias("_r"),
        )
    )
    scored = (
        raw_pairs.join(F.broadcast(model), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_feats"),
            F.round(
                F.aggregate(
                    F.sort_array(F.collect_list("_r")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.count(F.lit(1)),
                4,
            ).alias("dsir_score"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            "dsir_score",
        )
    )


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    keep_fraction: float = 0.5,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR's SELECTION step (Xie et al. 2023 §3: importance
    resampling): keep each raw document with probability proportional
    to its importance weight — here the deterministic distributed
    form, Poisson/Bernoulli sampling with ``p_i = min(1,
    keep_fraction · w_i)`` against a per-doc uniform draw ``u_i``
    derived from a salted id hash (md5/2⁶⁰). No RNG, no global
    aggregate: retry- and engine-reproducible row by row, and the
    expected keep rate tracks ``keep_fraction`` because the weight
    mean sits near 1 by construction (smoothed probability ratios).

    Deliberately NOT normalized by Σw: a corpus-wide double sum folds
    in partition order, which would make the threshold
    nondeterministic across runs and engines. The unnormalized form
    keeps every arithmetic step per-row IEEE-exact (multiply +
    compare of bit-identical doubles).

    Docs with no scorable features (NULL weight) are out-of-domain by
    definition and dropped. Returns ``(id_col, n_feats, dsir_score,
    keep)``.
    """
    from loggie_spark.functions.hashing import md5_60bit

    w = dsir_weights(docs, target, n_buckets, text_col, id_col)
    u = md5_60bit(
        F.concat(F.lit("dsir:"), F.col(id_col).cast("string"))
    ) / F.lit(float(1 << 60))
    p = F.least(F.lit(1.0), F.lit(float(keep_fraction)) * F.col("dsir_score"))
    return w.select(
        id_col,
        "n_feats",
        "dsir_score",
        F.when(F.col("dsir_score").isNull(), F.lit(False))
        .otherwise(u < p)
        .alias("keep"),
    )


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    delim: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet/Dolma-style boilerplate LINE removal: any line whose exact
    text occurs in ``min_docs`` or more DISTINCT documents is dropped
    from EVERY document (nav bars, cookie banners, "all rights
    reserved" footers). This differs from :func:`span_dedup` on both
    axes: the unit is a natural line (``delim``-separated), not a
    fixed-width span, and a duplicated line keeps NO occurrence at all
    — boilerplate carries no training signal anywhere, whereas span
    dedup keeps the first copy.

    100 TB shape: lines hash to 60-bit ints IN-ROW, so the document-
    frequency aggregation and the anti-join shuffle only (id, pos,
    hash) scalars — line text never rides a shuffle; the reassembly
    re-reads each survivor line from the document's OWN line array
    (one co-keyed join on id). df counting is distinct-(doc, hash)
    first, then a map-side-combinable count.

    Returns ``(id_col, n_lines, n_kept, clean_hash)`` where clean_hash
    is the md5 of the surviving lines re-joined with ``delim`` (the
    compact cross-engine contract; callers wanting the text itself
    re-join in the same way).
    """
    import re as _re

    from loggie_spark.functions.hashing import md5_60bit
    from loggie_spark.operators.dedup import _materialize

    base = _materialize(
        spread_small_input(docs).select(id_col, text_col),
        {"_ls": F.split(F.col(text_col), _re.escape(delim))},
    )
    occ = base.select(
        F.col(id_col), F.posexplode("_ls").alias("pos", "_line")
    ).select(id_col, "pos", md5_60bit(F.col("_line")).alias("_h"))
    boiler = (
        occ.select(id_col, "_h")
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= F.lit(int(min_docs)))
        .select("_h")
    )
    kept = (
        occ.join(boiler, "_h", "left_anti")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("_keep"))
    )
    empty = F.array().cast("array<int>")
    keep = F.coalesce("_keep", empty)
    return base.join(kept, id_col, "left").select(
        id_col,
        F.size("_ls").cast("int").alias("n_lines"),
        F.size(keep).cast("int").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(keep, lambda p: F.element_at(F.col("_ls"), p + 1)),
                delim,
            )
        ).alias("clean_hash"),
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, appendix A1 — the
    heuristic filter battery most open LLM corpora reuse): word-count
    bounds, mean word length bounds, symbol-to-word ratio ('#' and
    '...'), fraction of words containing a letter, and the stopword
    presence test. Emits every signal plus the combined ``passes``
    verdict so pipelines can audit which rule fired.

    All signals are single-pass Catalyst expressions over the in-row
    word array (narrow, codegen, zero shuffle); ratios are exact
    integer counts with ONE IEEE division rounded to 4, so the DuckDB
    oracle reproduces every value bit-for-bit.

    Returns ``(id_col, n_words, mean_word_len, symbol_ratio,
    alpha_frac, stop_hits, passes)``.
    """
    from loggie_spark.operators.dedup import _materialize

    base = _materialize(
        docs.select(id_col, text_col), {"_w": tokenize(F.col(text_col))}
    )
    w = F.col("_w")
    n = F.size(w)
    nd = n.cast("double")
    t = F.col(text_col)
    chars = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_len = F.when(n > 0, F.round(chars / nd, 4)).otherwise(F.lit(0.0))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = F.when(
        n > 0, F.round((n_hash + n_ellipsis) / nd, 4)
    ).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    alpha_frac = F.when(n > 0, F.round(n_alpha / nd, 4)).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(w), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    )
    out = base.select(
        id_col,
        n.cast("int").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.cast("int").alias("stop_hits"),
    )
    passes = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return out.withColumn("passes", passes)


def html_to_text(html: Column) -> Column:
    """Web-page → training-text extraction, the first step of every
    CommonCrawl-style pipeline: drop <script>/<style> subtrees
    wholesale (their content is code, not language), strip remaining
    tags, decode the half-dozen entities that dominate real HTML, and
    collapse whitespace runs. A chain of regexp_replace — whole-stage
    codegen, zero Python, and the same RE2-compatible patterns run
    verbatim in the DuckDB oracle ((?is) inline flags, no lookaround).

    Deliberately NOT a full HTML5 parser (tag soup recovery,
    conditional comments): the 100 TB path needs a predictable linear
    pass; pages needing DOM-accurate extraction route to a boilerplate
    model downstream (see gopher/ccnet gates).
    """
    # two patterns, not one with a </\1> backreference: RE2 (DuckDB)
    # has no backreferences, and the oracle runs these verbatim
    out = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]+>", " ")
    for ent, rep in [
        ("&nbsp;", " "),
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
    ]:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))
