"""Text-analysis operators for training-data curation: language ID,
quality scoring, token counting, content fingerprinting.

All pure Catalyst expressions (regexp_count / array ops / md5) — no
Python in the hot path, all reproducible in SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loggie_spark.functions.hashing import md5_60bit
from loggie_spark.operators.dedup import tokenize

# Tiny per-language stopword lists (n-gram-heuristic langid: score a
# language by its stopword hit-rate; deterministic and SQL-portable).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}

_BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_PUNCT_REGEX = r"[^\w\s]"


def stopword_fraction(text: Column, lang: str) -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    words = tokenize(text)
    hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS[lang])))
    return F.when(F.size(words) > 0, hits.cast("double") / F.size(words)).otherwise(
        F.lit(0.0)
    )


def language_id(text: Column, threshold: float = 0.05) -> Column:
    """argmax over language stopword scores; alphabetical tie-break;
    'und' (undetermined) when the best score is below threshold."""
    langs = sorted(STOPWORDS)
    scores = [stopword_fraction(text, lg) for lg in langs]
    best = F.greatest(*scores)
    pred = F.lit("und")
    # Walk in reverse-alphabetical so the earliest language wins ties.
    for lg, sc in reversed(list(zip(langs, scores))):
        pred = F.when(sc == best, F.lit(lg)).otherwise(pred)
    return F.when(best >= threshold, pred).otherwise(F.lit("und"))


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(text, lowercase=False))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token estimate: letter runs + digit runs + each symbol
    count as one token (the standard cheap pre-tokenizer proxy)."""
    return F.regexp_count(text, F.lit(_BPE_ISH_REGEX))


def punct_ratio(text: Column) -> Column:
    return F.when(
        F.length(text) > 0,
        F.regexp_count(text, F.lit(_PUNCT_REGEX)).cast("double") / F.length(text),
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite curation score in [0,1]:
    0.4·length-saturation(words/100) + 0.3·lexical-diversity +
    0.3·(1 - punctuation-density). Deterministic, SQL-portable."""
    words = tokenize(text)
    n = F.size(words)
    length_term = F.least(n.cast("double") / 100.0, F.lit(1.0))
    diversity = F.when(
        n > 0, F.size(F.array_distinct(words)).cast("double") / n
    ).otherwise(F.lit(0.0))
    return (
        F.lit(0.4) * length_term + F.lit(0.3) * diversity + F.lit(0.3) * (1.0 - punct_ratio(text))
    )


def fingerprint_md5(text: Column) -> Column:
    """60-bit content fingerprint (engine-agnostic md5 path)."""
    return md5_60bit(text)


def winnow_fingerprints(text: Column, k: int = 12, w: int = 8) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every ``k``-char gram, slide a window of
    ``w`` consecutive hashes, keep each window's minimum — a position-
    robust sample of the document guaranteed to share a fingerprint
    with any copy of a sufficiently long substring (length ≥ k+w-1).
    The distinct min-hash set is the fingerprint.

    All in-row (O(n·w) integer ops, no shuffle); the k-gram hash array
    binds once per row as a lambda variable (let_bind) so the window
    walk references a variable, not a re-inlined n-gram hash chain.
    Engine-agnostic md5 hashes — the DuckDB oracle replays exactly.

    Shorter-than-window docs keep the single global min; empty docs an
    empty set.
    """
    from loggie_spark.functions.gofmt import let_bind

    n = F.length(text)
    grams = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    hashes = F.when(
        n >= k, F.transform(grams, lambda i: md5_60bit(text.substr(i, F.lit(k))))
    ).otherwise(F.array().cast("array<long>"))

    def windows(h: Column) -> Column:
        nh = F.size(h)
        wins = F.transform(
            F.sequence(F.lit(1), F.greatest(nh - w + 1, F.lit(1))),
            lambda j: F.array_min(F.slice(h, j, w)),
        )
        return F.array_distinct(
            F.when(nh == 0, F.array().cast("array<long>"))
            .when(nh < w, F.array(F.array_min(h)))
            .otherwise(wins)
        )

    return let_bind(hashes, windows)


def fingerprint_rolling(text: Column, mod: int = 2_147_483_647) -> Column:
    """Polynomial rolling hash over word hashes (Horner, exact integer
    arithmetic): acc = (acc·31 + h(w) mod M) mod M. Order-sensitive —
    distinguishes permuted documents, unlike the bag-of-words families."""
    words = tokenize(text)
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + F.pmod(md5_60bit(w), F.lit(mod))) % mod,
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All stats in one narrow projection (single pass, no shuffle)."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_words": token_count_ws(t),
            "n_tokens_bpe": token_count_bpe(t),
            "punct_ratio": F.round(punct_ratio(t), 4),
            "quality": F.round(quality_score(t), 4),
            "lang_pred": language_id(t),
            "fingerprint": fingerprint_md5(t),
        }
    )


# ---------------------------------------------------------------------------
# repetition / diversity signals (Gopher-style quality rules)
# ---------------------------------------------------------------------------


def dup_word_fraction(text: Column) -> Column:
    """Fraction of word occurrences that are repeats (Gopher's
    duplicate-fraction family): 1 - distinct/total. High values mark
    boilerplate/spam that per-doc dedup misses."""
    words = tokenize(text)
    n = F.size(words)
    return F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct(words)).cast("double") / n
    ).otherwise(F.lit(0.0))


def top_word_fraction(text: Column) -> Column:
    """Share of the single most frequent word — catches keyword-stuffed
    and template pages. array_sort + one run-length fold: O(n log n)
    per row inside codegen (the earlier O(distinct·n) nested filter was
    a straggler-maker on 50k-word web documents)."""
    words = F.array_sort(tokenize(text))
    n = F.size(words)

    def merge(acc: Column, w: Column) -> Column:
        run = (
            F.when(acc.getField("prev").eqNullSafe(w), acc.getField("run") + 1)
            .otherwise(F.lit(1))
        )
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc.getField("best"), run).alias("best"),
        )

    max_run = F.aggregate(
        words,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        merge,
        lambda acc: acc.getField("best"),
    )
    return F.when(n > 0, max_run.cast("double") / n).otherwise(F.lit(0.0))


def word_entropy(text: Column) -> Column:
    """Shannon entropy (bits) of the word distribution — low entropy =
    repetitive/degenerate text. Same sort + run-length fold as
    :func:`top_word_fraction` (O(n log n) per row): each closed run of
    length c contributes (c/n)·log2(c/n), identical arithmetic to the
    per-distinct-word formula the DuckDB oracle uses. abs() clamps IEEE
    -0.0 on single-word docs so both engines render 0.0."""
    words = F.array_sort(tokenize(text))
    n = F.size(words)

    # The fold must not reference any outer column (e.g. n): Catalyst
    # re-instantiates a captured expression tree PER ELEMENT, turning
    # the fold O(n²) (measured: 15s for one 20k-word doc). Accumulate
    # the self-contained Σ c·log2(c) instead and apply
    # H = log2(n) − (Σ c·log2 c)/n outside the lambda.
    def contrib(run: Column) -> Column:
        return F.when(
            run > 1, run.cast("double") * F.log2(run.cast("double"))
        ).otherwise(F.lit(0.0))

    def merge(acc: Column, w: Column) -> Column:
        same = acc.getField("prev").eqNullSafe(w)
        return F.struct(
            w.alias("prev"),
            F.when(same, acc.getField("run") + 1).otherwise(F.lit(1)).alias("run"),
            (
                acc.getField("s")
                + F.when(same, F.lit(0.0)).otherwise(contrib(acc.getField("run")))
            ).alias("s"),
        )

    s = F.aggregate(
        words,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0.0).alias("s"),
        ),
        merge,
        lambda acc: acc.getField("s") + contrib(acc.getField("run")),
    )
    ent = F.log2(n.cast("double")) - s / n
    return F.when(n > 0, F.abs(ent)).otherwise(F.lit(0.0))


def with_compression_ratio(
    df, text_col: str = "text", out_col: str = "zlib_ratio"
):
    """Gopher-style compressibility signal: ``len(zlib(text)) /
    len(text)`` per document — highly repetitive or templated text
    compresses far below prose, making this a cheap boilerplate/dup
    detector orthogonal to the word-level signals above.

    No SQL engine exposes zlib, so this is deliberately NOT in the
    oracle registry; it is the repo's reference example of a scalar
    Arrow-batched pandas UDF (the pattern for any signal that needs a
    Python library): one narrow pass, vectorized per batch, payload
    never shuffles. Empty/NULL text yields NULL.
    """
    import zlib

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def one(t):
        if t is None or len(t) == 0:
            return None
        b = t.encode("utf-8")
        return len(zlib.compress(b, 6)) / len(b)

    # lambda (no annotations): `from __future__ import annotations`
    # stringifies hints, which pandas_udf cannot resolve for local
    # pd.Series references.
    ratio = pandas_udf(lambda texts: texts.map(one), "double")

    return df.withColumn(out_col, F.round(ratio(F.col(text_col)), 4))


def pseudo_model_weights(n_buckets: int = 1024, seed: int = 7) -> list[int]:
    """Deterministic int-quantized stand-in for a trained linear model:
    w[b] = md5_60bit(f"{seed}|{b}") % 201 - 100 ∈ [-100, 100]. Computed
    with hashlib to the exact md5_60bit spelling, so Spark, DuckDB and
    the driver all derive the identical vector."""
    import hashlib

    return [
        int(hashlib.md5(f"{seed}|{b}".encode()).hexdigest()[:15], 16) % 201 - 100
        for b in range(n_buckets)
    ]


def hashed_linear_score(
    docs: DataFrame,
    weights: list[int] | None = None,
    n_buckets: int = 1024,
    seed: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed-feature linear classifier inference — the fasttext-style
    quality-filter scoring pass, with int-quantized weights so the
    score is exact integer arithmetic (cross-engine reproducible, no
    float-sum ordering).

    100 TB shape: the model rides the PLAN as ONE array literal
    (n_buckets ints — the quantized-model-broadcast path), each doc
    folds its hashed words through element_at in-row: zero joins, zero
    shuffles, whole plan narrow. A real trained model drops in via
    ``weights``; the default is :func:`pseudo_model_weights`.
    """
    from loggie_spark.operators.dedup import _materialize

    if weights is None:
        weights = pseudo_model_weights(n_buckets, seed)
    if len(weights) != n_buckets:
        raise ValueError(f"weights must have n_buckets={n_buckets} entries")
    wlit = F.lit(weights)
    step = _materialize(
        docs, {"_ws": tokenize(F.coalesce(F.col(text_col), F.lit("")))}
    )
    contrib = F.transform(
        F.col("_ws"),
        lambda w: F.element_at(
            wlit, (F.pmod(md5_60bit(w), F.lit(n_buckets)) + 1).cast("int")
        ),
    )
    score = F.aggregate(
        contrib, F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
    )
    out = step.select(
        id_col,
        F.size("_ws").cast("int").alias("n_words"),
        score.alias("score"),
    )
    spt = F.when(
        F.col("n_words") > 0,
        F.round(F.col("score").cast("double") / F.col("n_words"), 4),
    ).otherwise(F.lit(0.0))
    return out.withColumn("score_per_token", spt)
