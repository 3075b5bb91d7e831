"""Distributed BPE merge training and encoding.

The most token-centric operator in the training-data surface: learn a
byte-pair-encoding merge table from the corpus (Sennrich et al. 2016)
and apply it to produce subword tokens. No reference-engine analog
(loggie has no tokenizer) — this extends the curation surface the same
way dedup/similarity do.

100 TB design:
- the corpus is scanned ONCE (word counts, map-side combine — the
  shuffle carries one row per distinct word);
- every merge iteration runs over the word-count table capped to the
  ``top_words`` most frequent words (Zipf: the cap carries ~all pair
  mass), so iteration state is vocab-bounded and corpus-size-
  independent — ``localCheckpoint`` per iteration keeps the plan flat;
- per iteration the driver collects exactly ONE row (the argmax pair:
  config-sized, the same contract as the manifest/centroid collects);
- encoding broadcasts the merge list (``n_merges`` entries) into one
  Arrow-batched pandas UDF pass — narrow, zero shuffle.

Determinism: pair argmax breaks ties by (count DESC, left ASC, right
ASC); the within-word merge application is a left-to-right greedy fold
(overlapping occurrences resolve leftmost-first: 'aaa' + (a,a) ->
[aa, a]). Both are reproduced exactly by the DuckDB oracle's unrolled
CTE stages (queries.py generates one stage per merge).
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from loggie_spark.operators.dedup import spread_small_input, tokenize

MERGE_SCHEMA = "rank INT, left STRING, right STRING, merged STRING, pair_count BIGINT"


def _chars(word):
    # one-char-per-element split; words are non-empty by construction
    # (tokenize filters ''), so sequence(1, n) never descends
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )


def _adjacent_pairs(syms):
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda j: F.struct(
                F.element_at(syms, j).alias("l"),
                F.element_at(syms, j + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _merge_fold(syms, left: str, right: str, merged: str):
    """Left-to-right greedy single-pass merge of (left,right)->merged.

    CASE branches evaluate lazily, so element_at(acc, -1) never probes
    an empty accumulator (ANSI-safe); slice(acc, 1, 0) on a 1-element
    accumulator is the legal empty slice.
    """
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.size(acc) == 0, F.array(x))
        .when(
            (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        )
        .otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 6,
    top_words: int = 4096,
    text_col: str = "text",
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table as a list of dicts (rank, left, right, merged, pair_count) —
    driver-sized by construction (``n_merges`` entries)."""
    words = (
        spread_small_input(docs)
        .select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(top_words)
    )
    state = words.select(
        _chars(F.col("word")).alias("syms"), F.col("cnt")
    ).localCheckpoint(eager=True)

    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        best = (
            state.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "cnt")
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], best[0]["c"]
        merged = left + right
        merges.append(
            {
                "rank": rank,
                "left": left,
                "right": right,
                "merged": merged,
                "pair_count": int(cnt),
            }
        )
        state = state.select(
            _merge_fold(F.col("syms"), left, right, merged).alias("syms"),
            "cnt",
        ).localCheckpoint(eager=True)
    return merges


def bpe_train_df(
    docs: DataFrame,
    n_merges: int = 6,
    top_words: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """``bpe_train`` as a DataFrame (the queryable/sinkable shape)."""
    spark = docs.sparkSession
    rows = bpe_train(docs, n_merges=n_merges, top_words=top_words, text_col=text_col)
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["pair_count"]) for m in rows],
        schema=MERGE_SCHEMA,
    )


def _encode_word(word: str, merges: list[tuple[str, str, str]]) -> list[str]:
    toks = list(word)
    for left, right, merged in merges:
        out: list[str] = []
        for t in toks:
            if out and out[-1] == left and t == right:
                out[-1] = merged
            else:
                out.append(t)
        toks = out
    return toks


def bpe_encode(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table: (id, n_tokens, tokens) per doc,
    ``tokens`` space-joined for a stable cross-engine shape. One
    Arrow-batched pandas UDF pass, merge list broadcast as a closure
    constant (n_merges entries) — narrow, zero shuffle; the greedy fold
    is byte-identical to training's within-word merge semantics."""
    mlist = [(m["left"], m["right"], m["merged"]) for m in merges]

    def enc_batch(texts):
        # per-batch word memoization (same trick as tokenizer_fertility):
        # the Zipf word distribution means most words repeat within a
        # batch, so each distinct word runs the greedy merge fold once
        cache: dict = {}

        def enc(t):
            toks = []
            for w in (t or "").lower().split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, mlist)
                toks.extend(got)
            return " ".join(toks)

        return texts.map(enc)

    # lambda-style (no annotations): annotated defs would need pd.Series
    # hints, and stringified hints break pandas_udf inference
    encode_series = pandas_udf(enc_batch, "string")

    out = spread_small_input(docs).select(
        F.col(id_col), encode_series(F.col(text_col)).alias("tokens")
    )
    return out.select(
        id_col,
        F.when(F.col("tokens") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("tokens"), " ")))
        .cast("int")
        .alias("n_tokens"),
        "tokens",
    )


def tokenizer_fertility(
    docs: DataFrame,
    merges: list[dict],
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-fertility audit: subword tokens per whitespace word
    under a learned merge table, aggregated per corpus group — the
    standard pre-training check for which sources a tokenizer serves
    poorly (high fertility = more sequence length spent per word).

    100 TB shape: one Arrow-batched pandas UDF pass computes each doc's
    subword count in-row (merge list rides the closure; per-batch word
    memoization exploits the Zipf word distribution), word counts are
    pure Catalyst, and the only shuffle is the |groups|-row aggregate.
    Returns ``(group_col, n_docs, n_words, n_subwords, fertility)``
    with fertility = subwords/word rounded to 4 places; groups whose
    docs have no words report fertility 0.0.
    """
    mlist = [(m["left"], m["right"], m["merged"]) for m in merges]

    def n_subwords(t):
        cache: dict = {}
        total = 0
        for w in (t or "").lower().split():
            got = cache.get(w)
            if got is None:
                got = cache[w] = len(_encode_word(w, mlist))
            total += got
        return total

    # lambda (no annotations): annotated defs would need pd.Series
    # hints, and stringified hints break pandas_udf inference
    subw = pandas_udf(lambda texts: texts.map(n_subwords), "long")

    per_doc = spread_small_input(docs).select(
        F.col(group_col),
        F.size(tokenize(F.coalesce(F.col(text_col), F.lit(""))))
        .cast("long")
        .alias("_nw"),
        subw(F.col(text_col)).alias("_ns"),
    )
    agg = per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nw").alias("n_words"),
        F.sum("_ns").alias("n_subwords"),
    )
    fert = F.when(
        F.col("n_words") > 0,
        F.round(F.col("n_subwords").cast("double") / F.col("n_words"), 4),
    ).otherwise(F.lit(0.0))
    return agg.select(
        group_col, "n_docs", "n_words", "n_subwords", fert.alias("fertility")
    )
