"""Property tests: hypothesis-generated inputs, checked row-by-row
against pure-Python oracles of the reference's Go semantics. Each
example is a BATCH of rows evaluated in one Spark job, so the suite
stays fast despite exercising hundreds of generated cases.

Oracled semantics (reference citations in each test):
* maxbytes subUtf8 truncation (interceptor/maxbytes/interceptor.go:107-115)
* transformer `replace` with max-N (action/replace.go:79-84 →
  strings.Replace)
* token encode/decode UTF-8 round-trip (the input_hint contract)
* file-source multiline merge (source/file/multilines.go:115-140)
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texty = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # any non-surrogate
    max_size=24,
)


def _sub_utf8(s: str, max_bytes: int) -> str:
    """Pure-Python port of subUtf8 (maxbytes/interceptor.go:107-115):
    cut at the first rune START at/after max_bytes; if no rune start
    follows (straddling final rune), keep everything."""
    b = s.encode("utf-8")
    if len(b) <= max_bytes:
        return s
    for i in range(max_bytes, len(b)):
        if (b[i] & 0xC0) != 0x80:
            return b[:i].decode("utf-8")
    return s


@given(rows=st.lists(texty, min_size=1, max_size=40), max_bytes=st.integers(1, 9))
@settings(**SETTINGS)
def test_truncate_matches_go_subutf8(spark, rows, max_bytes):
    from loggie_spark.functions.truncate import truncate_utf8_bytes

    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(rows)])
    got = {
        r.i: r.t
        for r in df.select("i", truncate_utf8_bytes("s", max_bytes).alias("t")).collect()
    }
    for i, s in enumerate(rows):
        assert got[i] == _sub_utf8(s, max_bytes), (s, max_bytes, got[i])


@given(
    rows=st.lists(st.text(alphabet="abXY-", max_size=16), min_size=1, max_size=40),
    old=st.text(alphabet="abX", min_size=1, max_size=3),
    new=st.text(alphabet="z_", max_size=2),
    max_n=st.integers(-1, 4),
)
@settings(**SETTINGS)
def test_replace_action_matches_strings_replace(spark, rows, old, new, max_n):
    """`replace` with max (action/replace.go:79-84) ≡ Go strings.Replace
    ≡ Python str.replace(old, new, n) — leftmost non-overlapping."""
    from loggie_spark.actions import apply_program

    df = spark.createDataFrame([Row(i=i, body=s) for i, s in enumerate(rows)])
    out = apply_program(
        df, [{"action": "replace(body)", "old": old, "new": new, "max": max_n}]
    ).finish()
    got = {r.i: r.body for r in out.collect()}
    for i, s in enumerate(rows):
        assert got[i] == s.replace(old, new, max_n), (s, old, new, max_n, got[i])


@given(rows=st.lists(texty, min_size=1, max_size=40))
@settings(**SETTINGS)
def test_token_roundtrip_any_unicode(spark, rows):
    from loggie_spark.functions.tokens import decode_tokens_utf8, encode_text_to_tokens

    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(rows)])
    out = df.select(
        "i",
        decode_tokens_utf8(encode_text_to_tokens(F.col("s"))).alias("back"),
        encode_text_to_tokens(F.col("s")).alias("toks"),
    ).collect()
    for r in out:
        assert r.back == rows[r.i]
        assert r.toks == [int(b) for b in rows[r.i].encode("utf-8")]


def _multiline_oracle(
    lines: list[str], start_char: str, max_lines: int
) -> list[tuple[str, int]]:
    """Sequential fold of multilines.go:115-140: a start-marked line
    flushes; max_lines force-flushes; leading non-start lines form
    their own record. Returns (merged_body, first_offset) rows."""
    recs: list[tuple[str, int]] = []
    buf: list[str] = []
    first = 0
    for off, line in enumerate(lines):
        is_start = line.startswith(start_char)
        if buf and (is_start or len(buf) >= max_lines):
            recs.append(("\n".join(buf), first))
            buf = []
        if not buf:
            first = off
        buf.append(line)
    if buf:
        recs.append(("\n".join(buf), first))
    return recs


@given(
    lines=st.lists(st.text(alphabet="S.x", min_size=1, max_size=4), min_size=1, max_size=60),
    max_lines=st.integers(1, 5),
)
@settings(**SETTINGS)
def test_multiline_merge_matches_sequential_fold(spark, lines, max_lines):
    from loggie_spark.sources.readers import merge_multiline

    df = spark.createDataFrame(
        [Row(filename="f", offset=i, body=ln) for i, ln in enumerate(lines)]
    )
    out = merge_multiline(df, pattern="^S", max_lines=max_lines)
    got = sorted((r.offset, r.body, r.n_lines) for r in out.collect())
    want = sorted(
        (first, body, body.count("\n") + 1)
        for body, first in _multiline_oracle(lines, "S", max_lines)
    )
    assert got == want, (lines, max_lines)


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    dims=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 9)),
        max_size=15,
    ),
)
@settings(**SETTINGS)
def test_asof_join_matches_bruteforce(spark, events, dims):
    """asof_join == per-row brute force: for each event, the dim row
    with max ts <= event ts for the same key wins (ties on dim ts:
    deterministic last-in-sort of the value struct)."""
    import datetime as dt

    from loggie_spark.operators.joins import asof_join

    base = dt.datetime(2024, 1, 1)
    t = lambda m: base + dt.timedelta(minutes=m)
    ev = spark.createDataFrame(
        [(i, k, t(m)) for i, (k, m) in enumerate(events)],
        "event_id long, k long, ts timestamp",
    )
    # collapse duplicate (k, ts) dim rows like the registered query does
    # (max value), so the expected answer is single-valued
    dd = {}
    for k, m, v in dims:
        dd[(k, m)] = max(dd.get((k, m), -1), v)
    dim_rows = [(k, t(m), v) for (k, m), v in sorted(dd.items())]
    if not dim_rows:
        dim_rows = [(99, t(0), 0)]  # non-matching placeholder key
    dim = spark.createDataFrame(dim_rows, "k long, ts timestamp, v long")

    got = {r.event_id: r.v for r in asof_join(ev, dim, key="k").collect()}

    for i, (k, m) in enumerate(events):
        cands = [(mm, vv) for (kk, mm), vv in dd.items() if kk == k and mm <= m]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, m, cands)


@given(
    events=st.lists(st.integers(0, 600), min_size=1, max_size=25),
    windows=st.lists(
        st.tuples(st.integers(0, 600), st.integers(1, 200)), max_size=8
    ),
)
@settings(**SETTINGS)
def test_range_join_matches_bruteforce(spark, events, windows):
    """range_join == per-row brute force over half-open [start, end)
    containment, across arbitrary grain boundaries."""
    import datetime as dt

    from loggie_spark.operators.joins import range_join

    base = dt.datetime(2024, 1, 1)
    t = lambda m: base + dt.timedelta(minutes=m)
    ev = spark.createDataFrame(
        [(i, t(m)) for i, m in enumerate(events)], "event_id long, ts timestamp"
    )
    if not windows:
        windows = [(0, 1)]
    iv = spark.createDataFrame(
        [(j, t(s), t(s + d)) for j, (s, d) in enumerate(windows)],
        "w long, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        (r.event_id, r.w) for r in range_join(ev, iv, bucket_sec=3600).collect()
    )
    want = sorted(
        (i, j)
        for i, m in enumerate(events)
        for j, (s, d) in enumerate(windows)
        if s <= m < s + d
    )
    assert got == want


@given(
    base=st.text(alphabet="abcd efg", min_size=25, max_size=60),
    prefix=st.text(alphabet="xyz w", max_size=20),
    suffix=st.text(alphabet="pq r", max_size=20),
)
@settings(**SETTINGS)
def test_winnowing_shared_substring_guarantee(spark, base, prefix, suffix):
    """The Schleimer winnowing theorem: two documents sharing a
    substring of length ≥ k+w-1 MUST share at least one winnowed
    fingerprint (k=12, w=8 → any shared 19-char run). doc_a = base,
    doc_b = base embedded in unrelated context."""
    from loggie_spark.operators.dedup import spread_small_input  # noqa: F401
    from loggie_spark.operators.textstats import winnow_fingerprints

    k, w = 12, 8
    if len(base) < k + w - 1:
        return
    docs = spark.createDataFrame(
        [(1, base), (2, prefix + base + suffix)], "doc_id long, text string"
    )
    out = {
        r.doc_id: set(r.fps)
        for r in docs.select(
            "doc_id", winnow_fingerprints(F.col("text"), k=k, w=w).alias("fps")
        ).collect()
    }
    assert out[1] & out[2], "shared 19+-char substring yielded no shared fingerprint"


@given(
    n=st.integers(50, 400),
    split_mod=st.integers(2, 5),
    p=st.integers(4, 7),
)
@settings(**SETTINGS)
def test_hll_shard_merge_equals_global_property(spark, n, split_mod, p):
    """Any shard partitioning merges back to the global register table,
    and estimates are permutation/shard-count invariant."""
    from loggie_spark.operators.sketches import hll_build, hll_estimate, hll_merge

    items = spark.range(n).select(F.col("id").cast("string").alias("v"))
    whole = hll_build(items, "v", p=p)
    merged = None
    for r in range(split_mod):
        shard = hll_build(
            items.filter(F.col("v").cast("long") % split_mod == r), "v", p=p
        )
        merged = shard if merged is None else hll_merge(merged, shard)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
    e1 = hll_estimate(merged, p=p).collect()[0].estimate
    e2 = hll_estimate(whole, p=p).collect()[0].estimate
    assert e1 == e2


@given(kf=st.sampled_from([0.25, 0.5, 0.75]))
@settings(**SETTINGS)
def test_dsir_resample_rate_tracks_keep_fraction(spark, kf):
    """With weights pinned ≈ 1 (target == corpus), the deterministic
    Bernoulli keep rate lands near keep_fraction; and the SAME doc ids
    are kept every run (hash-draw determinism across sessions)."""
    from loggie_spark.operators.curation import dsir_resample

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 4) for i in range(400)],
        "doc_id long, text string",
    )
    out = dsir_resample(docs, docs, keep_fraction=kf).collect()
    kept = [r.doc_id for r in out if r.keep]
    rate = len(kept) / len(out)
    assert abs(rate - kf) < 0.12
    again = [r.doc_id for r in dsir_resample(docs, docs, keep_fraction=kf).collect()
             if r.keep]
    assert sorted(again) == sorted(kept)
