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
