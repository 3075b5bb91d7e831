from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from loggie_spark.functions.tokens import decode_tokens_arrow
from loggie_spark.sources.arrow_reader import read_sequences_arrow


def _collect_sorted(df):
    return sorted(
        (tuple(r) for r in df.select("doc_id", "n_tok", "source", "body").collect())
    )


def test_arrow_reader_matches_standard_decode(spark, tmp_path):
    """The pyarrow in-task reader is bit-exact with the default
    spark.read.parquet + decode_tokens_arrow path, including multi-byte
    UTF-8 and empty sequences."""
    lines = [
        "GET /index HTTP/1.1 200 123",
        "",
        "naïve café — ünïcode ✓",
        '{"level":"warn","msg":"x"}',
        "plain ascii line " * 10,
    ]
    rows = [
        Row(
            doc_id=f"doc-{i:04d}",
            tokens=[int(b) for b in t.encode("utf-8")],
            n_tok=len(t.encode("utf-8")),
            source=f"svc-{i % 3}",
        )
        for i, t in enumerate(lines * 40)
    ]
    path = str(tmp_path / "seq")
    spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    ).repartition(3).write.parquet(path)

    via_arrow = read_sequences_arrow(spark, path)
    via_jvm = decode_tokens_arrow(
        spark.read.parquet(path), "tokens", "body", keep_tokens=False
    ).select("doc_id", "n_tok", "source", "body")
    assert _collect_sorted(via_arrow) == _collect_sorted(via_jvm)


def test_arrow_reader_null_tokens_and_keep(spark, tmp_path):
    rows = [
        Row(doc_id="a", tokens=[104, 105], n_tok=2, source="s"),
        Row(doc_id="b", tokens=None, n_tok=0, source="s"),
        Row(doc_id="c", tokens=[], n_tok=0, source="t"),
    ]
    path = str(tmp_path / "seq2")
    spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    ).coalesce(1).write.parquet(path)

    got = {
        r.doc_id: r
        for r in read_sequences_arrow(spark, path, keep_tokens=True).collect()
    }
    assert got["a"].body == "hi" and got["a"].tokens == [104, 105]
    assert got["b"].body is None and got["b"].tokens is None
    assert got["c"].body == "" and got["c"].tokens == []
