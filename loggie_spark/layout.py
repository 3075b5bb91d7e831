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

import json

from pyspark.sql import DataFrame


def _hadoop_path(spark, uri: str):
    """(FileSystem, Path) for ``uri`` through the Hadoop FS API — the
    same resolution the writers use, so commit markers land wherever
    the data does (local file://, hdfs://, s3a://...), instead of a
    local open() that would write a bogus './s3:/...' directory after
    an object-store export."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def write_json_marker(spark, dir_uri: str, name: str, payload: dict) -> None:
    """Write ``payload`` as ``dir_uri/name`` through the Hadoop
    FileSystem API: tmp file first, then delete+rename — atomic on
    posix/HDFS, last-writer-wins on object stores (where the marker's
    EXISTENCE is still the commit signal, because the tmp name never
    matches a reader's probe)."""
    data = json.dumps(payload, indent=2, sort_keys=True).encode()
    base = dir_uri.rstrip("/")
    fs, tmp = _hadoop_path(spark, f"{base}/{name}.tmp")
    _, dest = _hadoop_path(spark, f"{base}/{name}")
    out = fs.create(tmp, True)
    try:
        out.write(data)
    finally:
        out.close()
    fs.delete(dest, False)
    if not fs.rename(tmp, dest):
        raise IOError(f"could not commit {dest}")


def read_json_marker(spark, dir_uri: str, name: str) -> dict | None:
    """Read ``dir_uri/name`` back through the Hadoop FS API; None when
    absent (= aborted export for a commit marker)."""
    fs, dest = _hadoop_path(spark, f"{dir_uri.rstrip('/')}/{name}")
    if not fs.exists(dest):
        return None
    stream = fs.open(dest)
    try:
        raw = bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(raw.decode())


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


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    max_records_per_file: int = 1_000_000,
) -> dict:
    """Export the final curated corpus as training shards with a
    data-first / manifest-last commit protocol — the step a curation
    pipeline ends with before the trainer reads the data.

    Layout: parquet partitioned by ``shard_col`` (one directory per
    shard, file sizes bounded by ``max_records_per_file``), plus a
    ``_manifest.json`` at the root written only AFTER every shard
    landed. The manifest records per-shard row counts, token totals
    and an ORDER-INSENSITIVE content fingerprint (bit-XOR of 60-bit id
    hashes — associative and commutative, so any task/file order yields
    the same value, and unlike a sum it can never overflow long under
    ANSI mode; an id swapped for another flips the fingerprint, while a
    doubled id is caught by the row count), letting a consuming job
    verify completeness
    without re-reading payloads. Readers must treat a directory
    without a manifest as an aborted export.

    One shuffle (repartition by shard so each shard writes from its
    own tasks). The manifest is aggregated FROM THE PARQUET ACTUALLY
    WRITTEN (a re-read of out_dir), never by re-evaluating the input
    frame — with a nondeterministic upstream (shuffle-order-sensitive
    ops, task retries, source mutation between the two actions) a
    second evaluation could certify data the export never contained.
    The marker itself goes through the Hadoop FileSystem API, so the
    commit works against whatever filesystem the data landed on
    (file://, hdfs://, s3a://). Returns the manifest dict.
    """
    from pyspark.sql import functions as F

    from loggie_spark.functions.hashing import md5_60bit

    spark = df.sparkSession
    staged = df.repartition(F.col(shard_col))
    staged.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    ).partitionBy(shard_col).parquet(out_dir)

    per_shard = (
        spark.read.parquet(out_dir)
        .groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.sum(len_col).cast("long").alias("tokens"),
            F.bit_xor(md5_60bit(F.col(id_col).cast("string")))
            .cast("long")
            .alias("fingerprint"),
        )
        .orderBy(shard_col)
        .collect()
    )
    manifest = {
        "shards": {
            str(r[shard_col]): {
                "rows": r.rows,
                "tokens": r.tokens,
                "fingerprint": r.fingerprint,
            }
            for r in per_shard
        },
        "total_rows": int(sum(r.rows for r in per_shard)),
        "total_tokens": int(sum(r.tokens for r in per_shard)),
    }
    # manifest LAST: its presence is the commit marker
    write_json_marker(spark, out_dir, "_manifest.json", manifest)
    return manifest


def verify_training_shards(spark, out_dir: str, id_col: str = "doc_id", len_col: str = "n_tok") -> None:
    """Re-derive every manifest entry from the shard data and raise
    ``RuntimeError`` on any mismatch (missing manifest = aborted
    export; count/token/fingerprint drift = torn or corrupted shard).
    The consuming trainer runs this before touching payloads."""
    from pyspark.sql import functions as F

    from loggie_spark.functions.hashing import md5_60bit

    manifest = read_json_marker(spark, out_dir, "_manifest.json")
    if manifest is None:
        raise RuntimeError(f"no _manifest.json in {out_dir}: aborted export")
    got = {
        str(r["shard"]): r
        for r in (
            spark.read.parquet(out_dir)
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).cast("long").alias("rows"),
                F.sum(len_col).cast("long").alias("tokens"),
                F.bit_xor(md5_60bit(F.col(id_col).cast("string")))
                .cast("long")
                .alias("fingerprint"),
            )
            .collect()
        )
    }
    got = {k: {"rows": v["rows"], "tokens": v["tokens"], "fingerprint": v["fingerprint"]} for k, v in got.items()}
    want = manifest["shards"]
    if got != want:
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        drift = sorted(k for k in set(want) & set(got) if want[k] != got[k])
        raise RuntimeError(
            f"shard export does not match manifest: missing={missing} "
            f"extra={extra} drifted={drift}"
        )
