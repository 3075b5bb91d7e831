"""Checkpoint manifest + resume — loggie's at-least-once ack/registry
contract mapped to batch (SURVEY.md §3.4).

The reference persists, per (jobUid, sourceName, pipelineName), the
highest contiguous acked file offset (pkg/source/file/ack.go:44-106,
pkg/util/persistence/reg/registry.go:24-50) so a restart resumes
without loss; sinks may then redeliver (at-least-once).

Batch mapping, upgraded to effective exactly-once:

* Work is bucketed by a **stable** key: ``bucket = pmod(xxhash64(doc_id), B)``
  — a pure function of the data, so the same rows land in the same
  bucket across runs regardless of input split planning.
* Output is written ``partitionBy(bucket, ...)`` with **dynamic
  partition overwrite**: re-processing a bucket atomically replaces its
  directory, so a crash mid-write (partial files, no manifest row)
  heals on resume instead of duplicating.
* After a successful write the manifest records one row per bucket with
  rows_in/rows_out counters (the per-partition lineage of the
  north-rule). Resume = anti-join: only buckets without a ``done``
  manifest row are read — Spark prunes completed buckets at the scan.

At 100 TB scale B is sized so one bucket ≈ a few GB (e.g. B=4096), and
the manifest is a tiny table read on the driver.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_bucket"

_MANIFEST_SCHEMA = (
    "run_id string, bucket int, source string, rows_in long, rows_out long, status string"
)


def with_bucket(df: DataFrame, n_buckets: int, key: str = "doc_id") -> DataFrame:
    """Stable work bucket from the row key (xxhash64 is deterministic
    across runs/versions for the same input)."""
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))


@dataclass
class Manifest:
    path: str

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in _walk_files(self.path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        if not self._exists():
            return spark.createDataFrame([], _MANIFEST_SCHEMA)
        return spark.read.parquet(self.path)

    def completed_buckets(self, spark: SparkSession, run_id: str) -> list[int]:
        m = self.read(spark)
        rows = (
            m.filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
            .select("bucket")
            .distinct()
            .collect()
        )
        return sorted(r.bucket for r in rows)

    def record_done(self, stats: DataFrame) -> None:
        """Append per-bucket lineage rows. ``stats`` must match the
        manifest schema."""
        stats.write.mode("append").parquet(self.path)


def _walk_files(root: str):
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            yield os.path.join(dirpath, f)


def incomplete_only(
    df: DataFrame, spark: SparkSession, manifest: Manifest, run_id: str
) -> DataFrame:
    """Filter the bucketed frame to buckets not yet marked done.

    Uses an isin-filter (the completed list is tiny and driver-known) so
    Catalyst can push it into the scan as a partition/predicate filter —
    cheaper than a join for resume."""
    done = manifest.completed_buckets(spark, run_id)
    if not done:
        return df
    return df.filter(~F.col(BUCKET_COL).isin(done))
