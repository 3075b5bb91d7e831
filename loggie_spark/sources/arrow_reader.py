"""Arrow-native sequence ingest: read the tokenized-sequence parquet
with pyarrow INSIDE the tasks and decode tokens→body there, skipping
the JVM→Python Arrow serialization of the token column entirely.

Why: stage isolation (BENCH_SCALING.json) shows the decode hop's cost
is NOT the parquet scan (pure-JVM token scan+agg: 0.47 s for 10M rows)
and NOT the byte cast (+0.2 s) — it is the JVM→Python Arrow transfer
of the ``array<int32>`` column (~3.3 s for 10M rows / 3.4 GB of token
ints at 32 cores). Reading the row group with pyarrow inside the task
eliminates that leg: the int32 value buffer casts to uint8 and is
REUSED as the UTF-8 buffer of the decoded body (same trick as
functions/tokens.decode_tokens_arrow), so the only cross-runtime
transfer is the ~4× smaller decoded body on the way back.

Unit of work is a (file, row_group) pair: row groups are the natural
split (bounded memory, full parallelism regardless of file count —
at 100 TB a file list alone under-parallelizes). The work list is a
tiny driver-side frame; ``repartition(n_slots)`` spreads it.

This is the "(b) Arrow-batched mapInArrow" escape hatch used
deliberately: the standard ``spark.read.parquet`` + decode path stays
the default (Catalyst pushdown, schema evolution, filter pruning);
this reader is the measured fast path for the fixed-shape ingest
stage where the scan's only consumer is the byte decode and the token
column is dropped (``keep_tokens=False`` jobs). With keep_tokens=True
the token arrays must cross into the JVM anyway, so the standard path
wins — measured, see BASELINE.md. Loggie parallel: the file source's
reader pool (pkg/source/file/read.go) — many independent readers, one
per active file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SEQ_SCHEMA_DECODED = "doc_id string, n_tok int, source string, body string"


def _list_row_groups(path: str) -> list[tuple[str, int]]:
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    units: list[tuple[str, int]] = []
    for f in files:
        units.extend((f, rg) for rg in range(pq.ParquetFile(f).num_row_groups))
    if not units:
        raise FileNotFoundError(f"no parquet files under {path}")
    return units


def read_sequences_arrow(
    spark: SparkSession,
    path: str,
    keep_tokens: bool = False,
    parallelism: int | None = None,
) -> DataFrame:
    """Decoded sequences frame (doc_id, n_tok, source, body[, tokens])
    read + decoded entirely in Arrow, one task per parquet row group."""
    import numpy as np
    import pyarrow as pa

    units = _list_row_groups(path)
    # One work partition per core slot, NOT more: each partition spins a
    # Python worker doing pyarrow reads, and oversubscribing them is
    # measured 1.4× slower (3.40 s vs 4.76 s at 32 cores / 10M rows) —
    # the readers are CPU-bound, so extra workers only thrash.
    n_parts = parallelism or min(len(units), spark.sparkContext.defaultParallelism)
    work = spark.createDataFrame(units, "f string, rg int").repartition(n_parts)

    out_schema = SEQ_SCHEMA_DECODED + (", tokens array<int>" if keep_tokens else "")

    def read_units(batches):
        import pyarrow.parquet as pq

        for b in batches:
            for f, rg in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                cols = ["doc_id", "n_tok", "source", "tokens"]
                # use_threads=False: Spark already runs one reader per
                # core slot; pyarrow's own pool (ncpus threads PER
                # worker) would put ~cores² runnable threads on the box
                # (measured: the whole stage stops scaling past 8 cores
                # until this is pinned).
                tbl = pq.ParquetFile(f).read_row_group(
                    rg, columns=cols, use_threads=False
                )
                for chunk_tbl in tbl.to_batches():
                    gi = chunk_tbl.schema.get_field_index
                    col = chunk_tbl.column(gi("tokens"))
                    try:
                        if col.null_count or col.offset:
                            raise ValueError("slow path")
                        offsets = col.offsets
                        if offsets.offset:
                            raise ValueError("slow path")
                        values = col.values.to_numpy(zero_copy_only=False)
                        data = values.astype(np.uint8).tobytes()
                        body = pa.StringArray.from_buffers(
                            len(col), offsets.buffers()[1], pa.py_buffer(data)
                        )
                    except Exception:
                        body = pa.array(
                            [
                                None
                                if t is None
                                else bytes(bytearray(x & 0xFF for x in t)).decode(
                                    "utf-8", errors="replace"
                                )
                                for t in col.to_pylist()
                            ],
                            type=pa.string(),
                        )
                    arrays = [
                        chunk_tbl.column(gi("doc_id")),
                        chunk_tbl.column(gi("n_tok")),
                        chunk_tbl.column(gi("source")),
                        body,
                    ]
                    names = ["doc_id", "n_tok", "source", "body"]
                    if keep_tokens:
                        arrays.append(col)
                        names.append("tokens")
                    yield pa.RecordBatch.from_arrays(arrays, names=names)

    return work.mapInArrow(read_units, out_schema)
