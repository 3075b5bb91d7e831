"""Token-array ⇄ text codecs (the "body" decode of the parse stage).

Input contract (BASELINE input_hint): ``tokens: array<int32>`` holds the
UTF-8 bytes of the rendered log line, one int per byte. The per-row
invariant against the reference is token-array equality, so both
directions must be lossless.

Two decode paths:

* :func:`decode_tokens_utf8` — the general path: an Arrow-batched pandas
  UDF (never per-row Python at the plan level; the batch loop is a tight
  ``bytes(...)`` constructor over numpy buffers).
* :func:`decode_tokens_ascii` — pure-JVM fast path when the corpus is
  known 7-bit ASCII (each byte is its own code point, so
  ``transform(tokens, chr)`` + ``array_join`` is exact). Stays inside
  whole-stage codegen; use it when datagen guarantees ASCII.

Mirrors the reference's source-side body handling: events carry a raw
byte body (pkg/core/api/base.go:61-70) that codecs/interceptors decode
(pkg/source/codec/json/json.go:28-37).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType


@F.pandas_udf(StringType())
def decode_tokens_utf8(tokens: pd.Series) -> pd.Series:
    """array<int32> of UTF-8 byte values → string (Arrow-batched)."""
    return pd.Series(
        [
            None if t is None else bytes(bytearray(int(b) & 0xFF for b in t)).decode("utf-8", errors="replace")
            for t in tokens
        ],
        dtype="object",
    )


@F.pandas_udf(ArrayType(IntegerType()))
def encode_text_to_tokens(text: pd.Series) -> pd.Series:
    """string → array<int32> of its UTF-8 bytes (lossless inverse)."""
    return pd.Series(
        [None if s is None else [int(b) for b in s.encode("utf-8")] for s in text],
        dtype="object",
    )


def decode_tokens_arrow(
    df, tokens_col: str = "tokens", out_col: str = "body", keep_tokens: bool = True
):
    """Zero-loop vectorized decode via ``mapInArrow``: the ListArray's
    int32 value buffer is cast to uint8 and REUSED as the UTF-8 data
    buffer of a new StringArray with the same offsets — no per-row
    Python, no per-row JVM allocation. This is the scale path for the
    parse stage's token→body decode.

    ``keep_tokens=False`` drops the token column from the RETURNED
    batches: Catalyst cannot prune columns through an opaque
    mapInArrow node, so a metrics-only job (nothing downstream reads
    tokens) would otherwise pay the Python→JVM transfer of the fattest
    column for nothing — ~4x the bytes of the decoded body. Jobs that
    write routed rows keep it (token-array equality at the sink).

    Falls back to the pandas UDF per batch when nulls/slicing break the
    buffer-reuse preconditions (never in the synthetic corpus).
    """
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import StructField

    from pyspark.sql.types import StructType

    # Fresh StructType: .add() mutates in place, and df.schema is a
    # cached object on the DataFrame — mutating it corrupts resolution.
    kept = [f for f in df.schema.fields if keep_tokens or f.name != tokens_col]
    out_schema = StructType(kept + [StructField(out_col, StringType())])
    idx = df.columns.index(tokens_col)

    def decode_batches(batches):
        for b in batches:
            col = b.column(idx)
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
                b.column(i)
                for i in range(b.num_columns)
                if keep_tokens or i != idx
            ] + [body]
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in out_schema.fields]
            )

    return df.mapInArrow(decode_batches, out_schema)


def decode_tokens_jvm(tokens: Column | str) -> Column:
    """Exact UTF-8 decode entirely inside whole-stage codegen.

    Trick: ``chr(b)`` maps byte value b (0-255) to the code point b;
    a string of such chars encoded as ISO-8859-1 yields exactly the
    original byte sequence (Latin-1 is the identity on 0-255); decoding
    THAT as UTF-8 reassembles multi-byte characters correctly. No
    Python process, no Arrow hop — this is the fastest decode path on
    CPU-constrained executors (the Arrow path pays a full JVM→Python→
    JVM serialization of the token column).
    """
    col = F.col(tokens) if isinstance(tokens, str) else tokens
    latin1 = F.array_join(
        F.transform(col, lambda b: F.chr(F.pmod(b, F.lit(256)))), ""
    )
    return F.decode(F.encode(latin1, "ISO-8859-1"), "UTF-8")


def decode_tokens_ascii(tokens: Column | str) -> Column:
    """JVM-only decode valid iff every token < 128 (ASCII).

    ``chr(i)`` maps a code point; for 7-bit input code point == byte, so
    this equals the UTF-8 decode while staying in whole-stage codegen.
    """
    col = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.array_join(F.transform(col, lambda b: F.chr(b)), "")


def encode_text_to_tokens_ascii(text: Column | str) -> Column:
    """JVM-only inverse of :func:`decode_tokens_ascii` (ASCII input).

    ``split(s, '')`` can yield a trailing empty string (Java split with
    limit -1), so empties are filtered before ``ascii``.
    """
    col = F.col(text) if isinstance(text, str) else text
    chars = F.filter(F.split(col, ""), lambda ch: ch != "")
    return F.transform(chars, lambda ch: F.ascii(ch))
