"""UTF-8-byte-safe truncation (the reference's default ``maxbytes``
interceptor, pkg/interceptor/maxbytes/interceptor.go:76-115).

``F.substring`` counts characters, not bytes, so a naive substring can
cut a multi-byte code point in half or keep too many bytes. ``subUtf8``
in the reference walks back from maxBytes to a rune boundary; we do the
same inside an Arrow-batched pandas UDF (Python's byte slicing +
incremental decode makes this trivial and still vectorized at the batch
level).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def _trunc(s: str, max_bytes: int) -> str:
    raw = s.encode("utf-8")
    if len(raw) <= max_bytes:
        return s
    # Walk back ≤3 bytes until the prefix is valid UTF-8 (a cut can
    # strand at most 3 continuation bytes), matching subUtf8's
    # rune-boundary scan.
    for end in range(max_bytes, max(max_bytes - 4, 0) - 1, -1):
        try:
            return raw[:end].decode("utf-8")
        except UnicodeDecodeError:
            continue
    return ""


def truncate_utf8_bytes(col: Column | str, max_bytes: int) -> Column:
    """Truncate a string column to at most ``max_bytes`` UTF-8 bytes
    without splitting a code point."""
    target = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else _trunc(v, max_bytes))

    return _udf(target)


def truncate_utf8_bytes_ascii(col: Column | str, max_bytes: int) -> Column:
    """JVM fast path: for known-ASCII text bytes == chars, so plain
    substring is exact and stays in codegen."""
    target = F.col(col) if isinstance(col, str) else col
    return F.substring(target, 1, max_bytes)
