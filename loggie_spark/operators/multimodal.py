"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

The Spark-side plumbing (schema, batch shape, partition sizing) is
real and tested; the actual codec work is stubbed because decode
libraries (PIL/ffmpeg/torchaudio) are not in this container — each stub
is a deterministic fake clearly marked, or raises NotImplementedError
when ``strict=True``.

Design for scale: media bytes dominate row size, so stages
(a) never shuffle the binary column (all transforms are narrow
mapInPandas), (b) size Arrow batches by bytes not rows
(``batch_rows`` param; at 100 TB set maxRecordsPerBatch so a batch is
~64 MB), and (c) project metadata-only frames early when the bytes are
not needed downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feat_hash", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode.

    STUB: a real deployment replaces this with PIL/libvips. The fake
    derives stable pseudo-features from the bytes so tests can assert
    exact values end-to-end.
    """
    import hashlib

    h = hashlib.md5(payload or b"").hexdigest()
    return {"feat_hash": h, "width": int(h[:4], 16) % 1024, "height": int(h[4:8], 16) % 1024}


def decode_and_featurize(
    df: DataFrame, strict: bool = False, batch_rows: int = 256
) -> DataFrame:
    """mapInPandas stage: binary payload → per-media features.

    ``strict=True`` raises NotImplementedError where the real codec
    would run — keeps the contract honest in environments without
    media libraries.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (not in container)"
                )
            # Bound the working set INSIDE the UDF: the session's Arrow
            # batch size is a lazy global (mutating it here would race
            # with other plans and wouldn't apply at execute time
            # anyway), so each incoming frame is re-sliced to
            # batch_rows-sized chunks — media payloads dominate memory,
            # and this keeps peak bytes per chunk bounded regardless of
            # the session batch config.
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = chunk["payload"].map(
                    lambda p: _fake_decode(bytes(p) if p is not None else b"")
                )
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "kind": chunk["kind"],
                        "n_bytes": chunk["payload"]
                        .map(lambda p: 0 if p is None else len(p))
                        .astype("int32"),
                        "feat_hash": feats.map(lambda f: f["feat_hash"]),
                        "width": feats.map(lambda f: f["width"]).astype("int32"),
                        "height": feats.map(lambda f: f["height"]).astype("int32"),
                    }
                )

    return df.mapInPandas(process, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explodes per-video timestamps
    (metadata-only — narrow, no payload shuffle); the frame extraction
    itself would run in the decode stage above."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests (payload = patterned bytes)."""
    df = spark.range(n)
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")
    )
    payload = F.encode(
        F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8"
    )
    return df.select(
        F.format_string("m-%06d", F.col("id").cast("int")).alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("id") % 5000 + 40).cast("int").alias("duration_ms"),
    )
