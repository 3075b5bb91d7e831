"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

The Spark-side plumbing (schema, batch shape, partition sizing) is
real and tested. Codecs: PPM (P6) images and PCM WAV audio decode for
REAL — pure numpy/struct, no external library, content-hash features
off the decoded buffers. Formats that need PIL/ffmpeg (JPEG, PNG,
MP4, …) fall back to a clearly-marked deterministic fake, or raise
NotImplementedError when ``strict=True``.

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
    BooleanType,
    IntegerType,
    LongType,
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
        StructField("duration_ms", IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for codecs this container lacks.

    STUB for formats needing PIL/libvips/ffmpeg (JPEG, PNG, MP4, …).
    PPM images and PCM WAV audio decode for REAL below — pure
    numpy/struct, no external library. The fake derives stable
    pseudo-features from the bytes so tests can assert exact values
    end-to-end.
    """
    import hashlib

    h = hashlib.md5(payload or b"").hexdigest()
    return {
        "feat_hash": h,
        "width": int(h[:4], 16) % 1024,
        "height": int(h[4:8], 16) % 1024,
        "duration_ms": None,
    }


def _decode_ppm(payload: bytes) -> dict:
    """REAL image decode for binary PPM (P6) — pure numpy.

    Header tokens (width, height, maxval) may be separated by any
    whitespace and interleaved with ``#`` comments; pixel data is raw
    RGB. ``feat_hash`` is the md5 of the DECODED pixel buffer, so two
    files with identical pixels but different header comments hash
    equal — the content-hash a media dedup actually wants.
    """
    import hashlib

    import numpy as np

    pos = 2  # past 'P6'
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, _maxval = tokens
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return {
        "feat_hash": hashlib.md5(px.tobytes()).hexdigest(),
        "width": w,
        "height": h,
        "duration_ms": None,
    }


def _decode_wav(payload: bytes) -> dict:
    """REAL audio decode for RIFF/WAVE PCM — pure struct/numpy chunk
    walk (no wave-module file objects, works straight off the bytes).
    ``feat_hash`` is the md5 of the raw sample data chunk."""
    import hashlib
    import struct

    sample_rate = n_channels = bits = None
    data = b""
    pos = 12  # past RIFF<size>WAVE
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            _fmt, n_channels, sample_rate, _bps, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if not sample_rate or not n_channels or not bits:
        raise ValueError("malformed WAV: missing fmt chunk")
    n_samples = len(data) // (n_channels * bits // 8)
    return {
        "feat_hash": hashlib.md5(data).hexdigest(),
        "width": None,
        "height": None,
        "duration_ms": int(n_samples * 1000 / sample_rate),
    }


def _pil_decode(payload: bytes) -> dict:
    """REAL JPEG/PNG decode via PIL when the cluster image ships it
    (this container does not — see ``_HAVE_PIL`` probe). ``feat_hash``
    is the md5 of the decoded RGB pixel buffer, matching ``_decode_ppm``'s
    content-hash semantics."""
    import hashlib
    import io

    from PIL import Image  # noqa: import gated by _HAVE_PIL

    img = Image.open(io.BytesIO(payload))
    img = img.convert("RGB")
    return {
        "feat_hash": hashlib.md5(img.tobytes()).hexdigest(),
        "width": img.width,
        "height": img.height,
        "duration_ms": None,
    }


def _soundfile_decode(payload: bytes) -> dict:
    """REAL FLAC/OGG decode via soundfile/libsndfile when the cluster
    image ships it (this container does not — see ``_HAVE_SOUNDFILE``
    probe). ``feat_hash`` is the md5 of the decoded PCM sample buffer,
    matching ``_decode_wav``'s content-hash semantics (two encodings of
    the same audio hash alike after decode)."""
    import hashlib
    import io

    import soundfile as sf  # noqa: import gated by _HAVE_SOUNDFILE

    data, sample_rate = sf.read(io.BytesIO(payload), dtype="int16")
    return {
        "feat_hash": hashlib.md5(data.tobytes()).hexdigest(),
        "width": None,
        "height": None,
        "duration_ms": int(len(data) * 1000 / sample_rate),
    }


def _probe_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _probe_soundfile() -> bool:
    try:
        import soundfile  # noqa: F401

        return True
    except (ImportError, OSError):  # OSError: libsndfile missing
        return False


_HAVE_PIL = _probe_pil()
_HAVE_SOUNDFILE = _probe_soundfile()

_JPEG_MAGIC = b"\xff\xd8\xff"
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_FLAC_MAGIC = b"fLaC"
_OGG_MAGIC = b"OggS"


def _decode_media(payload: bytes, strict: bool) -> dict:
    """Sniff magic bytes and route to a real codec where one exists;
    fall back to the deterministic fake (or raise under ``strict``).

    A payload that merely STARTS with the right magic can still be
    corrupt (truncated header, short fmt chunk) — untrusted corpus media
    must never crash the whole stage, so real-codec failures fall back to
    the deterministic fake under ``strict=False`` and re-raise under
    ``strict=True``."""
    try:
        if payload[:2] == b"P6":
            return _decode_ppm(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _decode_wav(payload)
        if _HAVE_PIL and (
            payload[:3] == _JPEG_MAGIC or payload[:8] == _PNG_MAGIC
        ):
            return _pil_decode(payload)
        if _HAVE_SOUNDFILE and (
            payload[:4] == _FLAC_MAGIC or payload[:4] == _OGG_MAGIC
        ):
            return _soundfile_decode(payload)
    except Exception:
        if strict:
            raise
        return _fake_decode(payload)
    if strict:
        raise NotImplementedError(
            "no real codec for this payload: PPM and PCM WAV decode "
            "in-container (JPEG/PNG too when PIL is on the cluster "
            "image, FLAC/OGG when soundfile is); MP4 needs ffmpeg "
            "(not installed)"
        )
    return _fake_decode(payload)


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
                    lambda p: _decode_media(bytes(p) if p is not None else b"", strict)
                )
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "kind": chunk["kind"],
                        "n_bytes": chunk["payload"]
                        .map(lambda p: 0 if p is None else len(p))
                        .astype("int32"),
                        "feat_hash": feats.map(lambda f: f["feat_hash"]),
                        "width": feats.map(lambda f: f["width"]).astype("Int32"),
                        "height": feats.map(lambda f: f["height"]).astype("Int32"),
                        "duration_ms": feats.map(lambda f: f["duration_ms"]).astype(
                            "Int32"
                        ),
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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def _resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resize for P6 PPM — pure numpy indexing
    (decode header, gather source rows/cols, re-emit canonical PPM)."""
    import numpy as np

    meta = _decode_ppm(payload)
    w, h = meta["width"], meta["height"]
    # locate pixel offset the same way _decode_ppm does
    pos, tokens = 2, []
    while len(tokens) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1
    px = np.frombuffer(payload, np.uint8, w * h * 3, pos).reshape(h, w, 3)
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    out = px[ys][:, xs]
    return b"P6\n%d %d\n255\n" % (out_w, out_h) + out.tobytes()


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    strict: bool = False,
    batch_rows: int = 256,
) -> DataFrame:
    """mapInPandas resize stage: image payloads come back re-encoded
    at (width, height) with updated metadata; the transform is NARROW
    (payload never shuffles) and byte-bounded per chunk like
    decode_and_featurize. PPM resizes for REAL (pure numpy
    nearest-neighbor); formats needing PIL pass through unchanged —
    or raise under ``strict=True``."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows].copy()

                def one(p):
                    b = bytes(p) if p is not None else b""
                    if b[:2] == b"P6":
                        # corrupt-but-P6-magic payloads pass through
                        # unchanged (marked un-resized) rather than
                        # crashing the stage on untrusted media
                        try:
                            return _resize_ppm(b, width, height), True
                        except Exception:
                            if strict:
                                raise
                            return b, False
                    if strict:
                        raise NotImplementedError(
                            "resize beyond PPM needs PIL (not installed)"
                        )
                    return b, False

                pairs = chunk["payload"].map(one)
                chunk["payload"] = pairs.map(lambda t: t[0])
                resized = pairs.map(lambda t: t[1])
                chunk["width"] = (
                    pd.Series([width] * len(chunk), index=chunk.index)
                    .where(resized, chunk["width"])
                    .astype("Int32")
                )
                chunk["height"] = (
                    pd.Series([height] * len(chunk), index=chunk.index)
                    .where(resized, chunk["height"])
                    .astype("Int32")
                )
                yield chunk[
                    [
                        "media_id",
                        "kind",
                        "payload",
                        "mime",
                        "width",
                        "height",
                        "duration_ms",
                    ]
                ]

    return df.mapInPandas(process, RESIZED_SCHEMA)


AUDIO_SEGMENT_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("seg", IntegerType()),
        StructField("start_ms", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", StringType()),  # fixed 4-decimal string (stable)
    ]
)


def audio_segments(
    df: DataFrame, segment_ms: int = 1000, batch_rows: int = 256
) -> DataFrame:
    """Segment-level audio features over the REAL WAV codec: slice the
    PCM data chunk into ``segment_ms`` windows and emit per-segment
    RMS — the audio twin of video frame-sampling, with actual sample
    math instead of a metadata plan. Narrow mapInPandas (payload never
    shuffles); non-WAV payloads yield no rows.

    RMS is rendered as a fixed 4-decimal STRING so the value is stable
    across numpy versions/platforms for test assertions.
    """
    import struct

    import numpy as np

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out: list[tuple] = []
                for mid, p in zip(chunk["media_id"], chunk["payload"]):
                    b = bytes(p) if p is not None else b""
                    if not (b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
                        continue
                    # corrupt-but-RIFF-magic payloads (short fmt chunk,
                    # odd-length data) skip rather than crash the stage
                    try:
                        sr = nch = bits = None
                        data = b""
                        pos = 12
                        while pos + 8 <= len(b):
                            cid, csize = struct.unpack_from("<4sI", b, pos)
                            body = b[pos + 8 : pos + 8 + csize]
                            if cid == b"fmt ":
                                _f, nch, sr, _bps, _al, bits = struct.unpack_from(
                                    "<HHIIHH", body, 0
                                )
                            elif cid == b"data":
                                data = body
                            pos += 8 + csize + (csize & 1)
                        if not sr or bits != 16 or not nch:
                            continue
                        samples = np.frombuffer(
                            data[: len(data) - (len(data) % (2 * nch))], "<i2"
                        ).astype(np.float64)
                    except Exception:
                        continue
                    if nch > 1:
                        samples = samples.reshape(-1, nch).mean(axis=1)
                    per_seg = max(1, sr * segment_ms // 1000)
                    for s in range(0, len(samples), per_seg):
                        w = samples[s : s + per_seg]
                        rms = float(np.sqrt(np.mean(w * w)))
                        out.append(
                            (
                                mid,
                                s // per_seg,
                                int(s * 1000 / sr),
                                len(w),
                                f"{rms:.4f}",
                            )
                        )
                yield pd.DataFrame(
                    out,
                    columns=["media_id", "seg", "start_ms", "n_samples", "rms"],
                )

    return df.mapInPandas(process, AUDIO_SEGMENT_SCHEMA)


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("dhash", LongType()),
        StructField("real_decode", BooleanType()),
    ]
)

_DHASH_ROWS, _DHASH_COLS = 6, 11  # 6 rows x 10 horizontal gradients = 60 bits


def _dhash_ppm(payload: bytes) -> int | None:
    """60-bit perceptual difference-hash of a binary PPM (P6) image —
    ALL integer arithmetic (channel mean by //3, box-resample cell
    means by //count, '>' gradient compare), so the hash is
    bit-reproducible on any platform with no float rounding anywhere.
    Returns None when the image is too small for the 6×11 grid or the
    header is malformed (caller falls back)."""
    import numpy as np

    try:
        pos = 2
        tokens: list[int] = []
        while len(tokens) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
        pos += 1
        w, h, _maxval = tokens
        if w < _DHASH_COLS or h < _DHASH_ROWS:
            return None
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        gray = px.reshape(h, w, 3).astype(np.int64).sum(axis=2) // 3
    except (ValueError, IndexError):
        return None
    cells = np.empty((_DHASH_ROWS, _DHASH_COLS), dtype=np.int64)
    row_chunks = np.array_split(np.arange(h), _DHASH_ROWS)
    col_chunks = np.array_split(np.arange(w), _DHASH_COLS)
    for r, rc in enumerate(row_chunks):
        for c, cc in enumerate(col_chunks):
            block = gray[np.ix_(rc, cc)]
            cells[r, c] = int(block.sum()) // block.size
    out = 0
    for r in range(_DHASH_ROWS):
        for c in range(_DHASH_COLS - 1):
            if cells[r, c + 1] > cells[r, c]:
                out |= 1 << (r * (_DHASH_COLS - 1) + c)
    return out


def image_dhash(df: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Perceptual image fingerprints for near-dup dedup (the LAION-
    style image dedup step): PPM payloads get the REAL integer dHash
    (``_dhash_ppm`` — robust to brightness/contrast shifts that
    preserve gradient signs); other formats fall back to the
    engine-agnostic 60-bit md5 of the payload bytes (exact-dup-only
    semantics, SQL-reproducible), flagged by ``real_decode``.

    Compose with :func:`dedup.fingerprint_hamming_pairs` for the
    banded near-dup pair join — the same machinery text simhash uses.
    Payloads never shuffle: this stage maps scan batches straight to
    (media_id, dhash) scalars.
    """
    import hashlib

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                hashes: list[int] = []
                real: list[bool] = []
                for p in chunk["payload"]:
                    b = bytes(p) if p is not None else b""
                    d = _dhash_ppm(b) if b[:2] == b"P6" else None
                    if d is None:
                        hashes.append(int(hashlib.md5(b).hexdigest()[:15], 16))
                        real.append(False)
                    else:
                        hashes.append(d)
                        real.append(True)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "dhash": pd.Series(hashes, index=chunk.index, dtype="int64"),
                        "real_decode": pd.Series(real, index=chunk.index),
                    }
                )

    return df.mapInPandas(process, DHASH_SCHEMA)


_AHASH_FRAMES = 61  # 60 energy gradients = 60 bits


def _ahash_wav(payload: bytes) -> int | None:
    """60-bit audio envelope hash of a RIFF/WAVE PCM16 payload — the
    acoustic analog of the image dHash: mono-mix the samples, split
    into 61 equal frames, take each frame's mean |amplitude| (ALL
    integer arithmetic), and emit the energy-gradient sign bits.
    Volume scaling preserves the comparisons, so a louder copy of the
    same clip collides — exactly the near-dup an audio dedup wants.
    Returns None for non-PCM16 / too-short / malformed payloads."""
    import struct

    import numpy as np

    try:
        sample_rate = n_channels = bits = None
        data = b""
        pos = 12
        while pos + 8 <= len(payload):
            cid, csize = struct.unpack_from("<4sI", payload, pos)
            body = payload[pos + 8 : pos + 8 + csize]
            if cid == b"fmt ":
                _f, n_channels, sample_rate, _bps, _al, bits = struct.unpack_from(
                    "<HHIIHH", body, 0
                )
            elif cid == b"data":
                data = body
            pos += 8 + csize + (csize & 1)
        if not sample_rate or not n_channels or bits != 16:
            return None
        x = np.frombuffer(
            data, dtype="<i2", count=(len(data) // (2 * n_channels)) * n_channels
        ).astype(np.int64)
        mono = np.abs(x.reshape(-1, n_channels).sum(axis=1) // n_channels)
        if mono.size < _AHASH_FRAMES:
            return None
    except (ValueError, struct.error):
        return None
    frames = np.array_split(mono, _AHASH_FRAMES)
    energy = [int(f.sum()) // f.size for f in frames]
    out = 0
    for i in range(_AHASH_FRAMES - 1):
        if energy[i + 1] > energy[i]:
            out |= 1 << i
    return out


def audio_ahash(df: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Perceptual audio fingerprints for near-dup dedup: PCM16 WAV
    payloads get the REAL integer envelope hash (``_ahash_wav`` —
    volume-invariant); everything else falls back to the 60-bit md5 of
    the payload bytes (exact-dup semantics, SQL-reproducible), flagged
    by ``real_decode``. Same composition contract as
    :func:`image_dhash`: feed the result to
    ``dedup.fingerprint_hamming_pairs``. Payloads never shuffle.
    """
    import hashlib

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                hashes: list[int] = []
                real: list[bool] = []
                for p in chunk["payload"]:
                    b = bytes(p) if p is not None else b""
                    d = _ahash_wav(b) if b[:4] == b"RIFF" else None
                    if d is None:
                        hashes.append(int(hashlib.md5(b).hexdigest()[:15], 16))
                        real.append(False)
                    else:
                        hashes.append(d)
                        real.append(True)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "dhash": pd.Series(hashes, index=chunk.index, dtype="int64"),
                        "real_decode": pd.Series(real, index=chunk.index),
                    }
                )

    return df.mapInPandas(process, DHASH_SCHEMA)
