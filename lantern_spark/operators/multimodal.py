"""Multimodal column plumbing: image / audio / video as binary columns.

North-star extension (BASELINE.json). The decode kernels use the real
codec (PIL / soundfile) when importable and fall back to a
deterministic fake when absent (this container ships no codecs); the
Spark-side plumbing — schema, batch shape, partitioning, UDF
signatures — is identical either way and fully tested:

- media columns are opaque ``binary`` + a typed metadata struct
  (media_type, width/height/duration, format), the Spark analog of
  keeping vectors as ordinary columns in the reference's heap tables.
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` batch kernels: bytes in via Arrow, fixed-shape float
  features out. Real codecs (PIL/ffmpeg) drop into ``_decode_image``
  etc. without touching the plan.

Scale notes: media bytes never shuffle — every operator is map-only;
feature vectors (small) are what downstream joins/indexes consume.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def media_schema(extra_fields=()) -> T.StructType:
    """Canonical multimodal table schema: (id, content, meta, …)."""
    return T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", MEDIA_META_TYPE),
            *extra_fields,
        ]
    )


def _decode_image(buf: bytes, meta) -> np.ndarray:
    """Image decode kernel, real-codec-first:

    1. BMP streams (sniffed by magic) decode via the pure-python codec
       (operators/codecs.py) — real, no external deps — for the
       variants it supports (24/32-bit uncompressed); paletted /
       RLE-compressed / other bit depths fall THROUGH to PIL rather
       than failing, so a PIL-equipped deployment keeps decoding every
       BMP it could before the pure codec existed;
    2. other formats use PIL when importable (real deployments;
       invalid bytes then raise);
    3. otherwise a deterministic fake — pixel field seeded by content
       hash, shape honoring meta width/height — so downstream kernels
       still see real shapes for codec-gated formats (JPEG, PNG, …).
    """
    from lantern_spark.operators.codecs import (
        UnsupportedCodecFeature,
        decode_bmp,
        is_bmp,
    )

    if is_bmp(buf):
        try:
            return decode_bmp(buf)
        except UnsupportedCodecFeature:
            # valid-but-unsupported BMP variant (8-bit palette, RLE,
            # 1/4/16-bit): let PIL (or the fake) handle it below.
            # CORRUPT streams raise plain ValueError and propagate —
            # corruption must never silently become a fake embedding
            pass
    try:
        import PIL.Image
    except ImportError:
        w = int(meta["width"] or 8)
        h = int(meta["height"] or 8)
        seed = int.from_bytes(hashlib.md5(buf).digest()[:4], "little")
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    import io

    img = PIL.Image.open(io.BytesIO(buf)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def image_features(
    df: DataFrame,
    content_col: str = "content",
    meta_col: str = "meta",
    dim: int = 16,
    out_col: str = "features",
) -> DataFrame:
    """Decode → pooled feature vector, one mapInPandas pass.

    Feature = per-channel mean/std pooling of the decoded pixels,
    hashed-projected to ``dim`` (deterministic offline stand-in for a
    CLIP-visual embedding; the batch shape matches the reference's
    clip/ViT-B-32-visual runtime with batch 50, embeddings/mod.rs:584).
    """
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields) + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf, meta in zip(pdf[content_col], pdf[meta_col]):
                if buf is None:
                    feats.append(None)
                    continue
                img = _decode_image(bytes(buf), meta)
                pooled = np.concatenate(
                    [img.mean(axis=(0, 1)), img.std(axis=(0, 1))]
                )  # 6 dims
                reps = int(np.ceil(dim / pooled.size))
                feats.append(
                    np.tile(pooled, reps)[:dim].astype(np.float32).tolist()
                )
            out = pdf.copy()
            out[out_col] = feats
            yield out

    return df.mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    meta_col: str = "meta",
) -> DataFrame:
    """Resize plumbing: updates meta dims; pixel resample is part of the
    stubbed decode kernel (map-only; bytes pass through untouched in
    the offline fake)."""
    return df.withColumn(
        meta_col,
        F.struct(
            F.col(f"{meta_col}.media_type").alias("media_type"),
            F.col(f"{meta_col}.format").alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col(f"{meta_col}.duration_ms").alias("duration_ms"),
        ),
    )


def sample_frames(
    df: DataFrame,
    every_ms: int,
    content_col: str = "content",
    meta_col: str = "meta",
    out_col: str = "frame_offsets_ms",
) -> DataFrame:
    """Frame-sampling plumbing for video rows: computes the frame
    timestamp grid from duration (decode of actual frames is the
    stubbed kernel). Pure column expression."""
    dur = F.coalesce(F.col(f"{meta_col}.duration_ms"), F.lit(0))
    return df.withColumn(
        out_col,
        F.when(
            dur > 0,
            F.sequence(F.lit(0), dur - 1, F.lit(every_ms)),
        ).otherwise(F.array().cast("array<int>")),
    )


def synthetic_media_df(spark, n: int = 32, media_type: str = "image") -> DataFrame:
    """Deterministic fixture: binary payloads derived from md5(i)."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"media-{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                bytearray(payload),
                (media_type, "fake", 8, 8, 1000 * (i % 5 + 1)),
            )
        )
    return spark.createDataFrame(rows, media_schema())


def _decode_audio(buf: bytes, meta) -> np.ndarray:
    """Audio decode kernel, real-codec-first:

    1. WAV streams (sniffed by RIFF/WAVE magic) decode via the
       pure-python codec (operators/codecs.py) — real, no external
       deps — for the variants it supports (8/16/32-bit integer PCM);
       24-bit / float / a-law / mu-law WAVs fall THROUGH to soundfile
       rather than failing, so a soundfile-equipped deployment keeps
       decoding every WAV it could before the pure codec existed;
    2. other formats use soundfile when importable (real deployments;
       invalid bytes then raise);
    3. otherwise a deterministic fake waveform seeded by content hash
       — length honors meta.duration_ms at 16 kHz — for codec-gated
       formats (MP3, FLAC, …)."""
    from lantern_spark.operators.codecs import (
        UnsupportedCodecFeature,
        decode_wav,
        is_wav,
    )

    if is_wav(buf):
        try:
            frames, _sr = decode_wav(buf)
            return frames.mean(axis=1).astype(np.float32)  # downmix
        except UnsupportedCodecFeature:
            # valid-but-unsupported WAV variant (24-bit, a-law/mu-law):
            # soundfile/fake below; corrupt streams keep raising
            pass
    try:
        import soundfile
    except ImportError:
        dur_ms = int(meta["duration_ms"] or 1000)
        n = max(16, dur_ms * 16)  # 16 kHz
        seed = int.from_bytes(hashlib.md5(buf).digest()[4:8], "little")
        rng = np.random.RandomState(seed)
        return rng.standard_normal(min(n, 160_000)).astype(np.float32)
    import io

    wav, _sr = soundfile.read(io.BytesIO(buf), dtype="float32")
    if wav.ndim > 1:
        wav = wav.mean(axis=1)  # downmix to mono
    return wav.astype(np.float32)


def audio_features(
    df: DataFrame,
    content_col: str = "content",
    meta_col: str = "meta",
    n_bands: int = 8,
    n_frames: int = 4,
    out_col: str = "audio_features",
) -> DataFrame:
    """Decode → framed band-energy features (a deterministic offline
    stand-in for a log-mel spectrogram), one mapInPandas pass: the
    waveform is split into ``n_frames`` windows × ``n_bands`` FFT
    band energies → a fixed (n_frames·n_bands) vector — the shape a
    CLAP/wav2vec-style audio tower consumes. Same batch discipline as
    image_features; bytes never shuffle."""
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields) + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def run(batches):
        for pdf in batches:
            feats = []
            for buf, meta in zip(pdf[content_col], pdf[meta_col]):
                if buf is None:
                    feats.append(None)
                    continue
                wav = _decode_audio(bytes(buf), meta)
                frames = np.array_split(wav, n_frames)
                v = []
                for fr in frames:
                    spec = np.abs(np.fft.rfft(fr))
                    bands = np.array_split(spec, n_bands)
                    v.extend(
                        float(np.log1p(b.mean())) if len(b) else 0.0
                        for b in bands
                    )
                feats.append(np.asarray(v, dtype=np.float32).tolist())
            out = pdf.copy()
            out[out_col] = feats
            yield out

    return df.mapInPandas(run, out_schema)
