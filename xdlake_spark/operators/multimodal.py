"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves are
STUBBED (no image/audio libs in this container — clearly marked below);
everything Spark-side is real: schemas, batch iteration, partitioning,
output contracts. Swapping the stub for PIL/librosa/ffmpeg changes one
function body, not the pipeline.

Scale notes: binary payloads never pass through the driver; Arrow batch
size bounds executor memory (`spark.sql.execution.arrow.maxRecordsPerBatch`
should be lowered for multi-MB payloads); mapInPandas keeps the pipeline
within one stage — no shuffle unless the caller groups.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of decode_images — fixed contract for downstream stages.
IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_size", T.LongType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def _decode_image_real(payload: bytes):
    """REAL decode path — requires an imaging library.

    STUB: this container has no image codecs; at deploy time replace with
    e.g. PIL.Image.open(io.BytesIO(payload)).
    """
    raise NotImplementedError(
        "image decode requires an imaging library (e.g. PIL); "
        "not available in this environment — use deterministic_fake=True")


def _decode_image_fake(payload: bytes):
    """Deterministic fake decode keyed on the payload hash: stable
    (width, height, channels, 8-dim feature vector). Lets the full Spark
    pipeline (schema, batching, partitioning) run and be tested without
    codecs."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 + (h[2] % 2) * 2      # 1 or 3
    feats = np.frombuffer(h[:32], dtype=np.uint8).astype(np.float32)
    feats = (feats[:8] / 255.0).round(6)
    return width, height, channels, feats


def decode_images(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id",
                  deterministic_fake: bool = False) -> DataFrame:
    """Binary payloads -> typed metadata + feature vector, via Arrow-batched
    mapInPandas (one Python worker per partition, zero driver involvement).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if deterministic_fake:
                    w, hgt, ch, feats = _decode_image_fake(data)
                else:
                    w, hgt, ch, feats = _decode_image_real(data)
                rows.append({
                    "doc_id": int(doc_id),
                    "byte_size": len(data),
                    "sha256": hashlib.sha256(data).hexdigest(),
                    "width": int(w), "height": int(hgt),
                    "n_channels": int(ch),
                    "features": [float(x) for x in feats],
                })
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_META_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=IMAGE_META_SCHEMA)


#: Frame-sampling output: one row per sampled frame.
FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("frame_sha256", T.StringType()),
])


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", every_n: int = 10,
                  deterministic_fake: bool = False) -> DataFrame:
    """Video payload -> every-Nth-frame rows (fan-out via mapInPandas).

    The fake treats each 1 KiB slice of payload as one 'frame' so the
    row-expansion plumbing is real and testable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if not deterministic_fake:
                    raise NotImplementedError(
                        "video decode requires ffmpeg; not available — "
                        "use deterministic_fake=True")
                n_frames = max(1, len(data) // 1024)
                for i in range(0, n_frames, every_n):
                    chunk = data[i * 1024:(i + 1) * 1024]
                    rows.append({
                        "doc_id": int(doc_id), "frame_index": i,
                        "frame_sha256": hashlib.sha256(chunk).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              FRAME_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=FRAME_SCHEMA)


#: Resize output: same payload contract in and out, so stages chain.
RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def resize_images(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", target_w: int = 32,
                  target_h: int = 32,
                  deterministic_fake: bool = False) -> DataFrame:
    """Image payload -> fixed-size payload (binary in, binary out), so the
    output chains into extract_features / decode stages unchanged.

    The fake resamples payload bytes at a uniform stride down to
    ``target_w * target_h * channels`` bytes (channels from the fake
    decode) — deterministic, size-exact, no codecs. The real path needs an
    imaging library and raises.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if not deterministic_fake:
                    _decode_image_real(data)  # raises NotImplementedError
                _, _, channels, _ = _decode_image_fake(data)
                n_out = target_w * target_h * channels
                src = np.frombuffer(data, dtype=np.uint8) if data else \
                    np.zeros(1, dtype=np.uint8)
                idx = np.linspace(0, len(src) - 1, n_out).astype(np.int64)
                rows.append({
                    "doc_id": int(doc_id), "width": target_w,
                    "height": target_h, "n_channels": channels,
                    "payload": src[idx].tobytes(),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              RESIZED_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=RESIZED_SCHEMA)


#: Feature-extraction output: embedding-shaped, joins/combines with the
#: similarity operators (same array<float> contract as `embeddings`).
FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "doc_id", dim: int = 16,
                     deterministic_fake: bool = False) -> DataFrame:
    """Payload -> ``dim``-dimensional float vector, batch-vectorized: the
    per-row work is only the digest; the matrix normalization is one numpy
    op per Arrow batch. Output is embedding-shaped, so it feeds directly
    into the similarity operators (operators/similarity.py).
    """
    if dim > 32:
        raise ValueError("fake extractor derives at most 32 dims per digest")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                _decode_image_real(b"")  # raises NotImplementedError
            digests = [hashlib.sha256(
                bytes(p) if p is not None else b"").digest()
                for p in pdf[payload_col]]
            if digests:
                mat = np.frombuffer(b"".join(digests), dtype=np.uint8)
                mat = mat.reshape(len(digests), 32)[:, :dim]
                feats = (mat.astype(np.float32) / 255.0).round(6)
            else:
                feats = np.zeros((0, dim), dtype=np.float32)
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64").values,
                "features": [row.tolist() for row in feats],
            }, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=FEATURES_SCHEMA)


def attach_fake_payloads(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         size: int = 4096) -> DataFrame:
    """Deterministically synthesize a binary payload column from text
    (repeat text bytes to ``size``) — test fixture for the multimodal
    pipeline in an environment without real media files."""
    repeats = (F.lit(size) / F.greatest(F.length(F.col(text_col)),
                                        F.lit(1))).cast("int") + 1
    repeated = F.repeat(F.col(text_col), repeats)
    return df.select(F.col(id_col),
                     F.encode(F.substring(repeated, 1, size),
                              "utf-8").alias("payload"))


#: Audio chunking output: one row per fixed-duration chunk.
AUDIO_CHUNK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("chunk_index", T.IntegerType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("rms", T.FloatType()),
    T.StructField("peak", T.FloatType()),
    T.StructField("chunk_sha256", T.StringType()),
])


def chunk_audio(df: DataFrame, payload_col: str = "payload",
                id_col: str = "doc_id", sample_rate: int = 16000,
                chunk_seconds: float = 1.0,
                deterministic_fake: bool = False) -> DataFrame:
    """Audio payload -> fixed-duration chunk rows with energy features
    (rms / peak), the front half of any speech/audio training pipeline
    (VAD thresholding, silence trimming, caption alignment).

    The payload is interpreted as PCM16 mono at ``sample_rate``
    (``deterministic_fake`` path — bytes as-is; a REAL deployment
    replaces the interpretation with an audio decoder, e.g.
    soundfile/librosa, which this container lacks). Per-chunk numpy is
    vectorized inside Arrow batches; fan-out shape matches
    :func:`sample_frames`.
    """
    chunk_len = max(1, int(sample_rate * chunk_seconds))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if not deterministic_fake:
                    raise NotImplementedError(
                        "audio decode requires an audio library (e.g. "
                        "soundfile); not available — use "
                        "deterministic_fake=True")
                if len(data) < 2:
                    continue
                pcm = np.frombuffer(
                    data[: len(data) - (len(data) % 2)],
                    dtype="<i2").astype(np.float32) / 32768.0
                for ci in range(0, len(pcm), chunk_len):
                    chunk = pcm[ci:ci + chunk_len]
                    raw = data[ci * 2:(ci + len(chunk)) * 2]
                    rows.append({
                        "doc_id": int(doc_id),
                        "chunk_index": ci // chunk_len,
                        "n_samples": int(len(chunk)),
                        "rms": float(np.sqrt(np.mean(chunk ** 2))),
                        "peak": float(np.max(np.abs(chunk))),
                        "chunk_sha256":
                            hashlib.sha256(raw).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              AUDIO_CHUNK_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=AUDIO_CHUNK_SCHEMA)
