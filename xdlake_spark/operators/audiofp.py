"""Audio landmark fingerprinting and snippet-to-corpus matching.

The constellation-map method from the public Shazam paper (Wang 2003,
*An Industrial-Strength Audio Search Algorithm*): short-time spectra ->
per-band spectral peaks -> landmark pairs (peak, later peak) packed
into small integer hashes -> match by hash join + time-offset voting.
A true snippet-of-recording match produces many hash hits that all
agree on ONE offset delta; chance collisions scatter across deltas, so
the vote histogram separates them sharply.

Scale shape: fingerprint extraction is one Arrow-batched pass over the
payloads (samples never shuffle — only (doc_id, hash, t) int rows
leave the executor). Matching is an equi-join on the hash key —
uniformly distributed for real audio — followed by a two-level
aggregation: count votes per (query, candidate, delta), then argmax
per (query, candidate). A stop-hash valve (``max_hash_freq``) drops
landmarks shared by too many corpus documents (hum, silence, codec
artifacts) before the join, the same skew treatment as dedup's
document-frequency valves: the dropped hashes are exactly the ones
whose join fan-out explodes AND whose evidentiary value is lowest.

Extends the reference's surface (xbrianh/xdlake has no media
operators); mandated by the build brief's multimodal component.
Rows-only at the registry level (no SQL engine runs an FFT); the
pipeline is pinned by exact-offset recovery tests on planted
melody/snippet fixtures.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .multimodal import _parse_audio

FP_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("hash", T.LongType()),
    T.StructField("t", T.IntegerType()),
])

#: Spectral band edges (rFFT bin indices for frame=512): roughly
#: logarithmic, one peak kept per band per frame.
_BANDS = (1, 8, 16, 32, 64, 128, 257)


def fingerprint_samples(samples: np.ndarray, frame: int = 512,
                       hop: int = 256, fanout: int = 4,
                       ) -> list[tuple[int, int]]:
    """Landmark hashes of one mono float signal: (hash, frame_index)
    pairs. Deterministic — Hann window, rFFT magnitude, per-band
    argmax peaks, each peak paired with the SAME band's peak in the
    next ``fanout`` frames (the paper's target-zone frequency-proximity
    constraint, which also caps fan-out at bands x fanout hashes per
    frame); hash packs (f1, f2, dt) as f1<<18 | f2<<9 | dt.
    """
    if not 1 <= fanout < 512:
        raise ValueError(
            f"fanout={fanout} overflows the 9-bit dt field of the "
            "packed landmark hash (f1<<18 | f2<<9 | dt); must be "
            "1 <= fanout < 512")
    if frame // 2 + 1 > 512:
        raise ValueError(
            f"frame={frame} yields {frame // 2 + 1} rFFT bins, "
            "overflowing the 9-bit frequency fields of the packed "
            "hash; must be frame <= 1022")
    n = (len(samples) - frame) // hop + 1
    if n <= 0:
        return []
    win = np.hanning(frame)
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    spec = np.abs(np.fft.rfft(samples[idx] * win, axis=1))
    peaks = np.empty((n, len(_BANDS) - 1), dtype=np.int64)
    for b in range(len(_BANDS) - 1):
        lo, hi = _BANDS[b], _BANDS[b + 1]
        peaks[:, b] = lo + np.argmax(spec[:, lo:hi], axis=1)
    out = []
    for t1 in range(n):
        for dt in range(1, min(fanout, n - 1 - t1) + 1):
            for b in range(peaks.shape[1]):
                f1, f2 = peaks[t1, b], peaks[t1 + dt, b]
                out.append((int(f1) << 18 | int(f2) << 9 | dt, t1))
    return out


def audio_fingerprints(df: DataFrame, payload_col: str = "payload",
                       id_col: str = "doc_id", frame: int = 512,
                       hop: int = 256, fanout: int = 4) -> DataFrame:
    """Decode every audio payload (any WAV encoding or FLAC) and emit
    its landmark fingerprints — (doc_id, hash, t) rows, one Arrow pass.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ts = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                _, mono, _ = _parse_audio(bytes(payload))
                for h, t in fingerprint_samples(
                        mono.astype(np.float64), frame, hop, fanout):
                    ids.append(int(doc_id))
                    hs.append(h)
                    ts.append(t)
            yield pd.DataFrame({"doc_id": ids, "hash": hs, "t": ts},
                               columns=[f.name for f in
                                        FP_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=FP_SCHEMA)


def match_fingerprints(query_fp: DataFrame, corpus_fp: DataFrame,
                       min_votes: int = 5,
                       max_hash_freq: int | None = None) -> DataFrame:
    """Match query snippets against a fingerprinted corpus.

    Join on the landmark hash, then vote: a real match concentrates
    its hits on one time-offset ``delta = t_corpus - t_query``; the
    reported score is that modal-delta vote count. ``max_hash_freq``
    drops hashes present in more than that many corpus documents
    before the join (stop-hash valve — kills both skew and noise).

    Output: (query_id, corpus_id, votes, offset) with
    ``votes >= min_votes``; offset is the winning delta in frames
    (smallest delta wins vote ties, for determinism).
    """
    q = query_fp.select(F.col("doc_id").alias("query_id"),
                        "hash", F.col("t").alias("tq"))
    c = corpus_fp.select(F.col("doc_id").alias("corpus_id"),
                         "hash", F.col("t").alias("tc"))
    if max_hash_freq is not None:
        keep = (c.groupBy("hash")
                .agg(F.countDistinct("corpus_id").alias("__df"))
                .filter(F.col("__df") <= max_hash_freq)
                .select("hash"))
        c = c.join(keep, "hash")
    votes = (q.join(c, "hash")
             .groupBy("query_id", "corpus_id",
                      (F.col("tc") - F.col("tq")).alias("delta"))
             .agg(F.count(F.lit(1)).alias("n")))
    best = (votes.groupBy("query_id", "corpus_id")
            .agg(F.max(F.struct(F.col("n"),
                                (-F.col("delta")).alias("__nd")))
                 .alias("w"))
            .select("query_id", "corpus_id",
                    F.col("w.n").alias("votes"),
                    (-F.col("w.__nd")).alias("offset")))
    return best.filter(F.col("votes") >= min_votes)
