"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

Decode is REAL for every format a pure-numpy + stdlib decoder can
handle — PPM/PGM (netpbm P6/P5), BMP (24-bpp BI_RGB), PNG (8-bit
gray/RGB/GA/RGBA via stdlib ``zlib`` + per-scanline unfiltering),
JPEG — sequential AND progressive — and GIF (via :mod:`.codecs`,
implemented from the public
ITU-T T.81 / GIF specs), WAV (RIFF PCM 8/16/24/32, IEEE float,
G.711 A-law/mu-law, mono IMA ADPCM), and FLAC (RFC 9639: fixed + LPC
prediction, rice residuals, stereo decorrelation — lossless, chunk
digests byte-identical to the PCM16 path) — with no codec libraries. Formats
that remain out of reach without a codec library (MP3/MP4/ffmpeg
video) raise ``NotImplementedError`` with a clear message; swapping in
PIL/soundfile/ffmpeg extends one dispatch function, not the pipeline.
``deterministic_fake=True`` keeps the hash-keyed fake for payloads that
are not real media.

Scale notes: binary payloads never pass through the driver; Arrow batch
size bounds executor memory (`spark.sql.execution.arrow.maxRecordsPerBatch`
should be lowered for multi-MB payloads); mapInPandas keeps the pipeline
within one stage — no shuffle unless the caller groups.
"""

from __future__ import annotations

import hashlib
import struct
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


def _parse_pnm(data: bytes) -> np.ndarray:
    """Decode netpbm P6 (PPM, RGB) / P5 (PGM, gray) to a (h, w, c)
    uint8 array. Header = magic, then width/height/maxval as ASCII ints
    separated by whitespace (``#`` comments allowed), then ONE
    whitespace byte, then the raster."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos] in b" \t\r\n":
            pos += 1
        if pos < len(data) and data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and data[pos] in b"0123456789":
            pos += 1
        if pos == start:
            raise ValueError("malformed PNM header")
        vals.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise NotImplementedError("only 8-bit PNM rasters supported")
    c = 3 if magic == b"P6" else 1
    need = w * h * c
    raster = np.frombuffer(data, np.uint8, need, pos)
    return raster.reshape(h, w, c)


def _encode_pnm(pix: np.ndarray) -> bytes:
    """(h, w, c) uint8 -> binary PPM (c=3) / PGM (c=1) payload —
    the inverse of :func:`_parse_pnm`, so resize output re-decodes."""
    h, w, c = pix.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + \
        np.ascontiguousarray(pix).tobytes()


def _parse_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bpp BI_RGB BMP to (h, w, 3) uint8
    (RGB, top-down). Rows in the file are 4-byte padded and stored
    bottom-up unless height is negative."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h_signed = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bpp uncompressed BMP supported (got {bpp} bpp, "
            f"compression {comp})")
    h = abs(h_signed)
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(data, np.uint8, row_size * h, pix_off)
    pix = rows.reshape(h, row_size)[:, :w * 3].reshape(h, w, 3)[..., ::-1]
    return pix if h_signed < 0 else pix[::-1]


def _parse_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit PNG (grayscale, RGB, gray+alpha or RGBA;
    sequential or Adam7-interlaced) to (h, w, c) uint8 — pure stdlib
    ``zlib`` + numpy, no codec library. PNG is the one compressed
    format fully implementable from the public spec (RFC 2083): chunk
    walk -> concatenate IDAT -> zlib-inflate -> per-scanline unfilter
    (None/Sub/Up/Average/Paeth), once per raster for sequential images
    and once per reduced pass for Adam7.
    """
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or comp != 0 or filt != 0:
        raise NotImplementedError(
            f"only 8-bit depth gray/RGB/GA/RGBA PNG supported (depth "
            f"{depth}, color type {color})")
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        return _png_unfilter(raw, 0, h, w * channels, channels) \
            .reshape(h, w, channels)
    if interlace != 1:
        raise ValueError(f"invalid PNG interlace method {interlace}")
    # Adam7: seven reduced passes, each an independently-filtered
    # raster, concatenated in the inflate stream; scatter each pass's
    # pixels onto its (x0::dx, y0::dy) grid
    img = np.zeros((h, w, channels), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7_PASSES:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty pass contributes zero bytes
        sub = _png_unfilter(raw, off, ph, pw * channels, channels)
        off += ph * (pw * channels + 1)
        img[y0::dy, x0::dx] = sub.reshape(ph, pw, channels)
    return img


#: Adam7 pass grid: (x_start, y_start, x_step, y_step), spec order.
_ADAM7_PASSES = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_unfilter(raw: bytes, offset: int, h: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering for ``h`` lines of ``stride``
    bytes starting at ``offset`` in the inflated stream; returns
    (h, stride) uint8."""
    if len(raw) - offset < h * (stride + 1):
        raise ValueError("PNG raster truncated")
    lines = np.frombuffer(raw, np.uint8, h * (stride + 1), offset) \
        .reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype, row = lines[y, 0], lines[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else \
            np.zeros(stride, np.int32)
        if ftype == 0:            # None
            rec = row
        elif ftype == 2:          # Up
            rec = (row + prev) & 0xFF
        elif ftype == 1:          # Sub: recon[x] = raw[x] + recon[x-bpp]
            # per-lane prefix sum mod 256 — fully vectorized
            rec = (row.reshape(-1, bpp).cumsum(axis=0) & 0xFF) \
                .reshape(stride)
        elif ftype == 3:          # Average (sequential in `left`: the
            # scalar loop runs on plain lists — numpy scalar indexing
            # is ~5x slower per element)
            rl, pl = row.tolist(), prev.tolist()
            rec_l = [0] * stride
            for x in range(stride):
                left = rec_l[x - bpp] if x >= bpp else 0
                rec_l[x] = (rl[x] + ((left + pl[x]) >> 1)) & 0xFF
            rec = np.asarray(rec_l, dtype=np.int32)
        elif ftype == 4:          # Paeth (same list-loop rationale)
            rl, pl = row.tolist(), prev.tolist()
            rec_l = [0] * stride
            for x in range(stride):
                a = rec_l[x - bpp] if x >= bpp else 0
                b = pl[x]
                c = pl[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else \
                    (b if pb <= pc else c)
                rec_l[x] = (rl[x] + pred) & 0xFF
            rec = np.asarray(rec_l, dtype=np.int32)
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def _encode_png(pix: np.ndarray, filter_cycle: bool = False,
                interlace: bool = False) -> bytes:
    """(h, w, c) uint8 -> PNG payload — inverse of :func:`_parse_png`.
    ``filter_cycle`` applies filter type ``y % 5`` to scanline ``y``
    (instead of all-None), so fixtures exercise every unfilter path.
    ``interlace`` emits the Adam7 layout (each reduced pass filtered
    independently, spec pass order)."""
    import zlib

    h, w, c = pix.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}[c]
    pix = np.ascontiguousarray(pix)
    if interlace:
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7_PASSES:
            sub = pix[y0::dy, x0::dx]
            if sub.size:
                lines += _png_filter_lines(sub, filter_cycle)
    else:
        lines = _png_filter_lines(pix, filter_cycle)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0,
                       1 if interlace else 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(bytes(lines))) +
            chunk(b"IEND", b""))


def _png_filter_lines(pix: np.ndarray, filter_cycle: bool) -> bytearray:
    """Filter one raster's scanlines (spec filters 0-4)."""
    h = pix.shape[0]
    c = pix.shape[2]
    stride = pix.shape[1] * c
    rows = np.ascontiguousarray(pix).reshape(h, stride).astype(np.int32)
    lines = bytearray()
    for y in range(h):
        ftype = (y % 5) if filter_cycle else 0
        row = rows[y]
        prev = rows[y - 1] if y else np.zeros(stride, np.int32)
        left = np.concatenate([np.zeros(c, np.int32), row[:-c]]) \
            if stride > c else np.zeros(stride, np.int32)
        upleft = np.concatenate([np.zeros(c, np.int32), prev[:-c]]) \
            if stride > c else np.zeros(stride, np.int32)
        if ftype == 0:
            enc = row
        elif ftype == 1:
            enc = row - left
        elif ftype == 2:
            enc = row - prev
        elif ftype == 3:
            enc = row - ((left + prev) >> 1)
        else:  # Paeth predictor (same selection rule as the decoder)
            p = left + prev - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = row - pred
        lines.append(ftype)
        lines.extend((enc & 0xFF).astype(np.uint8).tobytes())
    return lines


def _image_features(pix: np.ndarray) -> np.ndarray:
    """Deterministic 8-dim feature vector from decoded pixels:
    per-channel means (gray replicated), global std/min/max, and the
    two aspect fractions."""
    h, w, c = pix.shape
    flat = pix.astype(np.float32) / 255.0
    means = [float(flat[..., i].mean()) for i in range(c)]
    while len(means) < 3:
        means.append(means[0])
    feats = np.array(means + [float(flat.std()), float(flat.min()),
                              float(flat.max()), w / (w + h), h / (w + h)],
                     dtype=np.float32)
    return feats.round(6)


def _decode_image_real(payload: bytes):
    """REAL image decode, pure numpy/stdlib: PPM/PGM (netpbm), 24-bpp
    BMP, 8-bit PNG, baseline JPEG, and GIF87a/89a (first frame).
    Dispatches on magic bytes; anything else raises."""
    pix = _decode_pixels_real(payload)
    h, w, c = pix.shape
    return w, h, c, _image_features(pix)


def _decode_pixels_real(payload: bytes) -> np.ndarray:
    if payload[:2] in (b"P6", b"P5"):
        return _parse_pnm(payload)
    if payload[:2] == b"BM":
        return _parse_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _parse_png(payload)
    if payload[:2] == b"\xFF\xD8":
        from .codecs import parse_jpeg
        return parse_jpeg(payload)
    if payload[:4] == b"GIF8":
        from .codecs import parse_gif
        return parse_gif(payload)
    raise NotImplementedError(
        "real decode supports PPM/PGM/BMP/PNG/JPEG/GIF; other formats "
        "require an imaging library (e.g. PIL) not available in this "
        "environment — use deterministic_fake=True for opaque payloads")


def _parse_wav(data: bytes):
    """Decode a RIFF/WAVE payload to (sample_rate, float32 mono samples
    in [-1, 1), canonical_bytes). Multi-channel audio is averaged to
    mono. Chunk-walks the container, so extra chunks (LIST, fact) are
    fine.

    Supported formats (all pure numpy/stdlib — companders and ADPCM via
    :mod:`xdlake_spark.operators.codecs`): PCM 8/16/24/32-bit (fmt 1),
    IEEE float32/float64 (fmt 3), A-law (fmt 6), mu-law (fmt 7), and
    mono IMA ADPCM (fmt 0x11).  ``canonical_bytes`` is the original
    data chunk for PCM16 (hash-stable with earlier releases) and the
    decoded mono PCM16 little-endian bytes for every other format, so
    downstream per-chunk hashing always maps a fixed 2 bytes/sample.
    """
    from . import codecs as _codecs

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, sr, n_ch, bits, align, raw = 12, None, None, None, None, 0, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            fmt, n_ch, sr, _brate, align = struct.unpack_from(
                "<HHIIH", data, body)
            bits = struct.unpack_from("<H", data, body + 14)[0]
        elif cid == b"data":
            raw = data[body:body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if sr is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt == 1 and bits == 16:
        usable = raw[:len(raw) - (len(raw) % (2 * n_ch))]
        pcm = np.frombuffer(usable, dtype="<i2") \
            .astype(np.float32) / 32768.0
        canonical = raw
    elif fmt == 1 and bits == 8:                 # unsigned 8-bit PCM
        pcm = (np.frombuffer(raw, np.uint8).astype(np.float32)
               - 128.0) / 128.0
        canonical = None
    elif fmt == 1 and bits in (24, 32):
        width = bits // 8
        usable = raw[:len(raw) - (len(raw) % width)]
        b = np.frombuffer(usable, np.uint8).reshape(-1, width)
        val = np.zeros(len(b), np.int64)
        for i in range(width):                   # little-endian assemble
            val |= b[:, i].astype(np.int64) << (8 * i)
        val = np.where(val >= 1 << (bits - 1), val - (1 << bits), val)
        pcm = (val / float(1 << (bits - 1))).astype(np.float32)
        canonical = None
    elif fmt == 3 and bits in (32, 64):          # IEEE float
        dt = "<f4" if bits == 32 else "<f8"
        width = bits // 8
        usable = raw[:len(raw) - (len(raw) % width)]
        pcm = np.frombuffer(usable, dt).astype(np.float32)
        canonical = None
    elif fmt == 6:                               # G.711 A-law
        pcm = _codecs.alaw_decode(np.frombuffer(raw, np.uint8)) \
            .astype(np.float32) / 32768.0
        canonical = None
    elif fmt == 7:                               # G.711 mu-law
        pcm = _codecs.ulaw_decode(np.frombuffer(raw, np.uint8)) \
            .astype(np.float32) / 32768.0
        canonical = None
    elif fmt == 0x11:                            # IMA ADPCM
        if n_ch not in (1, 2):
            raise NotImplementedError(
                "only mono/stereo IMA-ADPCM WAV supported")
        if align <= 4 * n_ch:
            raise ValueError("IMA-ADPCM blockAlign too small")
        spb = (align - 4 * n_ch) * 2 // n_ch + 1
        blocks = [raw[i:i + align] for i in range(0, len(raw), align)]
        if n_ch == 1:
            pieces = [_codecs.ima_adpcm_decode_block(blk, spb)
                      for blk in blocks if len(blk) >= 5]
            ints = np.concatenate(pieces) if pieces else \
                np.zeros(0, np.int16)
            pcm = ints.astype(np.float32) / 32768.0
            canonical = ints.astype("<i2").tobytes()
        else:
            pieces = [_codecs.ima_adpcm_decode_block_stereo(blk, spb)
                      for blk in blocks if len(blk) >= 9]
            ints = np.concatenate(pieces) if pieces else \
                np.zeros((0, 2), np.int16)
            # interleaved float -> the shared downmix + canonical path
            pcm = ints.reshape(-1).astype(np.float32) / 32768.0
            canonical = None
    else:
        raise NotImplementedError(
            f"unsupported WAV encoding (format {fmt}, {bits}-bit) — "
            "supported: PCM 8/16/24/32, IEEE float, A-law, mu-law, "
            "mono/stereo IMA ADPCM")
    if n_ch > 1:
        pcm = pcm[:len(pcm) - (len(pcm) % n_ch)] \
            .reshape(-1, n_ch).mean(axis=1)
    if canonical is None:
        canonical = np.clip(np.round(pcm * 32768.0), -32768, 32767) \
            .astype("<i2").tobytes()
    return sr, pcm, canonical


def _parse_audio(data: bytes):
    """Audio container dispatch on magic bytes: RIFF/WAVE (all
    encodings of :func:`_parse_wav`) or FLAC (lossless, decoded by
    :func:`xdlake_spark.operators.codecs.parse_flac`).  Same contract
    as ``_parse_wav``: (sample_rate, float32 mono, canonical PCM16
    bytes)."""
    if data[:4] == b"fLaC":
        from .codecs import parse_flac

        sr, pcm_int = parse_flac(data)
        mono = pcm_int.astype(np.float64).mean(axis=1)
        pcm = (mono / 32768.0).astype(np.float32)
        canonical = np.clip(np.round(mono), -32768, 32767) \
            .astype("<i2").tobytes()
        return sr, pcm, canonical
    if data[:3] == b"ID3" or (len(data) >= 2 and data[0] == 0xFF
                              and (data[1] & 0xE0) == 0xE0):
        # MPEG audio: full Layer III PCM decode (operators/mp3.py —
        # scalefactors, Huffman, requantize, stereo, IMDCT, polyphase).
        # Frames selecting Huffman tables outside the verified set
        # raise loudly (see the provenance rationale in mp3.py).
        from .mp3 import decode_mp3

        sr, frames = decode_mp3(data)
        pcm = frames.astype(np.float64).mean(axis=1).astype(np.float32) \
            if frames.size else np.zeros(0, np.float32)
        canonical = np.clip(np.round(pcm * 32768.0), -32768, 32767) \
            .astype("<i2").tobytes()
        return sr, pcm, canonical
    return _parse_wav(data)


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


#: Frame-sampling output: one row per sampled frame. width/height are
#: NULL on the deterministic-fake path (opaque byte slices have no
#: raster geometry).
FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("frame_sha256", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", every_n: int = 10,
                  deterministic_fake: bool = False) -> DataFrame:
    """Video payload -> every-Nth-frame rows (fan-out via mapInPandas).

    REAL path (default): the payload is parsed as an MJPEG AVI (RIFF
    container walk + per-frame baseline-JPEG decode) or an animated
    GIF (full GIF89a composition: transparency + keep/restore-
    background/restore-previous disposal), both pure numpy/stdlib —
    operators/codecs.py; each sampled row carries the decoded frame's
    dimensions and the sha256 of its composed RGB pixel bytes, proving
    the frame really decoded.  Container formats needing ffmpeg
    (MP4/MKV/H.264) raise.  The fake treats each 1 KiB slice of
    payload as one 'frame' so the row-expansion plumbing is testable
    on opaque payloads.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs as _codecs

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if deterministic_fake:
                    n_frames = max(1, len(data) // 1024)
                    for i in range(0, n_frames, every_n):
                        chunk = data[i * 1024:(i + 1) * 1024]
                        rows.append({
                            "doc_id": int(doc_id), "frame_index": i,
                            "frame_sha256":
                                hashlib.sha256(chunk).hexdigest(),
                            "width": None, "height": None,
                        })
                    continue
                if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                    _fps, jpegs = _codecs.parse_avi_mjpeg(data)
                    pix_frames = ((i, _codecs.parse_jpeg(jpegs[i]))
                                  for i in range(0, len(jpegs), every_n))
                elif data[:4] == b"GIF8":
                    composed = _codecs.parse_gif_frames(data)
                    pix_frames = ((i, composed[i])
                                  for i in range(0, len(composed),
                                                 every_n))
                else:
                    raise NotImplementedError(
                        "real video decode supports MJPEG AVI and "
                        "animated GIF; MP4/MKV need ffmpeg — use "
                        "deterministic_fake=True for opaque payloads")
                for i, pix in pix_frames:
                    rows.append({
                        "doc_id": int(doc_id), "frame_index": i,
                        "frame_sha256":
                            hashlib.sha256(pix.tobytes()).hexdigest(),
                        "width": int(pix.shape[1]),
                        "height": int(pix.shape[0]),
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

    REAL path (default): decode PPM/PGM/BMP pixels, nearest-neighbor
    resample to (target_w, target_h), re-encode as PPM/PGM — output
    payloads re-decode, so resize -> decode -> features chains work on
    real rasters. The fake resamples payload bytes at a uniform stride
    down to ``target_w * target_h * channels`` bytes (channels from the
    fake decode) — deterministic, size-exact, for opaque payloads.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if deterministic_fake:
                    _, _, channels, _ = _decode_image_fake(data)
                    n_out = target_w * target_h * channels
                    src = np.frombuffer(data, dtype=np.uint8) if data \
                        else np.zeros(1, dtype=np.uint8)
                    idx = np.linspace(0, len(src) - 1,
                                      n_out).astype(np.int64)
                    out_payload = src[idx].tobytes()
                else:
                    pix = _decode_pixels_real(data)
                    h, w, channels = pix.shape
                    yi = np.linspace(0, h - 1,
                                     target_h).round().astype(np.int64)
                    xi = np.linspace(0, w - 1,
                                     target_w).round().astype(np.int64)
                    out_payload = _encode_pnm(pix[yi][:, xi])
                rows.append({
                    "doc_id": int(doc_id), "width": target_w,
                    "height": target_h, "n_channels": channels,
                    "payload": out_payload,
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
    """Payload -> ``dim``-dimensional float vector, batch-vectorized.
    Output is embedding-shaped, so it feeds directly into the
    similarity operators (operators/similarity.py).

    REAL path (default): decode the raster (PPM/PGM/BMP) and emit an
    L1-normalized ``dim``-bin grayscale intensity histogram — the
    classic codec-free image descriptor. Fake path: ``dim`` bytes of
    the payload digest (per-row work is only the digest; the matrix
    normalization is one numpy op per Arrow batch).
    """
    if deterministic_fake and dim > 32:
        raise ValueError("fake extractor derives at most 32 dims per digest")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if deterministic_fake:
                digests = [hashlib.sha256(
                    bytes(p) if p is not None else b"").digest()
                    for p in pdf[payload_col]]
                if digests:
                    mat = np.frombuffer(b"".join(digests), dtype=np.uint8)
                    mat = mat.reshape(len(digests), 32)[:, :dim]
                    feats = (mat.astype(np.float32) / 255.0).round(6)
                else:
                    feats = np.zeros((0, dim), dtype=np.float32)
                rows = [row.tolist() for row in feats]
            else:
                rows = []
                for p in pdf[payload_col]:
                    pix = _decode_pixels_real(
                        bytes(p) if p is not None else b"")
                    gray = pix.astype(np.float32).mean(axis=2)
                    hist, _ = np.histogram(gray, bins=dim,
                                           range=(0.0, 256.0))
                    v = hist.astype(np.float32)
                    v /= max(float(v.sum()), 1.0)
                    rows.append(v.round(6).tolist())
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64").values,
                "features": rows,
            }, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=FEATURES_SCHEMA)


def attach_fake_payloads(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         size: int = 4096,
                         media: str = "text") -> DataFrame:
    """Deterministically synthesize a binary payload column — the test
    fixture for the multimodal pipeline in an environment without real
    media files.

    ``media="text"``: repeat text bytes to ``size`` (opaque payload for
    the deterministic_fake decode paths). Image kinds ``"ppm"`` /
    ``"png"`` / ``"jpeg"`` / ``"gif"``: REAL media keyed on the id — an
    RGB gradient raster (dimensions and pattern derived from the id;
    the SAME pixels for ppm/png/jpeg, so the decoders can be
    differentially tested — jpeg is lossy, so compare with tolerance).
    PNG payloads cycle the scanline filter type per row; JPEG payloads
    cycle 4:4:4 / 4:2:0 and restart intervals; GIF payloads quantize to
    a 64-color palette and alternate interlacing. Audio kinds
    ``"wav"`` (PCM16) / ``"wav_ulaw"`` / ``"wav_alaw"`` (G.711) /
    ``"wav_adpcm"`` (IMA) / ``"wav_f32"`` (IEEE float): a RIFF sine
    tone (frequency derived from the id) in that encoding.

    The input is spread to the session's default parallelism first
    (stats-based, no eager plan compile): the documents table is a
    handful of parquet splits at test scale, which would otherwise
    serialize the per-payload encode AND every decode stage chained
    after it onto a few cores.  At cluster scale the repartition is a
    no-op — real payload corpora arrive with plenty of splits.
    """
    from . import ensure_parallelism

    df = ensure_parallelism(df)
    if media == "text":
        repeats = (F.lit(size) / F.greatest(F.length(F.col(text_col)),
                                            F.lit(1))).cast("int") + 1
        repeated = F.repeat(F.col(text_col), repeats)
        return df.select(F.col(id_col),
                         F.encode(F.substring(repeated, 1, size),
                                  "utf-8").alias("payload"))
    image_kinds = ("ppm", "png", "jpeg", "gif")
    audio_kinds = ("wav", "wav_ulaw", "wav_alaw", "wav_adpcm", "wav_f32",
                   "flac")
    if media not in image_kinds + audio_kinds + (
            "avi", "agif", "noise_ppm", "melody_wav", "melody_snip",
            "mp3", "mp3_tone", "mp4"):
        raise ValueError(f"unknown media kind: {media!r}")

    from pyspark.sql.functions import pandas_udf

    if media == "mp4":
        from . import codecs as _codecs

        @pandas_udf("binary")
        def _gen(ids: pd.Series) -> pd.Series:
            # id-keyed ISO-BMFF stubs: resolution/codec/track layout
            # cycle with the id; every 3rd doc is video-only
            dims = ((640, 360), (1280, 720), (1920, 1080), (320, 240))
            out = []
            for i in ids:
                i = int(i)
                w, h = dims[i % 4]
                tracks = [{"handler": "vide",
                           "codec": ("avc1", "hev1")[i % 2],
                           "n_samples": 24 + i % 30,
                           "sample_size": 800 + i % 100,
                           "width": w, "height": h}]
                if i % 3 != 0:
                    tracks.append({"handler": "soun", "codec": "mp4a",
                                   "n_samples": 40 + i % 25,
                                   "sample_size": 256 + i % 64})
                out.append(_codecs.build_mp4(
                    tracks, duration_ms=500 + (i % 20) * 250))
            return pd.Series(out)

        return df.select(F.col(id_col),
                         _gen(F.col(id_col)).alias("payload"))

    if media == "mp3_tone":
        from .mp3 import encode_mp3_tone

        @pandas_udf("binary")
        def _gen(ids: pd.Series) -> pd.Series:
            # id-keyed REAL-spectrum Layer III streams (full encoder,
            # operators/mp3.py): pitch, amplitude and channel count
            # cycle with the id, so the decode side exercises the
            # whole Huffman/requantize/IMDCT/polyphase chain per doc.
            # Every 3rd doc is a 22.05 kHz MPEG-2 LSF stream (r9) —
            # real web-crawl audio mixes sampling families, and the
            # LSF side-info/scalefactor path decodes in the same pass.
            # Every 6th doc is LSF JOINT-STEREO INTENSITY (r10): the
            # 13818-3 power-of-two panning path decodes in-fleet too.
            # Docs at 5 mod 6 are MPEG-1 intensity (11172-3 tan
            # panning), and every 12th / 11-mod-12th doc carries its
            # intensity on SHORT blocks (r10) — all four intensity
            # decode paths exercise in one corpus.
            out = []
            for i in ids:
                i = int(i)
                lsf = i % 3 == 0
                out.append(encode_mp3_tone(
                    freq=220.0 * (1 + i % 8),
                    n_frames=4 if lsf else 2,   # same 2304 samples
                    sample_rate=22050 if lsf else 48000,
                    channels=1 + i % 2,
                    amplitude=0.25 + 0.05 * (i % 6),
                    bitrate=160 if lsf else 320,
                    intensity=(i % 6 in (0, 5)),
                    block_type=2 if i % 12 in (0, 11) else 0))
            return pd.Series(out)

        return df.select(F.col(id_col),
                         _gen(F.col(id_col)).alias("payload"))

    if media == "mp3":
        from . import codecs as _codecs

        @pandas_udf("binary")
        def _gen(ids: pd.Series) -> pd.Series:
            # id-keyed silence streams exercising every walker path:
            # frame count/bitrate vary with the id; every 3rd doc is
            # VBR; every 4th carries an ID3v2 tag
            out = []
            for i in ids:
                i = int(i)
                out.append(_codecs.build_mp3_stream(
                    n_frames=8 + i % 17,
                    bitrate=(64, 128, 192, 320)[i % 4],
                    channels=1 + i % 2,
                    vbr_bitrates=[96, 160, 256] if i % 3 == 0 else None,
                    id3_title=f"doc-{i}" if i % 4 == 0 else None))
            return pd.Series(out)

        return df.select(F.col(id_col),
                         _gen(F.col(id_col)).alias("payload"))

    if media == "noise_ppm":
        # near-dup fixture for perceptual hashing: ids sharing id % 40
        # get the SAME noise raster (seeded PCG64), with the non-canonic
        # members brightness-shifted (range [8, 240) so no clipping —
        # dhash's gradient signs are exactly invariant) plus a 1x2
        # perturbed patch (a few flipped hash bits). Different groups
        # are independent noise: expected Hamming ~32, so the banded
        # join has essentially zero cross-group candidates.
        @pandas_udf("binary")
        def _gen(ids: pd.Series) -> pd.Series:
            out = []
            for i in ids:
                i = int(i)
                rng = np.random.default_rng(1000 + i % 40)
                pix = rng.integers(8, 240, size=(20, 24, 3),
                                   dtype=np.int16)
                v = (i // 40) % 4
                if v:
                    pix = pix + 2 * v
                    r, c = (i * 7) % 19, (i * 5) % 23
                    pix[r, c:c + 2] = (i * 31) % 200 + 8
                out.append(_encode_pnm(pix.astype(np.uint8)))
            return pd.Series(out)

        return df.select(F.col(id_col),
                         _gen(F.col(id_col)).alias("payload"))

    if media in ("avi", "agif"):
        from . import codecs as _codecs

        @pandas_udf("binary")
        def _gen(ids: pd.Series) -> pd.Series:
            # a 12-frame video: the id-keyed gradient raster panned one
            # pixel per frame — MJPEG AVI (q92 JPEG frames) or animated
            # GIF (16-color palette, disposal cycling by id)
            out = []
            for i in ids:
                i = int(i)
                w, h = 16 + i % 17, 12 + i % 13
                y, x = np.mgrid[0:h, 0:w]
                if media == "avi":
                    frames = [_codecs.encode_jpeg(
                        np.stack([(x * 3 + y * 5 + c * 7 + i + f) % 256
                                  for c in range(3)],
                                 axis=2).astype(np.uint8), quality=92)
                        for f in range(12)]
                    out.append(_codecs.encode_avi_mjpeg(frames, w, h,
                                                        fps=10.0))
                else:
                    palette = np.stack(
                        [np.arange(16) * 16, (np.arange(16) * 5 + i)
                         % 256, np.arange(16)[::-1] * 16],
                        axis=1).astype(np.uint8)
                    frames = [((x + 2 * y + i + f) % 16)
                              .astype(np.uint8) for f in range(12)]
                    out.append(_codecs.encode_gif_animation(
                        frames, palette, transparent=3,
                        disposal=1 + i % 3))
            return pd.Series(out)

        return df.select(F.col(id_col),
                         _gen(F.col(id_col)).alias("payload"))

    if media in image_kinds:
        from . import codecs as _codecs

        if media == "ppm":
            encode = lambda pix, i=0: _encode_pnm(pix)
        elif media == "png":
            encode = lambda pix, i=0: _encode_png(pix, filter_cycle=True)
        elif media == "jpeg":
            # vary subsampling / restart markers so every decode path runs
            encode = lambda pix, i=0: _codecs.encode_jpeg(
                pix, quality=92, subsample=bool(i % 2),
                restart_interval=(i % 3))
        else:  # gif — quantize the gradient to a 64-color palette
            def encode(pix, i=0):
                flat = pix.reshape(-1, 3) >> 2
                idx = (flat[:, 0] + flat[:, 1] + flat[:, 2]) % 64
                palette = np.stack([np.arange(64) * 4,
                                    (np.arange(64) * 7 + i) % 256,
                                    np.arange(64)[::-1] * 4],
                                   axis=1).astype(np.uint8)
                return _codecs.encode_gif(
                    idx.reshape(pix.shape[:2]).astype(np.uint8),
                    palette, interlace=bool(i % 2))

        @pandas_udf("binary")
        def _gen(ids: pd.Series) -> pd.Series:
            out = []
            for i in ids:
                i = int(i)
                w, h = 16 + i % 17, 12 + i % 13
                y, x = np.mgrid[0:h, 0:w]
                pix = np.stack([(x * 3 + y * 5 + c * 7 + i) % 256
                                for c in range(3)],
                               axis=2).astype(np.uint8)
                out.append(encode(pix, i))
            return pd.Series(out)
    else:
        from . import codecs as _codecs

        def _wav(fmt: int, bits: int, frames: bytes, sr: int,
                 align: int) -> bytes:
            return (b"RIFF" + struct.pack("<I", 36 + len(frames)) +
                    b"WAVE" + b"fmt " + struct.pack(
                        "<IHHIIHH", 16, fmt, 1, sr,
                        sr * max(align, 1), align, bits) +
                    b"data" + struct.pack("<I", len(frames)) + frames)

        if media in ("melody_wav", "melody_snip"):
            # audio-fingerprint fixture: an 8-note PCM16 "melody" keyed
            # on id % 30 (docs in a group share the exact recording);
            # the snip kind is notes 2..5 of the same melody — 4096
            # samples in, an exact multiple of the fingerprinting hop,
            # so snippet frames align sample-for-sample with the full
            # recording and matching recovers offset = 16 frames.
            @pandas_udf("binary")
            def _gen(ids: pd.Series) -> pd.Series:
                out = []
                sr, seg, nseg = 8000, 2048, 8
                ts = np.arange(seg, dtype=np.float64) / sr
                for i in ids:
                    i = int(i)
                    rng = np.random.default_rng(2000 + i % 30)
                    # 3-note chords spread across the spectral bands so
                    # the per-band peak constellation discriminates
                    # between melodies (a lone sine would light up one
                    # band and alias across groups)
                    chords = 200.0 + rng.integers(0, 60, (nseg, 3)) * 40.0
                    take = range(2, 6) if media == "melody_snip" \
                        else range(nseg)
                    wave = np.concatenate(
                        [np.sin(2 * np.pi * chords[s][:, None] * ts)
                         .sum(axis=0) * 0.3 for s in take])
                    ints = np.round(wave * 32767.0).astype(np.int16)
                    out.append(_wav(1, 16, ints.astype("<i2").tobytes(),
                                    sr, 2))
                return pd.Series(out)

            return df.select(F.col(id_col),
                             _gen(F.col(id_col)).alias("payload"))

        @pandas_udf("binary")
        def _gen(ids: pd.Series) -> pd.Series:
            out = []
            sr, n = 8000, 2000  # 0.25 s
            t = np.arange(n, dtype=np.float64) / sr
            for i in ids:
                i = int(i)
                freq = 200.0 + (i % 200)
                wave = np.sin(2 * np.pi * freq * t) * 0.5
                ints = np.round(wave * 32767.0).astype(np.int16)
                if media == "wav":
                    out.append(_wav(1, 16, ints.astype("<i2").tobytes(),
                                    sr, 2))
                elif media == "wav_ulaw":
                    out.append(_wav(7, 8,
                                    _codecs.ulaw_encode(ints).tobytes(),
                                    sr, 1))
                elif media == "wav_alaw":
                    out.append(_wav(6, 8,
                                    _codecs.alaw_encode(ints).tobytes(),
                                    sr, 1))
                elif media == "wav_f32":
                    out.append(_wav(3, 32,
                                    wave.astype("<f4").tobytes(), sr, 4))
                elif media == "flac":
                    out.append(_codecs.encode_flac(ints, sr,
                                                   block_size=512))
                else:  # wav_adpcm — 505 samples/block (align 256)
                    align, spb = 256, 505
                    blocks = [
                        _codecs.ima_adpcm_encode_block(ints[s:s + spb])
                        for s in range(0, len(ints), spb)
                        if len(ints[s:s + spb]) > 1]
                    out.append(_wav(0x11, 4, b"".join(blocks), sr, align))
            return pd.Series(out)

    return df.select(F.col(id_col), _gen(F.col(id_col)).alias("payload"))


#: MP3 stream-walk output: one metadata row per document.
MP3_INFO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("layer", T.IntegerType()),
    T.StructField("mpeg_version", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("bitrate_kbps", T.DoubleType()),
    T.StructField("is_vbr", T.BooleanType()),
    T.StructField("has_xing", T.BooleanType()),
])


def mp3_stream_info(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "doc_id") -> DataFrame:
    """MPEG-audio frame walk over binary payloads → one metadata row
    per document (sample rate, channel count, frame count, duration,
    mean bitrate, VBR/Xing detection).  This is the media-triage front
    of an audio corpus pipeline: duration/bitrate histograms, CBR/VBR
    split, and corrupt-stream detection at 100 TB need only the frame
    layer, never PCM.  Pure header arithmetic inside Arrow batches
    (``mapInPandas``) — payload bytes never shuffle, and a payload with
    no recognizable frame yields no row (count the drop as
    input − output)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import parse_mp3_frames
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = parse_mp3_frames(bytes(data))
                except ValueError:
                    continue
                rows.append({
                    "doc_id": int(doc_id),
                    "sample_rate": m["sample_rate"],
                    "channels": m["channels"], "layer": m["layer"],
                    "mpeg_version": m["version"],
                    "n_frames": m["n_frames"],
                    "duration_s": m["duration_s"],
                    "bitrate_kbps": m["bitrate_kbps"],
                    "is_vbr": m["is_vbr"], "has_xing": m["has_xing"],
                })
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              MP3_INFO_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=MP3_INFO_SCHEMA)


#: MP4/ISO-BMFF container-walk output: one metadata row per document.
MP4_INFO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("major_brand", T.StringType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("n_tracks", T.IntegerType()),
    T.StructField("video_codec", T.StringType()),
    T.StructField("audio_codec", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_video_samples", T.IntegerType()),
    T.StructField("n_audio_samples", T.IntegerType()),
    T.StructField("media_bytes", T.LongType()),
    T.StructField("has_fragments", T.BooleanType()),
])


def mp4_stream_info(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "doc_id") -> DataFrame:
    """ISO-BMFF (MP4/MOV) box walk over binary payloads → one metadata
    row per document: brand, duration, track layout, codec fourccs,
    resolution, sample counts, media byte totals, fragmentation flag.
    Container-only (ISO 14496-12) — the triage surface for video
    corpora (length/resolution/codec histograms, corrupt-file
    detection) without decoding a single codec frame.  Pure header
    arithmetic inside Arrow batches (``mapInPandas``); payload bytes
    never shuffle; unparseable payloads drop their row (count the
    drop as input − output)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import parse_mp4
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = parse_mp4(bytes(data))
                except ValueError:
                    continue
                vid = next((t for t in m["tracks"]
                            if t["handler"] == "vide"), None)
                aud = next((t for t in m["tracks"]
                            if t["handler"] == "soun"), None)
                rows.append({
                    "doc_id": int(doc_id),
                    "major_brand": m["major_brand"],
                    "duration_s": m["duration_s"],
                    "n_tracks": m["n_tracks"],
                    "video_codec": vid["codec"] if vid else None,
                    "audio_codec": aud["codec"] if aud else None,
                    "width": vid["width"] if vid else None,
                    "height": vid["height"] if vid else None,
                    "n_video_samples":
                        vid["n_samples"] if vid else None,
                    "n_audio_samples":
                        aud["n_samples"] if aud else None,
                    "media_bytes": sum(t["total_sample_bytes"]
                                       for t in m["tracks"]),
                    "has_fragments": m["has_fragments"],
                })
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              MP4_INFO_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=MP4_INFO_SCHEMA)


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

    REAL path (default): the payload is parsed as a RIFF/WAVE PCM16
    container (pure numpy+struct, no audio library) — the fmt chunk's
    own sample rate drives the chunking and multi-channel audio is
    averaged to mono. ``deterministic_fake`` interprets the raw bytes
    as headerless PCM16 mono at ``sample_rate`` for opaque payloads.
    Per-chunk numpy is vectorized inside Arrow batches; fan-out shape
    matches :func:`sample_frames`.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if deterministic_fake:
                    if len(data) < 2:
                        continue
                    sr = sample_rate
                    raw = data[: len(data) - (len(data) % 2)]
                    pcm = np.frombuffer(raw, dtype="<i2") \
                        .astype(np.float32) / 32768.0
                else:
                    sr, pcm, raw = _parse_audio(data)
                    if not len(pcm):
                        continue
                chunk_len = max(1, int(sr * chunk_seconds))
                bytes_per_sample = len(raw) // max(len(pcm), 1)
                for ci in range(0, len(pcm), chunk_len):
                    chunk = pcm[ci:ci + chunk_len]
                    rb = raw[ci * bytes_per_sample:
                             (ci + len(chunk)) * bytes_per_sample]
                    rows.append({
                        "doc_id": int(doc_id),
                        "chunk_index": ci // chunk_len,
                        "n_samples": int(len(chunk)),
                        "rms": float(np.sqrt(np.mean(chunk ** 2))),
                        "peak": float(np.max(np.abs(chunk))),
                        "chunk_sha256":
                            hashlib.sha256(rb).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              AUDIO_CHUNK_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=AUDIO_CHUNK_SCHEMA)
