"""Unit tests for the pure-numpy media codecs (no Spark session).

JPEG/GIF/G.711/IMA-ADPCM are implemented from public specs in
xdlake_spark/operators/codecs.py; these tests pin (a) encoder->decoder
roundtrip error bounds, (b) spec conventions via hand-assembled golden
bytes that do NOT pass through our encoder (so a shared encoder/decoder
bug cannot hide), and (c) the WAV container dispatch for every format.
"""

import struct

import numpy as np
import pytest

from xdlake_spark.operators import codecs as C
from xdlake_spark.operators.multimodal import _parse_wav


def _gradient(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 3 + y * 5 + c * 7 + seed) % 256
                     for c in range(3)], axis=2).astype(np.uint8)


class TestJpeg:
    @pytest.mark.parametrize("quality,subsample,rst,tol", [
        (95, False, 0, 4), (90, True, 0, 8), (85, False, 3, 8),
        (75, True, 2, 14),
    ])
    def test_roundtrip_gradient(self, quality, subsample, rst, tol):
        y, x = np.mgrid[0:29, 0:37]
        pix = np.stack([(x * 2 + y * 3 + c * 5) % 200 + 20
                        for c in range(3)], axis=2)  # smooth ramp
        data = C.encode_jpeg(pix.astype(np.uint8), quality=quality,
                             subsample=subsample, restart_interval=rst)
        dec = C.parse_jpeg(data)
        assert dec.shape == pix.shape
        err = np.abs(dec.astype(int) - pix.astype(int))
        assert err.max() <= tol, f"max pixel error {err.max()}"

    def test_roundtrip_grayscale(self):
        pix = (np.linspace(0, 255, 23 * 31).reshape(23, 31, 1)
               .astype(np.uint8))
        dec = C.parse_jpeg(C.encode_jpeg(pix, quality=95))
        assert dec.shape == (23, 31, 1)
        assert np.abs(dec.astype(int) - pix.astype(int)).max() <= 4

    def test_odd_dims_with_420(self):
        # 4:2:0 with dims not divisible by 16 exercises MCU padding/trim
        for h, w in [(9, 9), (17, 33), (8, 24), (15, 16)]:
            pix = _gradient(h, w) % 128 + 64
            dec = C.parse_jpeg(C.encode_jpeg(pix.astype(np.uint8),
                                             quality=90, subsample=True))
            assert dec.shape == (h, w, 3)

    def test_noise_survives(self):
        rng = np.random.default_rng(3)
        pix = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
        dec = C.parse_jpeg(C.encode_jpeg(pix, quality=50))
        assert dec.shape == pix.shape  # lossy, just must not crash/drift

    def test_golden_dc_only_handassembled(self):
        """A JPEG assembled bit-by-bit BY HAND (never touching our
        encoder): one 8x8 grayscale block, DC category 3 value +5,
        q[0,0]=16 -> every pixel must decode to 5*16/8 + 128 = 138.
        Pins: marker layout, DHT canonical code assignment, MSB-first
        bit order, EXTEND, zigzag DQT order, IDCT scaling, +128 shift.
        """
        qt = bytes([16] + [1] * 63)               # zigzag order, q00=16
        def seg(marker, body):
            return bytes([0xFF, marker]) + struct.pack(
                ">H", len(body) + 2) + body
        data = (b"\xFF\xD8" +
                seg(0xDB, b"\x00" + qt) +
                seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) +
                    bytes([1, 0x11, 0])) +
                # DC table 0: one code of length 2 -> symbol 3
                seg(0xC4, bytes([0x00, 0, 1] + [0] * 14) + bytes([3])) +
                # AC table 0: one code of length 2 -> symbol 0x00 (EOB)
                seg(0xC4, bytes([0x10, 0, 1] + [0] * 14) + bytes([0])) +
                seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])) +
                # bits: DC code '00', mag '101' (=5), EOB '00', pad '1'
                bytes([0b00101001]) +
                b"\xFF\xD9")
        dec = C.parse_jpeg(data)
        assert dec.shape == (8, 8, 1)
        assert (dec == 138).all()

    def test_lossless_mode_raises(self):
        pix = _gradient(8, 8)
        data = bytearray(C.encode_jpeg(pix, quality=90))
        i = data.find(b"\xFF\xC0")
        data[i + 1] = 0xC3                        # SOF3: lossless
        with pytest.raises(NotImplementedError, match="unsupported"):
            C.parse_jpeg(bytes(data))

    def test_byte_stuffing_roundtrip(self):
        # high-entropy block at quality 100 produces 0xFF bytes in the
        # entropy stream with high probability; stuffing must roundtrip
        rng = np.random.default_rng(11)
        pix = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        data = C.encode_jpeg(pix, quality=100)
        dec = C.parse_jpeg(data)
        assert np.abs(dec.astype(int) - pix.astype(int)).mean() < 16


class TestGif:
    @pytest.mark.parametrize("interlace", [False, True])
    def test_roundtrip_exact(self, interlace):
        rng = np.random.default_rng(5)
        pal = rng.integers(0, 256, (200, 3), dtype=np.uint8)
        idx = rng.integers(0, 200, (45, 61), dtype=np.uint8)
        out = C.parse_gif(C.encode_gif(idx, pal, interlace=interlace))
        assert (out == pal[idx]).all()

    def test_dictionary_reset_path(self):
        # enough distinct phrases to hit the 4096-entry LZW cap
        rng = np.random.default_rng(9)
        pal = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
        idx = rng.integers(0, 256, (120, 120), dtype=np.uint8)
        out = C.parse_gif(C.encode_gif(idx, pal))
        assert (out == pal[idx]).all()

    def test_golden_handassembled_2x2(self):
        """GIF87a assembled by hand: 2x2 image, 2-color palette,
        indices [[0,1],[1,0]]; LZW min code 2 (clear=4, end=5), codes
        packed LSB-first.  Width grows 3 -> 4 after the dictionary's
        entry 7 is created ("early change"), exactly where a spec
        encoder would grow it: clear,0,1 at width 3; 1,0,end at 4."""
        codes = [(4, 3), (0, 3), (1, 3), (1, 4), (0, 4), (5, 4)]
        acc = nbits = 0
        body = bytearray()
        for c, w in codes:
            acc |= c << nbits
            nbits += w
            while nbits >= 8:
                body.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            body.append(acc & 0xFF)
        data = (b"GIF87a" + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0) +
                bytes([255, 0, 0, 0, 0, 255] + [0] * 6) +  # pal: red, blue
                b"\x2C" + struct.pack("<HHHHB", 0, 0, 2, 2, 0) +
                bytes([2, len(body)]) + bytes(body) + b"\x00\x3B")
        out = C.parse_gif(data)
        expect = np.array([[[255, 0, 0], [0, 0, 255]],
                           [[0, 0, 255], [255, 0, 0]]], np.uint8)
        assert (out == expect).all()

    @pytest.mark.parametrize("disposal", [1, 2, 3])
    def test_animation_composition(self, disposal):
        """Animated GIF composition against an independent numpy
        replay: transparency holes keep the prior canvas, disposal 2
        restores the background, disposal 3 restores the previous
        canvas."""
        rng = np.random.default_rng(13)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        frames_idx = [rng.integers(0, 16, (10, 14), dtype=np.uint8)
                      for _ in range(4)]
        transparent = 5
        gif = C.encode_gif_animation(frames_idx, pal,
                                     transparent=transparent,
                                     disposal=disposal)
        got = C.parse_gif_frames(gif)
        assert len(got) == 4
        # independent composition replay
        bg = pal[0]
        canvas = np.broadcast_to(bg, (10, 14, 3)).copy()
        for f, idx in enumerate(frames_idx):
            prev = canvas.copy()
            opaque = idx != transparent
            canvas[opaque] = pal[idx][opaque]
            assert (got[f] == canvas).all(), f"frame {f} mismatch"
            if disposal == 2:
                canvas = np.broadcast_to(bg, (10, 14, 3)).copy()
            elif disposal == 3:
                canvas = prev

    def test_animation_first_frame_matches_parse_gif(self):
        rng = np.random.default_rng(21)
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        frames_idx = [rng.integers(0, 8, (6, 6), dtype=np.uint8)
                      for _ in range(3)]
        gif = C.encode_gif_animation(frames_idx, pal)
        assert (C.parse_gif(gif) ==
                C.parse_gif_frames(gif, max_frames=1)[0]).all()

    def test_89a_extension_blocks_skipped(self):
        pal = np.zeros((4, 3), np.uint8)
        idx = np.zeros((3, 3), np.uint8)
        data = bytearray(C.encode_gif(idx, pal))
        # splice a graphic-control extension after the header+palette
        gce = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
        insert_at = 13 + 4 * 3
        data[insert_at:insert_at] = gce
        data[:6] = b"GIF89a"
        assert C.parse_gif(bytes(data)).shape == (3, 3, 3)


class TestAviMjpeg:
    def test_container_roundtrip_exact_frames(self):
        frames = [C.encode_jpeg(_gradient(12, 16, seed=f), quality=90)
                  for f in range(5)]
        avi = C.encode_avi_mjpeg(frames, 16, 12, fps=10.0)
        fps, out = C.parse_avi_mjpeg(avi)
        assert fps == pytest.approx(10.0, rel=1e-4)
        assert len(out) == 5
        # the container must hand back the JPEG bytes untouched
        assert all(a == b for a, b in zip(out, frames))
        assert C.parse_jpeg(out[3]).shape == (12, 16, 3)

    def test_odd_sized_frames_pad_correctly(self):
        # odd-length chunk bodies are word-padded in RIFF; parser must
        # still recover every frame boundary
        frames = [b"\xFF\xD8" + bytes([f]) * (99 + f) + b"\xFF\xD9"
                  for f in range(4)]
        _, out = C.parse_avi_mjpeg(C.encode_avi_mjpeg(frames, 2, 2))
        assert out == frames

    def test_not_avi_raises(self):
        with pytest.raises(ValueError, match="RIFF/AVI"):
            C.parse_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")


class TestG711:
    def test_mulaw_spec_anchors(self):
        # G.711 table anchors: 0xFF -> 0, 0x7F -> -0 (both silence);
        # 0x80 -> loudest negative, 0x00 -> loudest positive magnitude
        assert C.ULAW_TABLE[0xFF] == 0
        assert C.ULAW_TABLE[0x7F] == 0
        assert C.ULAW_TABLE[0x00] == -(C.ULAW_TABLE[0x80])
        assert abs(int(C.ULAW_TABLE[0x80])) == 32124

    def test_alaw_spec_anchors(self):
        # A-law quietest codes decode to +-8; loudest to +-32256
        assert C.ALAW_TABLE[0xD5] == 8
        assert C.ALAW_TABLE[0x55] == -8
        assert int(np.max(C.ALAW_TABLE)) == 32256
        assert int(np.min(C.ALAW_TABLE)) == -32256

    @pytest.mark.parametrize("enc,dec,maxrel", [
        (C.ulaw_encode, C.ulaw_decode, 0.07),
        (C.alaw_encode, C.alaw_decode, 0.13),
    ])
    def test_compand_roundtrip(self, enc, dec, maxrel):
        rng = np.random.default_rng(1)
        pcm = rng.integers(-32768, 32768, 4000).astype(np.int16)
        rec = dec(enc(pcm))
        rel = (np.abs(rec.astype(int) - pcm.astype(int)) /
               np.maximum(np.abs(pcm.astype(int)), 64))
        assert rel.max() <= maxrel
        # idempotent on the codec's own output levels
        assert (dec(enc(rec)) == rec).all()

    def test_decode_tables_are_bijective_on_magnitudes(self):
        # 256 codes -> 256 distinct (sign, magnitude) pairs except the
        # two zero codes in mu-law
        assert len(set(C.ULAW_TABLE.tolist())) == 255
        assert len(set(C.ALAW_TABLE.tolist())) == 256


class TestImaAdpcm:
    def test_sine_snr(self):
        t = np.arange(1 + 2 * 502, dtype=np.float64)
        sig = (np.sin(2 * np.pi * 440 * t / 8000) * 12000).astype(np.int16)
        rec = C.ima_adpcm_decode_block(
            C.ima_adpcm_encode_block(sig), len(sig))
        err = rec.astype(float) - sig.astype(float)
        snr = 10 * np.log10((sig.astype(float) ** 2).mean() /
                            (err ** 2).mean())
        assert snr > 25.0, f"ADPCM SNR {snr:.1f} dB"

    def test_step_clamping_on_impulse(self):
        sig = np.zeros(101, np.int16)
        sig[50] = 32767                            # worst-case impulse
        rec = C.ima_adpcm_decode_block(
            C.ima_adpcm_encode_block(sig), len(sig))
        assert len(rec) == len(sig)                # no crash, full length

    def test_block_layout(self):
        sig = np.arange(0, 2020, 20, dtype=np.int16)  # 101 samples
        blk = C.ima_adpcm_encode_block(sig)
        assert len(blk) == 4 + 50                  # header + 100 nibbles
        pred, idx, _ = struct.unpack_from("<hBB", blk)
        assert pred == 0 and 0 <= idx <= 88


class TestImaAdpcmStereo:
    def test_block_roundtrip_snr_per_channel(self):
        t = np.arange(505, dtype=np.float64)
        left = (np.sin(2 * np.pi * 440 * t / 8000) * 12000)
        right = (np.sin(2 * np.pi * 220 * t / 8000) * 9000)
        sig = np.stack([left, right], axis=1).astype(np.int16)
        blk = C.ima_adpcm_encode_block_stereo(sig)
        assert len(blk) == 8 + 504      # 2 headers + 1008 nibbles
        rec = C.ima_adpcm_decode_block_stereo(blk, 505)
        assert rec.shape == (505, 2)
        for ch in range(2):
            err = rec[:, ch].astype(float) - sig[:, ch].astype(float)
            snr = 10 * np.log10((sig[:, ch].astype(float) ** 2).mean()
                                / (err ** 2).mean())
            assert snr > 25.0, f"ch{ch} SNR {snr:.1f} dB"

    def test_channels_are_independent(self):
        """The interleave is 4-byte groups per channel: a silent right
        channel must decode silent regardless of the left signal."""
        t = np.arange(505, dtype=np.float64)
        left = (np.sin(2 * np.pi * 440 * t / 8000) * 12000)
        sig = np.stack([left, np.zeros(505)], axis=1).astype(np.int16)
        rec = C.ima_adpcm_decode_block_stereo(
            C.ima_adpcm_encode_block_stereo(sig), 505)
        assert np.abs(rec[:, 1].astype(int)).max() <= 16
        assert np.abs(rec[:, 0].astype(int)).mean() > 1000


class TestWavDispatch:
    def _wav(self, fmt, bits, frames, sr=8000, align=2):
        return (b"RIFF" + struct.pack("<I", 36 + len(frames)) + b"WAVE" +
                b"fmt " + struct.pack("<IHHIIHH", 16, fmt, 1, sr,
                                      sr * max(align, 1), align, bits) +
                b"data" + struct.pack("<I", len(frames)) + frames)

    @pytest.fixture
    def sine(self):
        t = np.arange(2000, dtype=np.float64) / 8000
        return np.sin(2 * np.pi * 300 * t) * 0.5

    def test_all_formats_agree(self, sine):
        ints = np.round(sine * 32767).astype(np.int16)
        variants = {
            "pcm16": self._wav(1, 16, ints.astype("<i2").tobytes()),
            "pcm8": self._wav(1, 8, ((ints.astype(np.int32) // 256) +
                                     128).astype(np.uint8).tobytes(),
                              align=1),
            "pcm24": self._wav(1, 24, b"".join(
                struct.pack("<i", int(v) << 8)[:3] for v in ints),
                align=3),
            "pcm32": self._wav(1, 32, (ints.astype(np.int32) << 16)
                               .astype("<i4").tobytes(), align=4),
            "f32": self._wav(3, 32, sine.astype("<f4").tobytes(),
                             align=4),
            "f64": self._wav(3, 64, sine.astype("<f8").tobytes(),
                             align=8),
            "ulaw": self._wav(7, 8, C.ulaw_encode(ints).tobytes(),
                              align=1),
            "alaw": self._wav(6, 8, C.alaw_encode(ints).tobytes(),
                              align=1),
        }
        spb = 505
        blocks = b"".join(C.ima_adpcm_encode_block(ints[s:s + spb])
                          for s in range(0, len(ints), spb))
        variants["adpcm"] = self._wav(0x11, 4, blocks, align=256)
        tol = {"pcm16": 0.0001, "pcm8": 0.009, "pcm24": 0.0001,
               "pcm32": 0.0001, "f32": 0.0001, "f64": 0.0001,
               "ulaw": 0.02, "alaw": 0.02, "adpcm": 0.05}
        for name, payload in variants.items():
            sr, pcm, canonical = _parse_wav(payload)
            assert sr == 8000
            assert len(pcm) == 2000, name
            err = np.abs(pcm - sine.astype(np.float32))
            assert err.max() <= tol[name], f"{name}: {err.max():.4f}"
            # canonical bytes are always a 2-bytes-per-sample PCM16 view
            assert len(canonical) == 2 * len(pcm) or name == "pcm16"

    def test_stereo_mixdown(self, sine):
        ints = np.round(sine * 32767).astype(np.int16)
        stereo = np.stack([ints, -ints], axis=1).reshape(-1)
        payload = (b"RIFF" + struct.pack("<I", 36 + stereo.nbytes) +
                   b"WAVE" + b"fmt " +
                   struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16) +
                   b"data" + struct.pack("<I", stereo.nbytes) +
                   stereo.astype("<i2").tobytes())
        _, pcm, _ = _parse_wav(payload)
        assert np.abs(pcm).max() < 1e-4           # L + R cancel

    def test_stereo_adpcm_wav(self, sine):
        ints = np.round(sine * 12000).astype(np.int16)
        spb = 505
        # opposite channels cancel on downmix
        stereo = np.stack([ints, (-ints).astype(np.int16)], axis=1)
        blocks = b"".join(
            C.ima_adpcm_encode_block_stereo(stereo[s:s + spb])
            for s in range(0, len(ints), spb))
        payload = (b"RIFF" + struct.pack("<I", 36 + len(blocks)) +
                   b"WAVE" + b"fmt " +
                   struct.pack("<IHHIIHH", 16, 0x11, 2, 8000,
                               8000, 512, 4) +
                   b"data" + struct.pack("<I", len(blocks)) + blocks)
        sr, pcm, canonical = _parse_wav(payload)
        assert sr == 8000
        assert len(pcm) >= 2000
        # two independent quantizers don't cancel exactly; the
        # residual is bounded by both channels' step noise
        assert np.abs(pcm).max() < 0.03          # L + R cancel
        assert len(canonical) == 2 * len(pcm)
        # identical channels survive the downmix ~= the mono signal
        dup = np.stack([ints, ints], axis=1)
        blocks = b"".join(
            C.ima_adpcm_encode_block_stereo(dup[s:s + spb])
            for s in range(0, len(ints), spb))
        payload = (b"RIFF" + struct.pack("<I", 36 + len(blocks)) +
                   b"WAVE" + b"fmt " +
                   struct.pack("<IHHIIHH", 16, 0x11, 2, 8000,
                               8000, 512, 4) +
                   b"data" + struct.pack("<I", len(blocks)) + blocks)
        _, pcm, _ = _parse_wav(payload)
        ref = ints.astype(np.float32) / 32768.0
        assert np.abs(pcm[:2000] - ref).max() < 0.05

    def test_unknown_format_raises(self):
        with pytest.raises(NotImplementedError, match="unsupported WAV"):
            _parse_wav(self._wav(2, 4, b"\x00" * 64))  # MS-ADPCM


class TestFlac:
    def _sig(self, n=6000, seed=3):
        rng = np.random.default_rng(seed)
        t = np.arange(n) / 8000
        return (np.sin(2 * np.pi * 440 * t) * 12000 +
                rng.normal(0, 50, n)).astype(np.int16)

    def test_mono_roundtrip_bitexact_and_compressed(self):
        sig = self._sig()
        flac = C.encode_flac(sig, 8000)
        sr, pcm = C.parse_flac(flac)
        assert sr == 8000
        assert (pcm[:, 0] == sig).all()          # lossless
        assert len(flac) < sig.nbytes            # really compressed

    def test_stereo_roundtrip_bitexact(self):
        sig = self._sig()
        stereo = np.stack([sig, sig[::-1] // 2], axis=1)
        sr, pcm = C.parse_flac(C.encode_flac(stereo, 44100,
                                             block_size=1000))
        assert sr == 44100 and (pcm == stereo).all()

    def test_constant_signal(self):
        flat = np.full(500, -7, np.int16)
        _, pcm = C.parse_flac(C.encode_flac(flat, 16000))
        assert (pcm[:, 0] == flat).all()

    def test_header_crc_verified(self):
        flac = bytearray(C.encode_flac(self._sig(1000), 8000))
        # find the first frame sync and corrupt its blocksize field
        i = flac.index(b"\xff\xf8", 4)
        flac[i + 2] ^= 0x10
        with pytest.raises(ValueError, match="CRC"):
            C.parse_flac(bytes(flac))

    def _handmade(self, subframes, block, channels=1, bps=16,
                  chan_code=None, sr=8000):
        """Assemble one FLAC frame from raw subframe bit layouts the
        ENCODER never produces, so the decoder paths are pinned
        independently."""
        import struct as S
        n = block
        info = bytearray()
        info += S.pack(">HH", block, block)
        info += b"\x00\x00\x00" * 2
        info += bytes([(sr >> 12) & 0xFF, (sr >> 4) & 0xFF,
                       ((sr & 0x0F) << 4) | ((channels - 1) << 1)
                       | ((bps - 1) >> 4),
                       (((bps - 1) & 0x0F) << 4)])
        info += S.pack(">I", n)
        info += b"\x00" * 16
        out = bytearray(b"fLaC")
        out += bytes([0x80]) + len(info).to_bytes(3, "big") + bytes(info)
        cc = chan_code if chan_code is not None else channels - 1
        hdr = bytearray([0xFF, 0xF8, (0x07 << 4), (cc << 4) | (4 << 1),
                         0])
        hdr += S.pack(">H", block - 1)
        hdr.append(C._crc8(bytes(hdr)))
        bw = C._FlacBitWriter()
        for write_sub in subframes:
            write_sub(bw)
        frame = bytes(hdr) + bw.pad()
        out += frame + S.pack(">H", C._crc16(frame))
        return bytes(out)

    def test_verbatim_and_constant_subframes(self):
        vals = [5, -3, 700, -32768, 32767, 0, 1, -1]

        def verbatim(bw):
            bw.write(0, 1)
            bw.write(1, 6)                       # VERBATIM
            bw.write(0, 1)
            for v in vals:
                bw.write(v & 0xFFFF, 16)

        _, pcm = C.parse_flac(self._handmade([verbatim], len(vals)))
        assert pcm[:, 0].tolist() == vals

        def constant(bw):
            bw.write(0, 1)
            bw.write(0, 6)                       # CONSTANT
            bw.write(0, 1)
            bw.write((-42) & 0xFFFF, 16)

        _, pcm = C.parse_flac(self._handmade([constant], 12))
        assert pcm[:, 0].tolist() == [-42] * 12

    def test_lpc_subframe(self):
        # order-1 LPC: coef=2, shift=1 -> pred = (2*prev)>>1 = prev;
        # residuals rice(param=2): signal = warmup + cumulative
        sig = [100, 103, 101, 101, 106, 104, 99, 102]
        res = [sig[i] - sig[i - 1] for i in range(1, len(sig))]

        def lpc(bw):
            bw.write(0, 1)
            bw.write(32, 6)                      # LPC, order 1
            bw.write(0, 1)
            bw.write(sig[0] & 0xFFFF, 16)        # warmup
            bw.write(3 - 1, 4)                   # precision 3 bits
            bw.write(1, 5)                       # shift 1
            bw.write(2, 3)                       # coef +2 in 3 bits
            bw.write(0, 2)                       # rice method 0
            bw.write(0, 4)                       # partition order 0
            bw.write(2, 4)                       # rice param 2
            C._rice_write(bw, res, 2)

        _, pcm = C.parse_flac(self._handmade([lpc], len(sig)))
        assert pcm[:, 0].tolist() == sig

    def test_mid_side_and_left_side(self):
        left = [100, 120, -50, 7, 33, -1]
        right = [90, 125, -60, 7, 30, 4]

        def verb(vals, bits):
            def w(bw):
                bw.write(0, 1)
                bw.write(1, 6)
                bw.write(0, 1)
                for v in vals:
                    bw.write(v & ((1 << bits) - 1), bits)
            return w

        side = [l - r for l, r in zip(left, right)]
        # left/side (chan_code 8)
        data = self._handmade([verb(left, 16), verb(side, 17)],
                              len(left), channels=2, chan_code=8)
        _, pcm = C.parse_flac(data)
        assert pcm[:, 0].tolist() == left and pcm[:, 1].tolist() == right
        # mid/side (chan_code 10)
        mid = [(l + r) >> 1 for l, r in zip(left, right)]
        data = self._handmade([verb(mid, 16), verb(side, 17)],
                              len(left), channels=2, chan_code=10)
        _, pcm = C.parse_flac(data)
        assert pcm[:, 0].tolist() == left and pcm[:, 1].tolist() == right

    def test_wasted_bits_and_rice_escape(self):
        # every sample divisible by 4 -> 2 wasted bits; escape partition
        vals = [8, -4, 16, 0, -8, 12]

        def wasted(bw):
            bw.write(0, 1)
            bw.write(1, 6)                       # VERBATIM
            bw.write(1, 1)                       # wasted-bits flag
            bw.write(0, 1)                       # unary 1 -> k=2
            bw.write(1, 1)
            for v in vals:
                bw.write((v >> 2) & 0x3FFF, 14)  # bps - wasted

        _, pcm = C.parse_flac(self._handmade([wasted], len(vals)))
        assert pcm[:, 0].tolist() == vals


class TestJpegProgressive:
    """Progressive (SOF2) decode: scans hand-assembled bit-by-bit with
    the fixed encoder tables, expectations computed via an independent
    numpy IDCT of the final coefficient matrix."""

    def _tables(self):
        # DHT payloads for the fixed near-uniform tables
        dc = bytes([0x00] + C._ENC_DC_BITS) + C._ENC_DC_VALUES
        ac = bytes([0x10] + C._ENC_AC_BITS) + C._ENC_AC_VALUES
        return dc, ac

    def _seg(self, marker, body):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2) + body

    def _sos(self, comps, Ss, Se, Ah, Al):
        body = bytearray([len(comps)])
        for cid in comps:
            body += bytes([cid, 0x00])
        body += bytes([Ss, Se, (Ah << 4) | Al])
        return self._seg(0xDA, bytes(body))

    def _emit(self, bw, symbol, ac):
        code, n = C._enc_code(symbol, ac)
        bw.write(code, n)

    def _emit_coef(self, bw, run, v, ac=True):
        s = int(abs(v)).bit_length()
        self._emit(bw, (run << 4) | s, ac)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)

    def _expected_block(self, coef_zz):
        nat = np.zeros(64)
        nat[C.ZIGZAG] = coef_zz                  # q == 1 everywhere
        px = C._DCT_A.T @ nat.reshape(8, 8) @ C._DCT_A + 128.0
        return np.clip(np.round(px), 0, 255).astype(np.uint8)

    def _header(self, w, h):
        dc, ac = self._tables()
        qt = bytes([0x00] + [1] * 64)            # identity quant table
        return (b"\xFF\xD8" + self._seg(0xDB, qt) +
                self._seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) +
                          bytes([1, 0x11, 0])) +
                self._seg(0xC4, dc) + self._seg(0xC4, ac))

    def test_four_scan_progression_single_block(self):
        # final coefficients (zigzag): DC=-9, k1=6, k3=-3, k20=5
        final = [0] * 64
        final[0], final[1], final[3], final[20] = -9, 6, -3, 5

        out = bytearray(self._header(8, 8))
        # scan 1: DC first, Al=1 -> encode -9>>1 = -5 (arithmetic shift)
        bw = C._BitWriter()
        self._emit_coef(bw, 0, -5, ac=False)
        out += self._sos([1], 0, 0, 0, 1) + bw.flush()
        # scan 2: DC refine, Al=0 -> bit0 of -9 (two's comp arith: the
        # decoder ORs the bit into the stored value); -5<<1 = -10, we
        # need -9 -> bit = 1
        bw = C._BitWriter()
        bw.write(1, 1)
        out += self._sos([1], 0, 0, 1, 0) + bw.flush()
        # scan 3: AC first, Ss=1 Se=63, Al=1: k1 -> 3, k3 -> -1 (toward
        # zero), k20 -> 2 (16 zeros before it -> ZRL + run 0)
        bw = C._BitWriter()
        self._emit_coef(bw, 0, 3)                # k=1
        self._emit_coef(bw, 1, -1)               # k=3 (one zero at k=2)
        self._emit(bw, 0xF0, True)               # ZRL: k=4..19
        self._emit_coef(bw, 0, 2)                # k=20
        self._emit(bw, 0x00, True)               # EOB
        out += self._sos([1], 1, 63, 0, 1) + bw.flush()
        # scan 4: AC refinement, Ah=1 Al=0: correction bits for k1 (6 =
        # 3<<1|0), k3 (-3 -> |v| bit0 = 1), k20 (5 = 2<<1|1); k=2 and
        # k=4..19 and k>20 stay zero -> one new-coef path unused; EOB
        # with trailing corrections
        bw = C._BitWriter()
        self._emit(bw, 0x00, True)               # EOB (run 0) for block
        # trailing correction bits for every nonzero-history coef k>=Ss
        bw.write(0, 1)                           # k1: 6 bit0 = 0
        bw.write(1, 1)                           # k3: |-3| bit0 = 1
        bw.write(1, 1)                           # k20: 5 bit0 = 1
        out += self._sos([1], 1, 63, 1, 0) + bw.flush()
        out += b"\xFF\xD9"

        dec = C.parse_jpeg(bytes(out))
        assert dec.shape == (8, 8, 1)
        assert (dec[:, :, 0] == self._expected_block(final)).all()

    def test_eob_run_spans_blocks(self):
        # 24x8 grayscale: 3 blocks; DC scan gives all blocks DC=8;
        # AC scan: block 1 has k1=4 then EOB2 covers blocks 2 and 3
        out = bytearray(self._header(24, 8))
        bw = C._BitWriter()
        self._emit_coef(bw, 0, 8, ac=False)      # block 1 DC diff
        self._emit_coef(bw, 0, 0, ac=False)      # diff 0
        self._emit_coef(bw, 0, 0, ac=False)
        out += self._sos([1], 0, 0, 0, 0) + bw.flush()
        bw = C._BitWriter()
        self._emit_coef(bw, 0, 4)                # block 1: k1=4
        self._emit(bw, 0x00, True)               # EOB block 1
        self._emit(bw, 0x10, True)               # EOB2: r=1 ...
        bw.write(0, 1)                           # ... extra bit 0 -> 2
        out += self._sos([1], 1, 63, 0, 0) + bw.flush()
        out += b"\xFF\xD9"

        dec = C.parse_jpeg(bytes(out))
        assert dec.shape == (8, 24, 1)
        b1 = [0] * 64
        b1[0], b1[1] = 8, 4
        rest = [0] * 64
        rest[0] = 8
        assert (dec[:, 0:8, 0] == self._expected_block(b1)).all()
        assert (dec[:, 8:16, 0] == self._expected_block(rest)).all()
        assert (dec[:, 16:24, 0] == self._expected_block(rest)).all()

    def test_ac_refine_new_coefficient(self):
        # refinement scan introduces a coefficient that was zero in
        # history: k2 becomes +1 at Al=0, while k1 (history 2) gets a
        # correction bit
        out = bytearray(self._header(8, 8))
        bw = C._BitWriter()
        self._emit_coef(bw, 0, 3, ac=False)      # DC = 3
        out += self._sos([1], 0, 0, 0, 0) + bw.flush()
        bw = C._BitWriter()
        self._emit_coef(bw, 0, 1)                # AC first Al=1: k1 = 1
        self._emit(bw, 0x00, True)               # EOB
        out += self._sos([1], 1, 63, 0, 1) + bw.flush()
        bw = C._BitWriter()
        # AC refine Ah=1 Al=0: new coef at k2 (+1): symbol run=0,s=1,
        # sign bit 1; preceded by correction bit for k1 as we pass it
        self._emit(bw, 0x01, True)               # (0<<4)|1
        bw.write(1, 1)                           # sign of new coef: +
        bw.write(1, 1)                           # correction for k1 -> 3
        self._emit(bw, 0x00, True)               # EOB
        out += self._sos([1], 1, 63, 1, 0) + bw.flush()
        out += b"\xFF\xD9"

        dec = C.parse_jpeg(bytes(out))
        final = [0] * 64
        final[0], final[1], final[2] = 3, 3, 1   # k1: 1<<1 | corr 1 = 3
        assert (dec[:, :, 0] == self._expected_block(final)).all()

    def test_arithmetic_coding_raises(self):
        data = bytearray(self._header(8, 8))
        i = bytes(data).index(b"\xFF\xC2")
        data[i + 1] = 0xC9                       # SOF9: arithmetic
        with pytest.raises(NotImplementedError, match="unsupported"):
            C.parse_jpeg(bytes(data) + b"\xFF\xD9")


class TestCodecProperties:
    """Hypothesis property tests: the lossless codecs roundtrip
    arbitrary inputs exactly; the lossy ones never crash and stay
    in-range."""

    def test_flac_roundtrip_random_pcm(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from hypothesis.extra.numpy import arrays

        @settings(max_examples=25, deadline=None)
        @given(arrays(np.int16, st.integers(3, 700),
                      elements=st.integers(-32768, 32767)),
               st.sampled_from([127, 256, 4096]))
        def run(sig, block):
            _, pcm = C.parse_flac(C.encode_flac(sig, 8000,
                                                block_size=block))
            assert (pcm[:, 0] == sig).all()
        run()

    def test_gif_roundtrip_random_rasters(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from hypothesis.extra.numpy import arrays

        @settings(max_examples=20, deadline=None)
        @given(st.integers(1, 40), st.integers(1, 40),
               st.integers(2, 256), st.booleans(), st.randoms())
        def run(h, w, ncolors, interlace, rnd):
            rng = np.random.default_rng(rnd.randint(0, 2**31))
            pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
            idx = rng.integers(0, ncolors, (h, w), dtype=np.uint8)
            out = C.parse_gif(C.encode_gif(idx, pal,
                                           interlace=interlace))
            assert (out == pal[idx]).all()
        run()

    def test_g711_idempotent_on_own_levels(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from hypothesis.extra.numpy import arrays

        @settings(max_examples=25, deadline=None)
        @given(arrays(np.int16, st.integers(1, 500),
                      elements=st.integers(-32768, 32767)))
        def run(pcm):
            for enc, dec in ((C.ulaw_encode, C.ulaw_decode),
                             (C.alaw_encode, C.alaw_decode)):
                level = dec(enc(pcm))
                assert (dec(enc(level)) == level).all()
        run()

    def test_jpeg_random_images_bounded(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=10, deadline=None)
        @given(st.integers(1, 40), st.integers(1, 40), st.booleans(),
               st.integers(0, 4), st.randoms())
        def run(h, w, sub, rst, rnd):
            rng = np.random.default_rng(rnd.randint(0, 2**31))
            pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            dec = C.parse_jpeg(C.encode_jpeg(pix, quality=85,
                                             subsample=sub,
                                             restart_interval=rst))
            assert dec.shape == (h, w, 3)
            assert dec.dtype == np.uint8
        run()

    def test_adpcm_bounded_error_on_smooth_signals(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=15, deadline=None)
        @given(st.floats(50, 3000), st.floats(0.05, 0.9), st.randoms())
        def run(freq, amp, rnd):
            n = 801
            t = np.arange(n) / 8000.0
            sig = (np.sin(2 * np.pi * freq * t) * amp * 32767) \
                .astype(np.int16)
            rec = C.ima_adpcm_decode_block(
                C.ima_adpcm_encode_block(sig), n)
            err = rec.astype(float) - sig.astype(float)
            # step tracking bounds error well under full scale
            assert np.abs(err).max() < 0.35 * 32767 * amp + 2000
        run()


class TestMp3Stream:
    """MPEG-audio frame layer: hand-assembled streams pin the walker
    (sizes, padding accumulator, tag skip, resync, VBR) and the
    zero-spectrum decode; general PCM decode must refuse loudly (the
    spec's Huffman/window constants are unverifiable in-sandbox)."""

    def test_frame_sizes_and_padding_accumulator(self):
        # 128 kbps @ 44.1 kHz: ideal 417.959 bytes/frame -> the
        # fractional-slot accumulator yields a 417/418 pattern with
        # 24 padded frames per 25 (0.959...)
        s = C.build_mp3_stream(50, sample_rate=44100, bitrate=128)
        info = C.parse_mp3_frames(s)
        sizes = [sz for _, sz, _ in info["frames"]]
        assert set(sizes) == {417, 418}
        assert abs(sum(sizes) / 50 - 144 * 128000 / 44100) < 1
        # 48 kHz divides evenly: every frame exactly 384 bytes
        s2 = C.build_mp3_stream(10, sample_rate=48000, bitrate=128)
        assert {sz for _, sz, _ in
                C.parse_mp3_frames(s2)["frames"]} == {384}

    def test_id3v2_skip_and_id3v1_trailer(self):
        s = C.build_mp3_stream(7, id3_title="unit") + b"TAG" + b"\x00" * 125
        info = C.parse_mp3_frames(s)
        assert info["n_frames"] == 7
        assert info["first_frame_offset"] > 0  # past the ID3v2 tag

    def test_resync_over_garbage(self):
        a = C.build_mp3_stream(3)
        b = C.build_mp3_stream(4)
        info = C.parse_mp3_frames(a + b"\x12\x34junkjunk" + b)
        assert info["n_frames"] == 7

    def test_vbr_detection_and_mean_bitrate(self):
        s = C.build_mp3_stream(9, vbr_bitrates=[96, 160, 256])
        info = C.parse_mp3_frames(s)
        assert info["is_vbr"]
        assert info["bitrate_kbps"] == pytest.approx((96 + 160 + 256) / 3)
        assert not C.parse_mp3_frames(C.build_mp3_stream(9))["is_vbr"]

    def test_xing_header_detected(self):
        # graft a Xing tag into the first frame's main-data area
        s = bytearray(C.build_mp3_stream(5))
        off = 4 + 17                      # header + mono side info
        s[off:off + 8] = b"Xing" + struct.pack(">I", 1)
        s[off + 8:off + 12] = struct.pack(">I", 4)  # frame count
        info = C.parse_mp3_frames(bytes(s))
        assert info["has_xing"] and info["xing_frames"] == 4
        assert info["n_frames"] == 4      # metadata frame excluded

    def test_stereo_side_info_and_channels(self):
        s = C.build_mp3_stream(6, channels=2)
        info = C.parse_mp3_frames(s)
        assert info["channels"] == 2
        sr, pcm = C.parse_mp3_silence(s)
        assert sr == 44100 and len(pcm) == 6 * 1152 and not pcm.any()

    def test_silence_decodes_to_exact_zeros(self):
        sr, pcm = C.parse_mp3_silence(C.build_mp3_stream(12))
        assert sr == 44100
        assert pcm.dtype == np.float32 and len(pcm) == 12 * 1152
        assert not pcm.any()

    def test_nonzero_spectrum_exits_the_fast_path(self):
        s = bytearray(C.build_mp3_stream(3))
        # set granule 0 part2_3_length (first 12 bits after the 9-bit
        # main_data_begin + 5 private + 4 scfsi = bit 18 of side info)
        side = 4
        s[side + 2] |= 0x08               # a bit inside part2_3_length
        # the zero-spectrum fast path refuses and points at the full
        # decoder (operators/mp3.py), which owns spectral frames now
        with pytest.raises(NotImplementedError, match="decode_mp3"):
            C.parse_mp3_silence(bytes(s))

    def test_mpeg2_and_layer1_frame_geometry(self):
        # hand-assemble single headers: MPEG-2 Layer III 16 kHz 64 kbps
        # -> 72*64000/16000 = 288 bytes, 576 samples
        h2 = bytes([0xFF, 0xF0 | (2 << 3) | (1 << 1) | 1,
                    (8 << 4) | (2 << 2), 0xC0])
        f = C._mp3_frame_header(h2 + b"\x00" * 300, 0)
        assert (f["version"], f["size"], f["samples"]) == (2, 288, 576)
        # MPEG-1 Layer I 384 kbps 48 kHz -> (12*384000/48000)*4 = 384
        h1 = bytes([0xFF, 0xE0 | (3 << 3) | (3 << 1) | 1,
                    (12 << 4) | (1 << 2), 0xC0])
        f1 = C._mp3_frame_header(h1 + b"\x00" * 400, 0)
        assert (f1["layer"], f1["size"], f1["samples"]) == (1, 384, 384)

    def test_no_frames_raises_valueerror(self):
        with pytest.raises(ValueError, match="no MPEG"):
            C.parse_mp3_frames(b"\x00" * 1000)


class TestMp4Container:
    """ISO-BMFF box walker: hand-assembled box trees pin the grammar
    (32/64-bit sizes, size-0 to-end boxes, container recursion,
    version-1 headers, truncation tolerance)."""

    def _simple(self):
        return C.build_mp4([
            {"handler": "vide", "codec": "avc1", "n_samples": 30,
             "sample_size": 1000, "width": 640, "height": 360},
            {"handler": "soun", "codec": "mp4a", "n_samples": 43,
             "sample_size": 768}], duration_ms=2500)

    def test_round_trip_metadata(self):
        m = C.parse_mp4(self._simple())
        assert m["major_brand"] == "isom"
        assert m["duration_s"] == pytest.approx(2.5)
        assert m["n_tracks"] == 2
        v, a = m["tracks"]
        assert (v["handler"], v["codec"], v["n_samples"],
                v["width"], v["height"]) == ("vide", "avc1", 30,
                                             640, 360)
        assert v["total_sample_bytes"] == 30000
        assert (a["handler"], a["codec"], a["n_samples"]) \
            == ("soun", "mp4a", 43)
        assert not m["has_fragments"]

    def test_largesize_and_size0_boxes(self):
        body = self._simple()
        # wrap the mdat as a 64-bit largesize box, then append a
        # size-0 (to-EOF) free box; the walker must accept both
        mdat64 = struct.pack(">I", 1) + b"mdat" \
            + struct.pack(">Q", 16 + 4) + b"\x00" * 4
        free0 = struct.pack(">I", 0) + b"free" + b"\x00" * 6
        data = body[:-8] + mdat64 + free0   # drop the empty mdat
        boxes = [t for t, *_ in C.parse_mp4_boxes(data)]
        assert b"mdat" in boxes and b"free" in boxes
        assert C.parse_mp4(data)["n_tracks"] == 2

    def test_version1_mvhd_mdhd(self):
        # hand-build a moov with 64-bit (version 1) headers
        mvhd = C._box(b"mvhd", struct.pack(
            ">B3xQQIQ", 1, 0, 0, 90000, 90000 * 7) + b"\x00" * 80)
        mdhd = C._box(b"mdhd", struct.pack(
            ">B3xQQIQ", 1, 0, 0, 48000, 48000 * 7) + b"\x00" * 4)
        hdlr = C._box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 13)
        trak = C._box(b"trak", C._box(b"mdia", mdhd + hdlr))
        data = C._box(b"ftyp", b"mp42" + b"\x00" * 4) \
            + C._box(b"moov", mvhd + trak)
        m = C.parse_mp4(data)
        assert m["major_brand"] == "mp42"
        assert m["duration_s"] == pytest.approx(7.0)
        assert m["tracks"][0]["timescale"] == 48000
        assert m["tracks"][0]["duration_s"] == pytest.approx(7.0)

    def test_fragmented_flag(self):
        data = self._simple() + C._box(b"moof", C._box(
            b"traf", b""))
        assert C.parse_mp4(data)["has_fragments"]

    def test_variable_stsz_sums_sizes(self):
        stsz = C._box(b"stsz", struct.pack(">B3xII", 0, 0, 3)
                      + struct.pack(">3I", 10, 20, 30))
        stsd = C._box(b"stsd", struct.pack(">B3xI", 0, 1)
                      + C._box(b"avc1", b"\x00" * 78))
        hdlr = C._box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 13)
        trak = C._box(b"trak", C._box(b"mdia", hdlr + C._box(
            b"minf", C._box(b"stbl", stsd + stsz))))
        data = C._box(b"ftyp", b"isom\x00\x00\x00\x00") \
            + C._box(b"moov", trak)
        t = C.parse_mp4(data)["tracks"][0]
        assert t["n_samples"] == 3 and t["total_sample_bytes"] == 60

    def test_truncation_tolerated(self):
        data = self._simple()
        m = C.parse_mp4(data[:len(data) - 6])  # clipped final box
        assert m["n_tracks"] == 2              # moov already parsed

    def test_non_bmff_raises(self):
        with pytest.raises(ValueError, match="ISO-BMFF"):
            C.parse_mp4(b"RIFF" + b"\x00" * 100)
        with pytest.raises(ValueError, match="ISO-BMFF"):
            C.parse_mp4(b"\x00" * 4)
