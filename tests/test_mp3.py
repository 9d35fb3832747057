"""MPEG-1 Layer III PCM codec (operators/mp3.py).

The environment has no reference MP3 decoder, so correctness is pinned
three ways: (1) structural — every Huffman table is verified
prefix-free at import, the filterbank round-trips with unity gain at
the spec delay; (2) differential — decode(encode(x)) approximates x
with an SNR gate (the encoder is written only from the spec's decode
semantics, so agreement means both directions implement the same
math); (3) golden — encoded bytes and decoded PCM of a fixed tone are
hash-pinned so any numeric drift is loud.

Reference parity note: the reference (xbrianh/xdlake) ships no codecs;
this surface is build-brief-mandated (multimodal audio pipeline).
"""

import hashlib

import numpy as np
import pytest

from xdlake_spark.operators import mp3
from xdlake_spark.operators.codecs import parse_mp3_frames


def _snr_db(ref: np.ndarray, out: np.ndarray) -> float:
    err = ref - out
    return 10.0 * np.log10(np.sum(ref ** 2)
                           / max(np.sum(err ** 2), 1e-30))


class TestHuffmanTables:
    def test_all_shipped_tables_prefix_free(self):
        report = mp3.validate_huffman_tables()
        for tid in mp3.HUFFMAN_TABLES:
            if tid == 0:
                continue
            assert report[tid]["prefix_free"], tid

    def test_known_transcription_slip_is_excluded(self):
        # table 8 as transcribed has a codeword collision (idx 29/33
        # both 0b1/10); the validator must keep it OUT of the
        # supported set so decode raises instead of misdecoding
        report = mp3.validate_huffman_tables()
        assert not report[8]["prefix_free"]
        assert 8 not in mp3.HUFFMAN_TABLES

    def test_kraft_sums_at_most_one(self):
        report = mp3.validate_huffman_tables()
        for name, r in report.items():
            assert r["kraft"] <= 1.0 + 1e-9, name

    def test_count1_tables_valid(self):
        report = mp3.validate_huffman_tables()
        assert report["count1_0"]["prefix_free"]
        assert report["count1_1"]["prefix_free"]
        # table B is the complete 4-bit code: Kraft sum exactly 1
        assert report["count1_1"]["kraft"] == 1.0


class TestFilterbank:
    def test_round_trip_unity_gain_at_spec_delay(self):
        rng = np.random.RandomState(7)
        n = 8192
        x = rng.randn(n)
        ana, syn = mp3._Analysis(), mp3._Synth()
        y = np.empty(n)
        for t in range(n // 32):
            y[t * 32:(t + 1) * 32] = syn.run(ana.run(
                x[t * 32:(t + 1) * 32]))
        a = x[1000:6000]
        b = y[1000 + 481:6000 + 481]        # 481 = MPEG filterbank delay
        gain = np.dot(a, b) / np.dot(b, b)
        assert abs(gain - 1.0) < 0.01
        assert _snr_db(a, b) > 35.0          # broadband near-PR floor

    @pytest.mark.parametrize("freq,gate", [
        (1125.0, 55.0),     # band-1 center: complementarity is exact
        (1000.0, 38.0),     # off-center: transition-region residual
    ])
    def test_round_trip_tone_snr(self, freq, gate):
        n = 8192
        x = np.sin(2 * np.pi * freq * np.arange(n) / 48000.0)
        ana, syn = mp3._Analysis(), mp3._Synth()
        y = np.empty(n)
        for t in range(n // 32):
            y[t * 32:(t + 1) * 32] = syn.run(ana.run(
                x[t * 32:(t + 1) * 32]))
        assert _snr_db(x[1000:6000], y[1481:6481]) > gate

    def test_prototype_power_complementary(self):
        h = mp3._PROTO
        H = np.fft.rfft(h, 16384)
        m = np.abs(H)
        k = 16384 // 64                     # bin of pi/32
        idx = np.arange(k + 1)
        p = m[idx] ** 2 + m[k - idx] ** 2
        assert np.max(np.abs(p - 1.0)) < 0.01


class TestMDCTChain:
    def test_mdct_imdct_alias_chain_is_exact(self):
        """Encoder MDCT + alias-unreduce vs decoder alias-reduce +
        IMDCT/overlap is numerically exact (the filterbank is the only
        approximate stage)."""
        rng = np.random.RandomState(3)
        g = mp3._Granule()
        g.window_switching, g.block_type, g.mixed_block = 0, 0, 0
        sbdata = rng.randn(32, 18 * 5)
        prev = np.zeros((32, 18))
        overlap = np.zeros((32, 18))
        recon = np.zeros((32, 18 * 5))
        for grn in range(5):
            sb = sbdata[:, grn * 18:(grn + 1) * 18].copy()
            sb[1::2, 1::2] *= -1.0
            xr = np.empty(576)
            for s in range(32):
                z = np.concatenate([prev[s], sb[s]]) * mp3._WIN_NORMAL
                xr[s * 18:(s + 1) * 18] = \
                    (mp3._IMDCT36.T @ z) * (2.0 / 36.0) * 2.0
            prev = sb.copy()
            mp3._alias_unreduce(xr)
            xr2 = xr.copy()
            mp3._alias_reduce(xr2)
            recon[:, grn * 18:(grn + 1) * 18] = \
                mp3._imdct_granule(xr2, g, overlap)
        a = sbdata[:, :18 * 3].ravel()
        b = recon[:, 18:18 * 4].ravel()      # one-granule overlap delay
        assert _snr_db(a, b) > 200.0


class TestShortBlockChain:
    def test_short_mdct_chain_is_exact(self):
        """Encoder short-MDCT + reorder vs decoder reorder + short
        IMDCT/overlap is numerically exact across consecutive short
        granules (the TDAC lattice holds within the 6-sample hop)."""
        rng = np.random.RandomState(5)
        g = mp3._Granule()
        g.window_switching, g.block_type, g.mixed_block = 1, 2, 0
        sbdata = rng.randn(32, 18 * 6)
        prev = np.zeros((32, 18))
        overlap = np.zeros((32, 18))
        recon = np.zeros((32, 18 * 6))
        for grn in range(6):
            sb = sbdata[:, grn * 18:(grn + 1) * 18].copy()
            sb[1::2, 1::2] *= -1.0
            xr = np.empty(576)
            for s in range(32):
                z = np.concatenate([prev[s], sb[s]])
                for w in range(3):
                    seg = z[6 + 6 * w:18 + 6 * w] * mp3._WIN_SHORT
                    xr[s * 18 + w::3][:6] = \
                        (mp3._IMDCT12.T @ seg) * (2.0 / 12.0) * 2.0
            prev = sb.copy()
            # encoder emits sfb-major; decoder reorders back
            huff = mp3._reorder_short_inverse(xr, 48000)
            line = mp3._reorder_short(huff, 48000)
            recon[:, grn * 18:(grn + 1) * 18] = \
                mp3._imdct_granule(line, g, overlap)
        a = sbdata[:, 18:18 * 4].ravel()
        b = recon[:, 18 * 2:18 * 5].ravel()
        assert _snr_db(a, b) > 200.0

    def test_reorder_inverse_roundtrip(self):
        rng = np.random.RandomState(1)
        for sr in (32000, 44100, 48000):
            x = rng.randn(576)
            assert np.allclose(
                mp3._reorder_short(
                    mp3._reorder_short_inverse(x, sr), sr), x)


class TestCodecRoundTrip:
    def test_encode_produces_walkable_stream(self):
        data = mp3.encode_mp3_tone(440.0, n_frames=4)
        info = parse_mp3_frames(data)
        assert info["version"] == 1 and info["layer"] == 3
        assert info["n_frames"] == 4
        assert info["sample_rate"] == 48000
        assert info["channels"] == 1

    @pytest.mark.parametrize("freq,channels,block_type",
                             [(440.0, 1, 0), (440.0, 2, 0),
                              (1200.0, 1, 0),
                              (440.0, 1, 2), (440.0, 2, 2)])
    def test_decode_encode_snr(self, freq, channels, block_type):
        """Long (block_type 0) AND short (2) granules: the short case
        differentially exercises the decoder's window-switching,
        sfb-major reorder, 12-point IMDCT and overlap paths."""
        n_frames = 6
        n = n_frames * 1152
        t = np.arange(n) / 48000.0
        ref = 0.5 * np.sin(2 * np.pi * freq * t)
        pcm_in = ref if channels == 1 else \
            np.stack([ref, 0.5 * ref], axis=1)
        data = mp3.encode_mp3(pcm_in, block_type=block_type)
        sr, pcm = mp3.decode_mp3(data)
        assert sr == 48000
        assert pcm.shape == (n_frames * 1152, channels)
        # total codec delay: 481 (polyphase) + 576 (granule overlap)
        lag = 1057
        a = ref[200:4200]
        b = pcm[200 + lag:4200 + lag, 0]
        # SNR floor is the coarse |ix|<=7 quantizer (the finest
        # no-linbits Huffman table shipped), ~19-21 dB measured
        assert _snr_db(a, b) > 15.0

    def test_stereo_second_channel_half_amplitude(self):
        data = mp3.encode_mp3_tone(660.0, n_frames=5, channels=2)
        _, pcm = mp3.decode_mp3(data)
        mid = pcm[2000:5000]
        r0 = np.sqrt(np.mean(mid[:, 0] ** 2))
        r1 = np.sqrt(np.mean(mid[:, 1] ** 2))
        assert 0.35 < r1 / r0 < 0.65

    def test_all_sample_rates(self):
        for sr in (32000, 44100, 48000):
            data = mp3.encode_mp3_tone(500.0, n_frames=2,
                                       sample_rate=sr)
            got_sr, pcm = mp3.decode_mp3(data)
            assert got_sr == sr
            assert len(pcm) == 2 * 1152

    def test_silence_encodes_and_decodes_to_silence(self):
        data = mp3.encode_mp3(np.zeros(1152), sample_rate=44100)
        sr, pcm = mp3.decode_mp3(data)
        assert sr == 44100
        assert np.max(np.abs(pcm)) == 0.0


class TestGolden:
    def test_encoded_bytes_pinned(self):
        data = mp3.encode_mp3_tone(440.0, n_frames=2)
        digest = hashlib.sha256(data).hexdigest()
        assert len(data) == 2 * (144 * 320000 // 48000)
        # pinned: any change to the DSP chain or tables shows up here
        assert digest == PINNED_STREAM_SHA256

    def test_decoded_pcm_pinned(self):
        data = mp3.encode_mp3_tone(440.0, n_frames=2)
        _, pcm = mp3.decode_mp3(data)
        q = np.round(pcm[:, 0] * 32768.0).astype(np.int32)
        digest = hashlib.sha256(q.tobytes()).hexdigest()
        assert digest == PINNED_PCM_SHA256


class TestLSF:
    """MPEG-2 / MPEG-2.5 low-sampling-frequency Layer III (r9): the
    13818-3 side-info layout (8-bit main_data_begin, one 63-bit
    granule, 9-bit scalefac_compress, no scfsi/preflag), the LSF
    scalefactor block algorithm, and 576-sample frames — round-tripped
    at every LSF rate and digest-pinned at 22.05 kHz."""

    @pytest.mark.parametrize("sr", [22050, 24000, 16000,
                                    11025, 12000, 8000])
    def test_round_trip_snr_all_lsf_rates(self, sr):
        n = 12 * 576
        t = np.arange(n) / sr
        ref = 0.5 * np.sin(2 * np.pi * 440.0 * t)
        data = mp3.encode_mp3(ref, sample_rate=sr, bitrate=64)
        sr2, pcm = mp3.decode_mp3(data)
        assert sr2 == sr and pcm.shape == (n, 1)
        lag = 1057                   # 481 polyphase + 576 overlap
        a = ref[200:n - lag - 200]
        b = pcm[200 + lag:n - 200, 0]
        assert _snr_db(a, b) > 15.0, sr

    def test_lsf_stereo_round_trip(self):
        n = 8 * 576
        t = np.arange(n) / 22050.0
        ref = 0.4 * np.sin(2 * np.pi * 330.0 * t)
        st = np.stack([ref, 0.5 * ref], axis=1)
        data = mp3.encode_mp3(st, sample_rate=22050, bitrate=96)
        sr, pcm = mp3.decode_mp3(data)
        assert sr == 22050 and pcm.shape == (n, 2)
        mid = pcm[2000:4000]
        r = np.abs(mid[:, 1]).mean() / np.abs(mid[:, 0]).mean()
        assert abs(r - 0.5) < 0.1

    def test_lsf_frame_structure(self):
        from xdlake_spark.operators.codecs import parse_mp3_frames
        data = mp3.encode_mp3_tone(440.0, n_frames=3,
                                   sample_rate=22050, bitrate=64)
        info = parse_mp3_frames(data)
        assert info["version"] == 2 and info["layer"] == 3
        assert info["n_frames"] == 3
        assert info["sample_rate"] == 22050
        # 72 slots/kbit: 72 * 64000 / 22050 = 208 bytes per frame
        assert all(size == 208 for _, size, _ in info["frames"])

    def test_lsf_golden_digests(self):
        data = mp3.encode_mp3_tone(440.0, n_frames=4,
                                   sample_rate=22050, bitrate=64)
        assert hashlib.sha256(data).hexdigest() == \
            PINNED_LSF_STREAM_SHA256
        _, pcm = mp3.decode_mp3(data)
        q = np.round(pcm[:, 0] * 32768.0).astype(np.int32)
        assert hashlib.sha256(q.tobytes()).hexdigest() == \
            PINNED_LSF_PCM_SHA256

    def test_lsf_intensity_patched_stream_decodes(self):
        """A plain-stereo LSF stream whose header is patched to
        joint+intensity must DECODE (r10) — and because the right
        channel carries a full spectrum (its rzero is at the top) and
        scalefac_compress 0 makes every is_pos illegal (off), the
        audio is identical to the unpatched decode."""
        import numpy as np
        clean = mp3.encode_mp3_tone(440.0, n_frames=2,
                                    sample_rate=22050,
                                    channels=2, bitrate=96)
        data = bytearray(clean)
        for off in range(0, len(data) - 4):
            if data[off] == 0xFF and (data[off + 1] & 0xE0) == 0xE0:
                data[off + 3] = (data[off + 3] & 0x0F) \
                    | (1 << 6) | 0x10
        _, ref = mp3.decode_mp3(clean)
        sr, got = mp3.decode_mp3(bytes(data))
        assert sr == 22050
        assert np.allclose(got, ref, atol=1e-6)

    def test_lsf_intensity_fixture_copies_left(self):
        """encode_mp3(intensity=True): left carries the spectrum,
        right granule is empty with 21 legal is_pos=0 scalefactors —
        a conformant decoder pans the left spectrum to BOTH outputs
        (ISO 13818-3 p=0)."""
        import numpy as np
        n = 6 * 576
        t = np.arange(n) / 22050.0
        ref = 0.4 * np.sin(2 * np.pi * 330.0 * t)
        st = np.stack([ref, np.zeros(n)], axis=1)
        data = mp3.encode_mp3(st, sample_rate=22050, bitrate=96,
                              intensity=True)
        from xdlake_spark.operators.codecs import parse_mp3_frames
        info = parse_mp3_frames(data)
        assert info["channels"] == 2       # joint-stereo mode
        sr, pcm = mp3.decode_mp3(data)
        assert sr == 22050 and pcm.shape == (n, 2)
        # both channels carry the SAME audio (copy-left panning)
        assert np.allclose(pcm[:, 0], pcm[:, 1], atol=1e-6)
        mid = pcm[2000:4000, 1]
        assert np.abs(mid).mean() > 0.05   # right is NOT silent
        lag = 1057
        a = ref[200:n - lag - 200]
        b = pcm[200 + lag:n - 200, 1]
        assert _snr_db(a, b) > 15.0

    def test_lsf_intensity_formula_and_illegal_positions(self):
        """_intensity_stereo_lsf pins the ISO 13818-3 §2.4.3.4 rules:
        2^(-(((p+1)>>1) << intensity_scale)/4) panning, odd p
        attenuates left / even p right, per-band illegal position
        (1<<slen)-1 turns intensity OFF, MS rescale by sqrt2."""
        import numpy as np
        g = mp3._Granule()
        # layout block 3: isc=43 -> slen (1,1,1,0) -> illegal pos 1
        g.scalefac_compress = 86           # intensity_scale = 0
        g.scalefac_l = [0] * 22
        g.scalefac_l[0] = 2                # even: right attenuates
        g.scalefac_l[1] = 3                # odd: left attenuates
        g.scalefac_l[2] = 1                # == illegal: OFF
        sfb = mp3.SFB_LONG[22050]
        xl = np.ones(576)
        xr = np.zeros(576)                 # rzero = 0: all bands IS
        l, r = mp3._intensity_stereo_lsf(xl.copy(), xr.copy(),
                                         g, 22050, False)
        f2 = 2.0 ** (-(((2 + 1) >> 1) << 0) / 4.0)   # p=2 -> 2^-1/4
        f3 = 2.0 ** (-(((3 + 1) >> 1) << 0) / 4.0)   # p=3 -> 2^-2/4
        b0 = slice(sfb[0], sfb[1])
        b1 = slice(sfb[1], sfb[2])
        b2 = slice(sfb[2], sfb[3])
        assert np.allclose(l[b0], 1.0) and np.allclose(r[b0], f2)
        assert np.allclose(l[b1], f3) and np.allclose(r[b1], 1.0)
        assert np.allclose(l[b2], 1.0) and np.allclose(r[b2], 0.0)
        # intensity_scale = 1 doubles the exponent shift
        g.scalefac_compress = 87
        l, r = mp3._intensity_stereo_lsf(xl.copy(), xr.copy(),
                                         g, 22050, False)
        assert np.allclose(r[b0],
                           2.0 ** (-(((2 + 1) >> 1) << 1) / 4.0))
        # ms_on restores the /sqrt2-scaled mid before panning
        g.scalefac_compress = 86
        l, r = mp3._intensity_stereo_lsf(xl.copy(), xr.copy(),
                                         g, 22050, True)
        assert np.allclose(l[b0], np.sqrt(2.0))

    def test_lsf_tables_structural(self):
        for sr in (22050, 24000, 16000, 11025, 12000, 8000):
            lt, st = mp3.SFB_LONG[sr], mp3.SFB_SHORT[sr]
            assert len(lt) == 23 and lt[-1] == 576
            assert len(st) == 14 and st[-1] == 192
        for bn, kinds in mp3.LSF_NSFB.items():
            assert (sum(kinds[0]), sum(kinds[1]), sum(kinds[2])) \
                == (21, 36, 33)

    def test_lsf_kind1_counts_are_window_multiples(self):
        """Every kind-1 (pure-short) nsfb count is a multiple of 3 —
        the invariant _intensity_stereo_lsf_short leans on to give
        all three windows of one sfb the same slen group."""
        for bn, kinds in mp3.LSF_NSFB.items():
            assert all(n % 3 == 0 for n in kinds[1]), bn


class TestShortIntensity:
    """Intensity stereo on pure-SHORT blocks (r10): MPEG-1 tan
    panning and LSF power-of-two panning, both applied per window in
    the reordered (line-major) domain with per-window intensity
    bounds — formula-pinned here, end-to-end via encode_mp3."""

    def _short_granule(self):
        g = mp3._Granule()
        g.window_switching, g.block_type, g.mixed_block = 1, 2, 0
        g.scalefac_s = [[7] * 3 for _ in range(13)]
        g.scalefac_l = [0] * 22
        return g

    def test_mpeg1_short_formula_per_window(self):
        g = self._short_granule()
        sfb = mp3.SFB_SHORT[44100]
        g.scalefac_s[0] = [3, 6, 7]      # w0: 50/50, w1: full left,
        #                                  w2: off
        xl, xr = np.ones(576), np.zeros(576)
        l, r = mp3._intensity_stereo_short(xl.copy(), xr.copy(),
                                           g, 44100)
        b0 = slice(sfb[0], sfb[1])
        # window views of band 0
        w0l, w0r = l[0::3][b0], r[0::3][b0]
        w1l, w1r = l[1::3][b0], r[1::3][b0]
        w2l, w2r = l[2::3][b0], r[2::3][b0]
        assert np.allclose(w0l, 0.5) and np.allclose(w0r, 0.5)
        # is_pos 6: tan(pi/2) -> ratio inf; ratio/(1+ratio) -> 1
        assert np.allclose(w1l, 1.0) and np.allclose(w1r, 0.0)
        # is_pos 7: intensity OFF (band untouched, right stays 0)
        assert np.allclose(w2l, 1.0) and np.allclose(w2r, 0.0)

    def test_mpeg1_short_per_window_rzero(self):
        """A window whose right channel has data keeps its bands
        stereo; the other windows of the SAME granule still pan."""
        g = self._short_granule()
        g.scalefac_s[0] = [0, 0, 0]      # is_pos 0: full right
        sfb = mp3.SFB_SHORT[44100]
        xl, xr = np.ones(576), np.zeros(576)
        # give window 1 right-channel data through the END of band 0
        xr[1::3][sfb[1] - 1] = 0.5
        l, r = mp3._intensity_stereo_short(xl.copy(), xr.copy(),
                                           g, 44100)
        b0 = slice(sfb[0], sfb[1])
        # window 0 and 2 pan (is_pos 0 -> left silent, right = l)
        assert np.allclose(l[0::3][b0], 0.0)
        assert np.allclose(r[0::3][b0], 1.0)
        assert np.allclose(l[2::3][b0], 0.0)
        # window 1's band 0 is below ITS rzero: untouched
        assert np.allclose(l[1::3][b0], 1.0)
        assert r[1::3][sfb[1] - 1] == 0.5

    def test_mpeg1_short_band12_is_off(self):
        """The 13th short band has no transmitted scalefactor:
        intensity off, same convention as long sfb 21."""
        g = self._short_granule()
        for sfb_i in range(12):
            g.scalefac_s[sfb_i] = [0, 0, 0]
        sfb = mp3.SFB_SHORT[44100]
        xl, xr = np.ones(576), np.zeros(576)
        l, r = mp3._intensity_stereo_short(xl.copy(), xr.copy(),
                                           g, 44100)
        b12 = slice(sfb[12], sfb[13])
        for w in range(3):
            assert np.allclose(l[w::3][b12], 1.0)
            assert np.allclose(r[w::3][b12], 0.0)

    def test_lsf_short_formula_and_illegal_positions(self):
        g = self._short_granule()
        # intensity layout block 3: isc=43 -> slen (1,1,1), illegal 1
        g.scalefac_compress = 86
        g.scalefac_s[0] = [2, 3, 1]      # even: right attenuates;
        #                                  odd: left; 1 == illegal
        sfb = mp3.SFB_SHORT[22050]
        xl, xr = np.ones(576), np.zeros(576)
        l, r = mp3._intensity_stereo_lsf_short(
            xl.copy(), xr.copy(), g, 22050, False)
        f2 = 2.0 ** (-(((2 + 1) >> 1) << 0) / 4.0)
        f3 = 2.0 ** (-(((3 + 1) >> 1) << 0) / 4.0)
        b0 = slice(sfb[0], sfb[1])
        assert np.allclose(l[0::3][b0], 1.0)
        assert np.allclose(r[0::3][b0], f2)
        assert np.allclose(l[1::3][b0], f3)
        assert np.allclose(r[1::3][b0], 1.0)
        assert np.allclose(l[2::3][b0], 1.0)     # illegal: OFF
        assert np.allclose(r[2::3][b0], 0.0)
        # intensity_scale = 1 doubles the exponent shift
        g.scalefac_compress = 87
        l, r = mp3._intensity_stereo_lsf_short(
            xl.copy(), xr.copy(), g, 22050, False)
        assert np.allclose(r[0::3][b0],
                           2.0 ** (-(((2 + 1) >> 1) << 1) / 4.0))
        # ms_on restores the /sqrt2-scaled mid before panning
        g.scalefac_compress = 86
        l, r = mp3._intensity_stereo_lsf_short(
            xl.copy(), xr.copy(), g, 22050, True)
        assert np.allclose(l[0::3][b0], np.sqrt(2.0))

    def test_lsf_short_end_to_end_copies_left(self):
        """encode_mp3(block_type=2, intensity=True) at an LSF rate:
        the short right granule carries 36 legal is_pos=0 values —
        a conformant decoder pans the left spectrum to BOTH
        outputs."""
        n = 6 * 576
        t = np.arange(n) / 22050.0
        ref = 0.4 * np.sin(2 * np.pi * 330.0 * t)
        st = np.stack([ref, np.zeros(n)], axis=1)
        data = mp3.encode_mp3(st, sample_rate=22050, bitrate=96,
                              intensity=True, block_type=2)
        sr, pcm = mp3.decode_mp3(data)
        assert sr == 22050 and pcm.shape == (n, 2)
        assert np.allclose(pcm[:, 0], pcm[:, 1], atol=1e-6)
        assert np.abs(pcm[2000:4000, 1]).mean() > 0.05
        lag = 1057
        assert _snr_db(ref[200:n - lag - 200],
                       pcm[200 + lag:n - 200, 1]) > 15.0

    @pytest.mark.parametrize("block_type", [0, 2])
    def test_mpeg1_intensity_end_to_end_pans_right(self, block_type):
        """MPEG-1 intensity (long AND short): is_pos 0 means tan(0)
        panning — left output silent, the spectrum plays on the
        right."""
        n = 6 * 1152
        t = np.arange(n) / 44100.0
        ref = 0.4 * np.sin(2 * np.pi * 440.0 * t)
        st = np.stack([ref, np.zeros(n)], axis=1)
        data = mp3.encode_mp3(st, sample_rate=44100, bitrate=320,
                              intensity=True, block_type=block_type)
        sr, pcm = mp3.decode_mp3(data)
        assert sr == 44100 and pcm.shape == (n, 2)
        assert np.max(np.abs(pcm[:, 0])) == 0.0
        lag = 1057
        assert _snr_db(ref[200:n - lag - 200],
                       pcm[200 + lag:n - 200, 1]) > 15.0

    def test_short_intensity_patched_stream_is_identity(self):
        """A plain-stereo SHORT-block stream patched to
        joint+intensity decodes identically: every window's right
        channel carries a full spectrum, so every per-window
        intensity bound sits at the top and no band pans."""
        n = 4 * 1152
        t = np.arange(n) / 48000.0
        ref = 0.4 * np.sin(2 * np.pi * 520.0 * t)
        st = np.stack([ref, 0.5 * ref], axis=1)
        clean = mp3.encode_mp3(st, sample_rate=48000, bitrate=320,
                               block_type=2)
        data = bytearray(clean)
        for off in range(0, len(data) - 4):
            if data[off] == 0xFF and (data[off + 1] & 0xE0) == 0xE0:
                data[off + 3] = (data[off + 3] & 0x0F) \
                    | (1 << 6) | 0x10
        _, want = mp3.decode_mp3(clean)
        _, got = mp3.decode_mp3(bytes(data))
        assert np.allclose(got, want, atol=1e-6)

    def test_mixed_block_intensity_still_raises(self):
        """Intensity on MIXED short blocks stays a loud guard: patch
        a short-block intensity stream's mixed_block side-info bit."""
        n = 2 * 576
        st = np.stack([0.3 * np.sin(2 * np.pi * 330.0 *
                                    np.arange(n) / 22050.0),
                       np.zeros(n)], axis=1)
        data = bytearray(mp3.encode_mp3(st, sample_rate=22050,
                                        bitrate=96, intensity=True,
                                        block_type=2))
        # LSF stereo side info: 8b main_data_begin + 2b private,
        # then per channel 63 bits. In granule ch0: 12b part2_3 +
        # 9b big_values + 8b global_gain + 9b scalefac_compress +
        # 1b window_switching + 2b block_type -> mixed flag is bit
        # 41 of the side block (0-indexed), i.e. bit 51 overall.
        for off in range(0, len(data) - 4):
            if data[off] == 0xFF and (data[off + 1] & 0xE0) == 0xE0:
                side = off + 4
                for base in (10 + 0 * 63, 10 + 1 * 63):  # both ch
                    bit = base + 41
                    data[side + bit // 8] |= 0x80 >> (bit % 8)
        with pytest.raises(NotImplementedError, match="MIXED"):
            mp3.decode_mp3(bytes(data))


class TestErrors:
    def test_mpeg2_layer2_raises(self):
        from xdlake_spark.operators.codecs import build_mp3_stream
        # patch layer bits to Layer II: still refused loudly
        s = bytearray(build_mp3_stream(3))
        with pytest.raises((NotImplementedError, ValueError)):
            s[1] = (s[1] & ~0x06) | 0x04     # layer II
            mp3.decode_mp3(bytes(s))

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            mp3.decode_mp3(b"")

    def test_bad_bitrate_raises(self):
        with pytest.raises(ValueError):
            mp3.encode_mp3(np.zeros(1152), bitrate=123)

    def test_bad_sample_rate_raises(self):
        with pytest.raises(ValueError):
            mp3.encode_mp3(np.zeros(1152), sample_rate=7000)

    def test_silence_builder_streams_still_decode(self):
        """build_mp3_stream emits zero-spectrum frames; the FULL
        decoder must accept them (the multimodal corpus mixes both)."""
        from xdlake_spark.operators.codecs import build_mp3_stream
        s = build_mp3_stream(4, sample_rate=44100, channels=2)
        sr, pcm = mp3.decode_mp3(s)
        assert sr == 44100
        assert pcm.shape[1] == 2
        assert np.max(np.abs(pcm)) == 0.0


# golden digests, regenerated only on an intentional codec change:
#   python -c "from tests.test_mp3 import _regen; _regen()"
PINNED_STREAM_SHA256 = \
    "88be49a91fa96147d3181d77f736c1f93774fcb181d86f9bb8c160f326f9e516"
PINNED_PCM_SHA256 = \
    "e58d2f2bb77cac392a76b2bfd9b61660b9b95844439268087d0dc4148f8208db"
PINNED_LSF_STREAM_SHA256 = \
    "5ee3dfae9d68ad94e5dfaa5977f86bf615a9e3463df795c49bc6f8cbca597694"
PINNED_LSF_PCM_SHA256 = \
    "0fc6b1be9da4b69ac7d4bbdd431261ac21210701eb90e194c992ed51b0d5e28a"


def _regen():
    data = mp3.encode_mp3_tone(440.0, n_frames=2)
    _, pcm = mp3.decode_mp3(data)
    q = np.round(pcm[:, 0] * 32768.0).astype(np.int32)
    print("stream:", hashlib.sha256(data).hexdigest())
    print("pcm   :", hashlib.sha256(q.tobytes()).hexdigest())
