"""Baseline JPEG codec (pure numpy, ITU-T T.81 baseline process):
round-trips, the exact DC-only contract, and spec validation."""

from __future__ import annotations

import numpy as np
import pytest

from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import (
    QUANT_LUMA,
    decode_jpeg,
    encode_jpeg,
    scale_quant_table,
)


class TestRoundTrips:
    def test_constant_blocks_follow_exact_dc_formula(self):
        import math

        q00 = int(scale_quant_table(QUANT_LUMA, 92)[0, 0])
        assert q00 % 2 == 1  # odd: no rounding ties (module docstring)
        vals = [32, 65, 100, 126]
        px = np.zeros((16, 16), dtype=np.uint8)
        px[:8, :8], px[:8, 8:], px[8:, :8], px[8:, 8:] = vals
        img = decode_jpeg(encode_jpeg(px, quality=92))
        assert img.shape == (16, 16, 1)

        def expect(v):
            d = math.floor((8 * (v - 128)) / q00 + 0.5)
            return max(0, min(255, math.floor(d * q00 / 8 + 0.5) + 128))

        got = [int(img[0, 0, 0]), int(img[0, 8, 0]), int(img[8, 0, 0]), int(img[8, 8, 0])]
        assert got == [expect(v) for v in vals]
        # each decoded block is exactly constant (zero AC energy)
        for a in (0, 8):
            for b in (0, 8):
                assert np.all(img[a : a + 8, b : b + 8, 0] == img[a, b, 0])

    def test_gradient_high_quality_near_lossless(self):
        grad = np.tile(np.arange(64, 192, 2, dtype=np.uint8), (16, 1))[:, :64]
        out = decode_jpeg(encode_jpeg(grad, quality=90))
        assert np.abs(out[:, :, 0].astype(int) - grad.astype(int)).max() <= 1

    def test_color_smooth_small_error(self):
        px = np.zeros((16, 16, 3), dtype=np.uint8)
        for c in range(3):
            px[:, :, c] = (
                np.add.outer(np.arange(16) * 4, np.arange(16) * 3) + 30 * c
            ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=95))
        assert out.shape == (16, 16, 3)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 4

    def test_noise_decodes_with_bounded_error(self):
        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=75))
        assert out.shape == (24, 32, 3)
        # lossy, but not garbage
        assert np.abs(out.astype(int) - px.astype(int)).mean() < 40

    def test_byte_stuffing_survives(self):
        # images whose entropy stream contains 0xFF bytes round-trip;
        # scan many seeds so stuffing is exercised with high probability
        rng = np.random.default_rng(17)
        hits = 0
        for _ in range(8):
            px = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
            blob = encode_jpeg(px, quality=95)
            scan = blob[blob.rfind(b"\xff\xda") : blob.rfind(b"\xff\xd9")]
            hits += scan.count(b"\xff\x00")
            decode_jpeg(blob)  # must not raise
        assert hits > 0  # stuffing actually happened somewhere


class TestRejections:
    def _good(self):
        return encode_jpeg(np.full((8, 8), 90, dtype=np.uint8))

    def test_bad_soi_and_truncation(self):
        good = self._good()
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x00\x00" + good[2:])
        with pytest.raises(ValueError, match="truncated|missing EOI"):
            decode_jpeg(good[:40])

    def test_extended_sequential_rejected(self):
        good = self._good()
        # rewrite SOF0 (0xFFC0) to SOF1 (extended sequential)
        i = good.find(b"\xff\xc0")
        bad = good[:i] + b"\xff\xc1" + good[i + 2 :]
        with pytest.raises(ValueError, match="baseline and progressive"):
            decode_jpeg(bad)

    def test_sof2_routes_but_baseline_scan_shape_rejected(self):
        # a baseline stream relabeled SOF2 reaches the progressive
        # decoder (routing works) and fails ITS validation — a
        # progressive DC scan cannot span the full band
        good = self._good()
        i = good.find(b"\xff\xc0")
        bad = good[:i] + b"\xff\xc2" + good[i + 2 :]
        with pytest.raises(ValueError, match="Se=0"):
            decode_jpeg(bad)

    def test_sampling_factors_beyond_2x2_rejected(self):
        # 2x2 (4:2:0) is now supported; >2 factors (e.g. 4:1:1's 4x1)
        # remain rejected
        good = self._good()
        i = good.find(b"\xff\xc0")
        # component 1's H/V byte sits at SOF payload offset 7 (after
        # len(2) prec(1) h(2) w(2) nc(1) cid(1))
        j = i + 4 + 6 + 1
        for hv in (b"\x33", b"\x41"):
            bad = good[:j] + hv + good[j + 1 :]
            with pytest.raises(ValueError, match="sampling factors"):
                decode_jpeg(bad)

    def test_out_of_sequence_restart_rejected(self):
        # restarts now decode; a WRONG sequence number is the error
        px = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64) % 251
        blob = bytearray(encode_jpeg(px, restart_interval=2))
        i = blob.find(b"\xff\xd0")
        assert i > 0
        blob[i + 1] = 0xD3  # RST0 -> RST3
        with pytest.raises(ValueError, match="out of sequence"):
            decode_jpeg(bytes(blob))

    def test_encoder_input_validation(self):
        with pytest.raises(ValueError, match="uint8"):
            encode_jpeg(np.zeros((8, 8), dtype=np.int32))
        with pytest.raises(ValueError, match="multiples of 8"):
            encode_jpeg(np.zeros((9, 8), dtype=np.uint8))
        with pytest.raises(ValueError, match="quality"):
            encode_jpeg(np.zeros((8, 8), dtype=np.uint8), quality=0)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(blob=st.binary(min_size=0, max_size=1024))
def test_decoder_never_crashes_on_garbage(blob):
    for payload in (blob, b"\xff\xd8" + blob):
        try:
            decode_jpeg(payload)
        except ValueError:
            pass


@settings(max_examples=20, deadline=None)
@given(
    bh=st.integers(1, 3),
    bw=st.integers(1, 3),
    quality=st.integers(30, 98),
    seed=st.integers(0, 2**32 - 1),
)
def test_roundtrip_property_never_crashes(bh, bw, quality, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(bh * 8, bw * 8), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=quality))
    assert out.shape == (bh * 8, bw * 8, 1)


class TestChromaSubsampling:
    """4:2:0 (2x2 luma MCUs + box-averaged chroma) — the dominant
    real-corpus JPEG layout (T.81 A.2.3 interleaving)."""

    def test_420_roundtrip_piecewise_constant_color(self):
        # 16x16 constant-color tiles: chroma is constant within each
        # 2x2 box, so subsampling loses nothing; DC-only blocks decode
        # near-exactly at q92
        rng = np.random.default_rng(7)
        px = np.zeros((32, 32, 3), dtype=np.uint8)
        for ty in range(2):
            for tx in range(2):
                px[ty * 16 : ty * 16 + 16, tx * 16 : tx * 16 + 16] = rng.integers(
                    30, 220, size=3
                )
        blob = encode_jpeg(px, quality=95, subsampling="420")
        img = decode_jpeg(blob)
        assert img.shape == (32, 32, 3)
        assert np.max(np.abs(img.astype(int) - px.astype(int))) <= 6

    def test_420_sof_declares_2x2_luma(self):
        px = np.full((16, 16, 3), 77, dtype=np.uint8)
        blob = encode_jpeg(px, subsampling="420")
        i = blob.find(b"\xff\xc0")
        # luma H/V byte (SOF payload offset 7)
        assert blob[i + 4 + 6 + 1] == 0x22
        # chroma components 1x1
        assert blob[i + 4 + 6 + 4] == 0x11
        assert blob[i + 4 + 6 + 7] == 0x11
        # and the stream is smaller than 4:4:4 of the same content
        assert len(blob) < len(encode_jpeg(px, subsampling="444"))

    def test_420_gradient_close_to_444(self):
        y, x = np.mgrid[0:32, 0:32]
        px = np.stack(
            [
                (y * 8).astype(np.uint8),
                (x * 8).astype(np.uint8),
                ((y + x) * 4).astype(np.uint8),
            ],
            axis=2,
        )
        img420 = decode_jpeg(encode_jpeg(px, quality=95, subsampling="420"))
        img444 = decode_jpeg(encode_jpeg(px, quality=95, subsampling="444"))
        # luma is untouched by subsampling; overall error stays bounded
        err420 = np.mean(np.abs(img420.astype(int) - px.astype(int)))
        err444 = np.mean(np.abs(img444.astype(int) - px.astype(int)))
        assert err420 < err444 + 4.0
        assert np.max(np.abs(img420.astype(int) - px.astype(int))) < 40

    def test_420_noise_roundtrip_decodes(self):
        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, size=(48, 80, 3), dtype=np.uint8).astype(
            np.uint8
        )
        img = decode_jpeg(encode_jpeg(px, quality=85, subsampling="420"))
        assert img.shape == px.shape  # worst-case content still decodes

    def test_420_dimension_validation(self):
        px = np.zeros((24, 24, 3), dtype=np.uint8)  # % 8 ok, % 16 not
        with pytest.raises(ValueError, match="multiples of 16"):
            encode_jpeg(px, subsampling="420")
        with pytest.raises(ValueError, match="subsampling"):
            encode_jpeg(np.zeros((16, 16, 3), np.uint8), subsampling="422")

    def test_420_grayscale_ignores_subsampling(self):
        px = np.full((16, 16), 90, dtype=np.uint8)
        assert decode_jpeg(encode_jpeg(px, subsampling="420")).shape == (16, 16, 1)

    def test_444_bitstreams_unchanged(self):
        # the default path emits byte-identical streams to before the
        # 4:2:0 addition (the driver's fixture hashes depend on it)
        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        blob = encode_jpeg(px, quality=92)
        i = blob.find(b"\xff\xc0")
        assert blob[i + 4 + 6 + 1] == 0x11


class TestProgressive:
    """SOF2 progressive process (T.81 Annex G): the scripted encoder
    refines every bit plane to 0, so decode must be BIT-EXACT with the
    baseline codec's decode of the same image/quality/subsampling."""

    def _exact(self, px, sub="444", quality=85):
        from tiered_storage_for_apache_kafka_spark.operators.jpeg_progressive import (
            encode_jpeg_progressive,
        )

        base = decode_jpeg(encode_jpeg(px, quality=quality, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(px, quality=quality, subsampling=sub)
        )
        assert np.array_equal(base, prog)

    def test_extremes_and_structure(self):
        self._exact(np.zeros((16, 16, 3), np.uint8))
        self._exact(np.full((16, 16, 3), 255, np.uint8))
        self._exact((np.indices((24, 24)).sum(0) % 2 * 255).astype(np.uint8))
        g = np.linspace(0, 255, 48 * 48 * 3).reshape(48, 48, 3)
        self._exact(g.astype(np.uint8), quality=95)

    def test_420_subsampled(self):
        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
        self._exact(px, sub="420", quality=60)

    def test_process_sniffer(self):
        from tiered_storage_for_apache_kafka_spark.operators.jpeg_progressive import (
            encode_jpeg_progressive,
            jpeg_process,
        )

        px = np.full((8, 8), 77, np.uint8)
        assert jpeg_process(encode_jpeg(px)) == "baseline"
        assert jpeg_process(encode_jpeg_progressive(px)) == "progressive"
        assert jpeg_process(b"\x00\x01") == "not-jpeg"
        base = encode_jpeg(px)
        i = base.find(b"\xff\xc0")
        assert jpeg_process(base[:i] + b"\xff\xc1" + base[i + 2:]) == "extended"

    @settings(max_examples=15, deadline=None)
    @given(
        bh=st.integers(1, 4),
        bw=st.integers(1, 4),
        quality=st.integers(10, 100),
        seed=st.integers(0, 2**32 - 1),
        color=st.booleans(),
    )
    def test_roundtrip_property_bit_exact_vs_baseline(
        self, bh, bw, quality, seed, color
    ):
        rng = np.random.default_rng(seed)
        shape = (bh * 8, bw * 8, 3) if color else (bh * 8, bw * 8)
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        self._exact(px, quality=quality)

    @settings(max_examples=25, deadline=None)
    @given(blob=st.binary(min_size=0, max_size=512))
    def test_progressive_decoder_never_crashes_on_garbage(self, blob):
        from tiered_storage_for_apache_kafka_spark.operators.jpeg_progressive import (
            decode_progressive,
        )

        for payload in (blob, b"\xff\xd8\xff\xc2" + blob):
            try:
                decode_progressive(payload)
            except ValueError:
                pass


class TestProgressiveRefineEntropy:
    """Coefficient-level regression guard for the AC-refinement entropy
    coder: a previously-significant coefficient sitting INSIDE a >16
    zero-history run must not desynchronize the stream (the encoder has
    to emit the ZRL at the first nonzero position once the run exceeds
    15 — emitting it lazily at the next NEW coefficient flushes
    correction bits the decoder's 16-position advance never reaches)."""

    @staticmethod
    def _roundtrip(full, al=0):
        from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import (
            AC_LUMA_BITS,
            AC_LUMA_VALS,
            _BitReader,
            _build_huffman,
            _decoder_for,
        )
        from tiered_storage_for_apache_kafka_spark.operators.jpeg_progressive import (
            _ac_refine_scan,
            _encode_ac_refine,
        )

        codes = _build_huffman(AC_LUMA_BITS, AC_LUMA_VALS)
        dec = _decoder_for(AC_LUMA_BITS, AC_LUMA_VALS)
        plane = np.zeros((1, 1, 64), dtype=np.int32)
        plane[0, 0] = full
        blob = _encode_ac_refine(
            plane, {"nby": 1, "nbx": 1}, codes, 1, 63, al
        )
        prior = np.zeros((1, 1, 64), dtype=np.int32)
        for k in range(1, 64):
            v = int(full[k])
            s = 1 if v >= 0 else -1
            prior[0, 0, k] = s * ((abs(v) >> (al + 1)) << (al + 1))
        _ac_refine_scan(
            _BitReader(blob), {"nby": 1, "nbx": 1}, prior, dec, 1, 63, al
        )
        want = np.zeros(64, dtype=np.int32)
        for k in range(1, 64):
            v = int(full[k])
            s = 1 if v >= 0 else -1
            want[k] = s * ((abs(v) >> al) << al)
        got = prior[0, 0].copy()
        got[0] = 0
        assert np.array_equal(got, want), (got[got != want], want[got != want])

    def test_history_coef_inside_long_zero_run(self):
        full = np.zeros(64, dtype=np.int64)
        full[21] = 5  # history coefficient mid-run
        full[27] = -1  # newly significant after it
        self._roundtrip(full)

    def test_history_past_last_new_rides_the_eob(self):
        full = np.zeros(64, dtype=np.int64)
        full[3] = 1  # last new coefficient
        full[40] = 9  # history far past it: bit rides the EOB
        self._roundtrip(full)

    def test_fuzz_sparse_blocks(self):
        rng = np.random.default_rng(42)
        for _ in range(200):
            full = np.zeros(64, dtype=np.int64)
            nz = rng.integers(0, 12)
            idx = rng.choice(np.arange(1, 64), size=nz, replace=False)
            full[idx] = rng.integers(-40, 41, size=nz)
            self._roundtrip(full, al=int(rng.integers(0, 3)))



class TestRestartIntervals:
    """DRI + RSTn resync — common in camera/web JPEGs. The decoded
    pixels must be IDENTICAL to the no-restart encoding of the same
    image (restarts change entropy segmentation, not values)."""

    @pytest.mark.parametrize("sub,ri,shape", [
        ("444", 2, (32, 32, 3)),
        ("444", 1, (48, 40)),
        ("420", 2, (48, 48, 3)),
    ])
    def test_baseline_restart_roundtrip(self, sub, ri, shape):
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg(px, quality=80, subsampling=sub))
        blob = encode_jpeg(
            px, quality=80, subsampling=sub, restart_interval=ri
        )
        assert b"\xff\xdd" in blob and b"\xff\xd0" in blob
        assert np.array_equal(plain, decode_jpeg(blob))

    @pytest.mark.parametrize("sub,ri,shape", [
        ("444", 2, (40, 48, 3)),
        ("420", 1, (32, 32, 3)),
        ("444", 3, (48, 48)),
    ])
    def test_progressive_restart_roundtrip(self, sub, ri, shape):
        from tiered_storage_for_apache_kafka_spark.operators.jpeg_progressive import (
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(4)
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(px, quality=70, subsampling=sub))
        blob = encode_jpeg_progressive(
            px, quality=70, subsampling=sub, restart_interval=ri
        )
        assert np.array_equal(base, decode_jpeg(blob))


class TestProgressiveEOBn:
    """The decoder's EOBn (r>0) branches: our scripted encoder only
    emits EOB0 (the standard tables have no EOBn symbols), but foreign
    optimizing encoders use multi-block EOB runs — exercised here with
    a hand-built Huffman table that carries the EOB2 symbol."""

    @staticmethod
    def _codec():
        from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import (
            _build_huffman,
            _decoder_for,
        )

        bits = [0, 4] + [0] * 14  # four 2-bit codes
        vals = [0x01, 0x20, 0x00, 0xF0]  # (0,1), EOB2, EOB0, ZRL
        return _build_huffman(bits, vals), _decoder_for(bits, vals)

    def test_ac_first_eob_run_spans_blocks(self):
        from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import (
            _BitReader,
            _BitWriter,
        )
        from tiered_storage_for_apache_kafka_spark.operators.jpeg_progressive import (
            _ac_first_scan,
        )

        codes, dec = self._codec()
        w = _BitWriter()
        c, s = codes[0x01]
        w.write(c, s)
        w.write(1, 1)  # block 0: +1 at k=1
        c, s = codes[0x20]
        w.write(c, s)
        w.write(0b11, 2)  # EOB2 + ext 3: blocks 1..6 all-EOB
        c, s = codes[0x01]
        w.write(c, s)
        w.write(0, 1)  # block 7: -1 at k=1
        c, s = codes[0x00]
        w.write(c, s)  # EOB0 ends block 7
        coef = np.zeros((2, 4, 64), dtype=np.int32)
        _ac_first_scan(
            _BitReader(w.flush()), {"nby": 2, "nbx": 4}, coef, dec, 1, 63, 0
        )
        want = np.zeros((8, 64), dtype=np.int32)
        want[0, 1] = 1
        want[7, 1] = -1
        assert np.array_equal(coef.reshape(8, 64), want)

    def test_ac_refine_eob_run_carries_correction_bits(self):
        from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import (
            _BitReader,
            _BitWriter,
        )
        from tiered_storage_for_apache_kafka_spark.operators.jpeg_progressive import (
            _ac_refine_scan,
        )

        codes, dec = self._codec()
        # 4 blocks, each with prior history 2 at k=2; EOB2 covers all 4
        # (eobrun = (1<<2) + ext 0); the 4 correction bits stream after
        # the codeword in block order -> refined to 3,2,3,2
        w = _BitWriter()
        c, s = codes[0x20]
        w.write(c, s)
        w.write(0, 2)  # EOB2, ext=0 -> eobrun 4
        for b in (1, 0, 1, 0):
            w.write(b, 1)
        coef = np.zeros((1, 4, 64), dtype=np.int32)
        coef[0, :, 2] = 2
        _ac_refine_scan(
            _BitReader(w.flush()), {"nby": 1, "nbx": 4}, coef, dec, 1, 63, 0
        )
        assert coef[0, :, 2].tolist() == [3, 2, 3, 2]
