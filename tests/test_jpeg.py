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

    def test_progressive_rejected(self):
        good = self._good()
        # rewrite SOF0 (0xFFC0) to SOF2 (progressive)
        i = good.find(b"\xff\xc0")
        bad = good[:i] + b"\xff\xc2" + good[i + 2 :]
        with pytest.raises(ValueError, match="baseline only"):
            decode_jpeg(bad)

    def test_subsampling_rejected(self):
        good = self._good()
        i = good.find(b"\xff\xc0")
        # component 1's H/V byte sits at SOF payload offset 7 (after
        # len(2) prec(1) h(2) w(2) nc(1) cid(1))
        j = i + 4 + 6 + 1
        bad = good[:j] + b"\x22" + good[j + 1 :]
        with pytest.raises(ValueError, match="subsampling"):
            decode_jpeg(bad)

    def test_restart_interval_rejected(self):
        good = self._good()
        i = good.find(b"\xff\xda")
        dri = b"\xff\xdd\x00\x04\x00\x08"  # DRI, interval 8
        with pytest.raises(ValueError, match="restart"):
            decode_jpeg(good[:i] + dri + good[i:])

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
