"""PPM (netpbm P6) decode path: the dependency-free REAL member of
the multimodal decode family (JPEG/PNG stay stubbed behind missing
codecs). Oracle parity for multimodal_image_decode runs in the DuckDB
gate; these pin the codec itself."""

from __future__ import annotations


class TestPpmDecode:
    def test_roundtrip_random_image(self):
        import numpy as np

        from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
            decode_ppm,
            encode_ppm,
        )

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
        out = decode_ppm(encode_ppm(img))
        assert out.shape == (9, 13, 3)
        assert (out == img).all()

    def test_rejects_bad_magic_and_truncation(self):
        import numpy as np
        import pytest

        from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
            decode_ppm,
            encode_ppm,
        )

        img = np.zeros((4, 4, 3), dtype=np.uint8)
        good = encode_ppm(img)
        with pytest.raises(ValueError, match="not a binary PPM"):
            decode_ppm(b"P5" + good[2:])
        with pytest.raises(ValueError, match="truncated"):
            decode_ppm(good[:-5])
        with pytest.raises(ValueError, match="16-bit"):
            decode_ppm(b"P6\n4 4\n65535\n" + b"\x00" * 96)

    def test_thumbnail_is_stride2_slice(self, spark):
        from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
            multimodal_image_decode,
            multimodal_ppm_assets,
            decode_ppm,
        )

        sf = "/root/testdata/sf0.001"
        rows = {r.doc_id: r for r in multimodal_image_decode(spark, sf).collect()}
        blobs = {r.doc_id: bytes(r.blob) for r in
                 multimodal_ppm_assets(spark, sf).limit(5).collect()}
        for doc_id, blob in blobs.items():
            img = decode_ppm(blob)
            assert rows[doc_id].thumb_byte_sum == int(img[::2, ::2, :].sum())
            assert rows[doc_id].mean_r == int(img[:, :, 0].sum()) // 256


class TestWavDecode:
    def test_roundtrip_random_audio(self):
        import numpy as np

        from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
            decode_wav_pcm16,
            encode_wav_pcm16,
        )

        rng = np.random.default_rng(11)
        samples = rng.integers(-32768, 32768, size=301, dtype=np.int16)
        rate, out = decode_wav_pcm16(encode_wav_pcm16(samples, 8000))
        assert rate == 8000
        assert (out == samples).all()

    def test_rejects_non_wave_and_unsupported(self):
        import numpy as np
        import pytest

        from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
            decode_wav_pcm16,
            encode_wav_pcm16,
        )

        good = encode_wav_pcm16(np.zeros(8, dtype=np.int16))
        with pytest.raises(ValueError, match="not a RIFF/WAVE"):
            decode_wav_pcm16(b"RIFX" + good[4:])
        with pytest.raises(ValueError, match="truncated"):
            decode_wav_pcm16(good[:-3])
        # stereo fmt chunk -> unsupported
        import struct

        bad = bytearray(good)
        struct.pack_into("<H", bad, 22, 2)  # channels = 2
        with pytest.raises(ValueError, match="PCM16 mono"):
            decode_wav_pcm16(bytes(bad))

    def test_chunk_walker_skips_foreign_chunks(self):
        import numpy as np
        import struct

        from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
            decode_wav_pcm16,
            encode_wav_pcm16,
        )

        samples = np.arange(16, dtype=np.int16)
        good = encode_wav_pcm16(samples)
        # splice a LIST chunk (odd length -> exercises word alignment)
        # between fmt and data
        fmt_end = 12 + 8 + 16
        foreign = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        spliced = good[:fmt_end] + foreign + good[fmt_end:]
        rate, out = decode_wav_pcm16(spliced)
        assert rate == 16000 and (out == samples).all()


class TestY4mDecode:
    def test_roundtrip(self):
        import numpy as np

        from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
            decode_y4m,
            encode_y4m,
        )

        rng = np.random.default_rng(3)
        frames = [rng.integers(0, 256, 192, dtype=np.uint8) for _ in range(4)]
        w, h, out = decode_y4m(encode_y4m(frames))
        assert (w, h) == (8, 8) and len(out) == 4
        assert all((a == b).all() for a, b in zip(out, frames))

    def test_rejections(self):
        import numpy as np
        import pytest

        from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
            decode_y4m,
            encode_y4m,
        )

        good = encode_y4m([np.zeros(192, dtype=np.uint8)])
        with pytest.raises(ValueError, match="not a YUV4MPEG2"):
            decode_y4m(b"JUNK" + good)
        with pytest.raises(ValueError, match="truncated"):
            decode_y4m(good[:-10])
        with pytest.raises(ValueError, match="C444"):
            decode_y4m(good.replace(b"C444", b"C420"))
        with pytest.raises(ValueError, match="FRAME"):
            decode_y4m(good.replace(b"FRAME\n", b"FRAMX\n"))


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=80, deadline=None)
@given(blob=st.binary(min_size=0, max_size=2048))
def test_decoders_never_crash_on_garbage(blob):
    """Robustness contract of every decode stage: arbitrary bytes either
    decode or raise ValueError — never an IndexError/struct.error that
    would kill an executor task with an undiagnosable traceback."""
    from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
        decode_ppm,
        decode_wav_pcm16,
        decode_y4m,
    )

    for dec in (decode_ppm, decode_wav_pcm16, decode_y4m):
        try:
            dec(blob)
        except ValueError:
            pass


@settings(max_examples=40, deadline=None)
@given(prefix=st.binary(min_size=0, max_size=64))
def test_decoders_never_crash_on_corrupted_valid_headers(prefix):
    """Garbage appended after a valid magic/header is the nastier case:
    parsers are past their cheap magic check and walking structure."""
    from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
        decode_ppm,
        decode_wav_pcm16,
        decode_y4m,
    )

    for dec, head in (
        (decode_ppm, b"P6\n16 16\n255\n"),
        (decode_wav_pcm16, b"RIFF\x24\x08\x00\x00WAVE"),
        (decode_y4m, b"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C444\n"),
    ):
        try:
            dec(head + prefix)
        except ValueError:
            pass


def test_wav_short_fmt_chunk_raises_valueerror():
    import struct

    import pytest

    from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
        decode_wav_pcm16,
    )

    blob = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    )
    with pytest.raises(ValueError, match="fmt chunk too short"):
        decode_wav_pcm16(blob)


def test_ppm_comment_headers_and_negative_y4m_dims():
    import pytest

    from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
        decode_ppm,
        decode_y4m,
    )

    # spec-legal comment lines (GIMP/ImageMagick) decode fine
    blob = b"P6\n# created by GIMP\n4 4\n255\n" + bytes(range(48))
    assert decode_ppm(blob).shape == (4, 4, 3)
    with pytest.raises(ValueError, match="non-positive"):
        decode_ppm(b"P6\n0 4\n255\n")
    with pytest.raises(ValueError, match="non-positive"):
        decode_y4m(b"YUV4MPEG2 W-8 H-8 C444\nFRAME\n" + b"\x00" * 192)


class TestPngDecode:
    """Baseline PNG codec (stdlib zlib + numpy unfiltering): round-trips
    across color types and filter assignments, spec validation, CRC."""

    def test_roundtrip_all_color_types_and_filters(self):
        import numpy as np

        from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(11)
        for shape in [(16, 16, 3), (5, 7, 1), (9, 4, 4), (1, 1, 3), (2, 3, 3)]:
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            out = decode_png(encode_png(px))
            assert out.shape == shape and (out == px).all()
        # each filter type alone, so every unfilter kernel is pinned
        for ft in range(5):
            px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
            assert (decode_png(encode_png(px, filters=[ft] * 8)) == px).all()

    def test_grayscale_2d_input_roundtrips(self):
        import numpy as np

        from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        px = np.arange(35, dtype=np.uint8).reshape(5, 7)
        out = decode_png(encode_png(px))
        assert out.shape == (5, 7, 1)
        assert (out[:, :, 0] == px).all()

    def test_rejections(self):
        import struct
        import zlib

        import numpy as np
        import pytest

        from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
            _png_chunk,
            _PNG_SIG,
            decode_png,
            encode_png,
        )

        good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"NOPE" + good[4:])
        # flip a byte inside the IHDR body -> CRC mismatch
        with pytest.raises(ValueError, match="CRC"):
            decode_png(good[:20] + bytes([good[20] ^ 1]) + good[21:])
        with pytest.raises(ValueError, match="truncated"):
            decode_png(good[:-6])

        def make(depth=8, color=2, interlace=0, comp=0, fmeth=0, raw=None, w=2, h=2):
            ihdr = struct.pack(">IIBBBBB", w, h, depth, color, comp, fmeth, interlace)
            if raw is None:
                ch = {0: 1, 2: 3, 6: 4}.get(color, 3)
                raw = b"".join(b"\x00" + b"\x00" * (w * ch) for _ in range(h))
            return (
                _PNG_SIG
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(raw))
                + _png_chunk(b"IEND", b"")
            )

        with pytest.raises(ValueError, match="bit depth"):
            decode_png(make(depth=16))
        with pytest.raises(ValueError, match="color type"):
            decode_png(make(color=3))  # palette needs PLTE, unsupported
        with pytest.raises(ValueError, match="interlace"):
            decode_png(make(interlace=1))
        with pytest.raises(ValueError, match="size mismatch"):
            decode_png(make(raw=b"\x00" * 7))
        with pytest.raises(ValueError, match="filter type"):
            decode_png(make(raw=b"\x09" + b"\x00" * 6 + b"\x00" * 7))
        with pytest.raises(ValueError, match="inflate"):
            decode_png(
                _PNG_SIG
                + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
                + _png_chunk(b"IDAT", b"not deflate data")
                + _png_chunk(b"IEND", b"")
            )
        with pytest.raises(ValueError, match="first chunk"):
            decode_png(_PNG_SIG + _png_chunk(b"IDAT", b"") + good[len(_PNG_SIG):])
        with pytest.raises(ValueError, match="non-positive"):
            decode_png(make(w=0))

    def test_ancillary_chunks_are_skipped(self):
        import numpy as np

        from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
            _png_chunk,
            _PNG_SIG,
            decode_png,
            encode_png,
        )

        px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        blob = encode_png(px)
        # splice a tEXt chunk between IHDR and IDAT (writers emit these)
        ihdr_end = len(_PNG_SIG) + 12 + 13
        spliced = (
            blob[:ihdr_end]
            + _png_chunk(b"tEXt", b"Comment\x00synthetic")
            + blob[ihdr_end:]
        )
        assert (decode_png(spliced) == px).all()


@settings(max_examples=60, deadline=None)
@given(blob=st.binary(min_size=0, max_size=2048))
def test_png_decoder_never_crashes_on_garbage(blob):
    from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
        _PNG_SIG,
        decode_png,
    )

    for payload in (blob, _PNG_SIG + blob):
        try:
            decode_png(payload)
        except ValueError:
            pass


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    ch=st.sampled_from([1, 3, 4]),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, ch, data):
    import numpy as np

    from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    seed = data.draw(st.integers(0, 2**32 - 1))
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    assert (decode_png(encode_png(px, filters=filters)) == px).all()


def test_resize_image_real_kernel_all_formats():
    import numpy as np

    from tiered_storage_for_apache_kafka_spark.operators.multimodal import (
        decode_ppm,
        encode_png,
        encode_ppm,
        resize_image,
    )
    from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import encode_jpeg

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    # PPM in -> PPM out, nearest-neighbor index map
    small = decode_ppm(resize_image(encode_ppm(rgb), 4, 4))
    assert small.shape == (4, 4, 3)
    assert (small[0, 0] == rgb[2, 2]).all()  # floor((0+0.5)*16/4) = 2
    # RGBA PNG: alpha dropped, not a crash
    rgba = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    out = decode_ppm(resize_image(encode_png(rgba), 2, 2))
    assert out.shape == (2, 2, 3)
    # grayscale JPEG: channel replicated to RGB
    gray = np.full((8, 8), 77, dtype=np.uint8)
    out = decode_ppm(resize_image(encode_jpeg(gray), 3, 3))
    assert out.shape == (3, 3, 3)
    with __import__("pytest").raises(ValueError, match="non-positive"):
        resize_image(encode_ppm(rgb), 0, 4)
