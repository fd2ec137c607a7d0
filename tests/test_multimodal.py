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
