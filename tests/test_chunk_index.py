"""Chunk-index math: invariants from FIXTURES.md §5 and the reference's
builder tests (ChunkIndexBuilderCommonTest / Fixed / Variable)."""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from tiered_storage_for_apache_kafka_spark.manifest.chunk_index import (
    FixedSizeChunkIndex,
    VariableSizeChunkIndex,
    chunk_index_from_dict,
)
from tiered_storage_for_apache_kafka_spark.manifest.codec import (
    decode_chunk_sizes_b64,
    encode_chunk_sizes_b64,
)
from tiered_storage_for_apache_kafka_spark.storage.backend import BytesRange


def fixed(chunk=100, size=1050):
    count = -(-size // chunk)
    final = size - chunk * (count - 1)
    return FixedSizeChunkIndex(chunk, size, chunk, final)


class TestFixedIndex:
    def test_geometry(self):
        idx = fixed()
        assert idx.count == 11
        chunks = idx.chunks()
        assert [c.original_size for c in chunks[:-1]] == [100] * 10
        assert chunks[-1].original_size == 50
        # prefix-sum invariant
        for prev, cur in zip(chunks, chunks[1:]):
            assert cur.original_position == prev.original_position + prev.original_size
            assert (
                cur.transformed_position
                == prev.transformed_position + prev.transformed_size
            )

    def test_offset_lookup_borders(self):
        idx = fixed()
        assert idx.chunk_for_original_offset(0).id == 0
        assert idx.chunk_for_original_offset(99).id == 0
        assert idx.chunk_for_original_offset(100).id == 1
        assert idx.chunk_for_original_offset(1049).id == 10
        with pytest.raises(ValueError):
            idx.chunk_for_original_offset(1050)

    def test_range_planning(self):
        idx = fixed()
        assert [c.id for c in idx.chunks_for_range(BytesRange(0, 99))] == [0]
        assert [c.id for c in idx.chunks_for_range(BytesRange(0, 100))] == [0, 1]
        assert [c.id for c in idx.chunks_for_range(BytesRange(99, 100))] == [0, 1]
        assert [c.id for c in idx.chunks_for_range(BytesRange(250, 460))] == [2, 3, 4]
        # clamp beyond end
        assert [c.id for c in idx.chunks_for_range(BytesRange(1000, 99999))] == [10]
        with pytest.raises(ValueError):
            idx.chunks_for_range(BytesRange(1050, 2000))

    def test_single_chunk_file(self):
        idx = FixedSizeChunkIndex(1 << 30, 777, 1 << 30, 777)
        assert idx.count == 1
        assert idx.chunk(0).original_size == 777


class TestVariableIndex:
    def test_prefix_sums(self):
        sizes = [90, 85, 95, 40]
        idx = VariableSizeChunkIndex(100, 340, sizes)
        chunks = idx.chunks()
        assert [c.transformed_size for c in chunks] == sizes
        assert [c.transformed_position for c in chunks] == [0, 90, 175, 270]

    def test_size_count_mismatch(self):
        with pytest.raises(ValueError):
            VariableSizeChunkIndex(100, 340, [90, 85])

    def test_serde_roundtrip(self):
        idx = VariableSizeChunkIndex(100, 340, [90, 85, 95, 40])
        again = chunk_index_from_dict(idx.to_dict())
        assert again.chunks() == idx.chunks()

    def test_fixed_serde_roundtrip(self):
        idx = fixed()
        again = chunk_index_from_dict(idx.to_dict())
        assert again.chunks() == idx.chunks()


class TestSizesCodec:
    @given(
        st.lists(st.integers(min_value=0, max_value=10_000_000), min_size=0, max_size=500)
    )
    def test_roundtrip(self, sizes):
        assert decode_chunk_sizes_b64(encode_chunk_sizes_b64(sizes)) == sizes

    def test_compactness(self):
        # 2000 near-equal sizes (the README's 2 GB @ 1 MiB case) stays small
        sizes = [1_048_576 + (i % 50) for i in range(2000)]
        assert len(encode_chunk_sizes_b64(sizes)) < 4096
