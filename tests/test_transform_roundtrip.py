"""Transform→detransform identity — the reference's TransformsEndToEndTest
upgraded to property-based testing (its codebase carries a TODO for this
at ChunkSizesBinaryCodec.java:23)."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings, strategies as st

from tiered_storage_for_apache_kafka_spark.manifest.chunk_index import (
    FixedSizeChunkIndex,
    VariableSizeChunkIndex,
)
from tiered_storage_for_apache_kafka_spark.transform.compression import (
    requires_compression,
)
from tiered_storage_for_apache_kafka_spark.transform.encryption import (
    ENCRYPTION_OVERHEAD,
    create_data_key_and_aad,
)
from tiered_storage_for_apache_kafka_spark.transform.pipeline import (
    detransform,
    transform,
)


@settings(max_examples=30, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=20_000),
    chunk_size=st.sampled_from([1, 7, 1023, 4096, 1 << 20]),
    compression=st.booleans(),
    encryption=st.booleans(),
)
def test_roundtrip_identity(data, chunk_size, compression, encryption):
    key = create_data_key_and_aad() if encryption else None
    result = transform(data, chunk_size, compression=compression, encryption_key=key)
    back = b"".join(
        detransform(
            result.data, result.chunk_index, compression=compression, encryption_key=key
        )
    )
    assert back == data
    assert result.original_size == len(data)


def test_index_flavor_selection():
    data = bytes(range(256)) * 64  # 16 KiB
    key = create_data_key_and_aad()
    # no compression -> fixed (arithmetic) index
    assert isinstance(transform(data, 1000).chunk_index, FixedSizeChunkIndex)
    assert isinstance(
        transform(data, 1000, encryption_key=key).chunk_index, FixedSizeChunkIndex
    )
    # compression -> variable index
    assert isinstance(
        transform(data, 1000, compression=True).chunk_index, VariableSizeChunkIndex
    )


def test_encrypted_fixed_geometry():
    data = b"x" * 2500
    key = create_data_key_and_aad()
    result = transform(data, 1000, encryption_key=key)
    idx = result.chunk_index
    assert idx.count == 3
    assert idx.transformed_size(0) == 1000 + ENCRYPTION_OVERHEAD
    assert idx.transformed_size(2) == 500 + ENCRYPTION_OVERHEAD
    # ciphertexts of identical plaintext chunks must differ (fresh IV per chunk)
    c0 = result.data[: idx.transformed_size(0)]
    c1 = result.data[idx.transformed_size(0) : 2 * idx.transformed_size(0)]
    assert c0 != c1


def test_partial_detransform_matches_slice():
    data = bytes([i % 251 for i in range(10_000)])
    result = transform(data, 1024, compression=True)
    idx = result.chunk_index
    # detransform only chunks 3..5 from their transformed byte window
    lo = idx.transformed_position(3)
    hi = idx.transformed_position(5) + idx.transformed_size(5)
    out = b"".join(
        detransform(result.data[lo:hi], idx, compression=True, chunk_ids=[3, 4, 5])
    )
    assert out == data[3 * 1024 : 6 * 1024]


def test_compression_heuristic():
    import random

    compressible = b"a" * 10_000
    rng = random.Random(7)
    incompressible = zlib.compress(bytes(rng.getrandbits(8) for _ in range(10_000)), 9)
    assert requires_compression(compressible)
    assert not requires_compression(incompressible)


def test_wrong_key_fails():
    data = b"secret" * 100
    key = create_data_key_and_aad()
    other = create_data_key_and_aad()
    result = transform(data, 128, encryption_key=key)
    with pytest.raises(Exception):
        b"".join(detransform(result.data, result.chunk_index, encryption_key=other))
