"""SQL-surface functions of the engine (UDTF / UDF registration).

The reference's plugin surface is strategy classes (`StorageBackend`,
`ChunkCache`, `StructureProvider` — SURVEY.md §2.4); the Spark-native
equivalent of "extend the engine from the query language" is registered
functions. This package exposes the engine's planning arithmetic as a
Python UDTF so SQL users can introspect fetch plans:

    SELECT * FROM chunk_plan(2147483000, 4194304, 1000000, 9000000)

yields one row per chunk a ranged fetch would touch — the relational
view of `AbstractChunkIndex.chunksForRange` (reference
`AbstractChunkIndex.java:113-123`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@udtf(
    returnType=(
        "chunk_id INT, original_position BIGINT, original_size BIGINT, "
        "fetch_skip BIGINT, fetch_take BIGINT"
    )
)
class ChunkPlanUDTF:
    """Table function: the chunk plan for a byte-ranged fetch.

    Args: original_file_size, chunk_size, range_from, range_to
    (inclusive original-byte positions, LONGs — the engine deliberately
    widens the reference's int-bounded positions, SURVEY.md §7.4.5).
    `fetch_skip`/`fetch_take` encode the R7 trim: bytes to skip in the
    first chunk and to keep from each chunk.
    """

    def eval(self, file_size: int, chunk_size: int, lo: int, hi: int):
        if file_size is None or chunk_size is None or chunk_size <= 0:
            return
        hi = min(hi, file_size - 1)
        if lo > hi or lo < 0:
            return
        first = lo // chunk_size
        last = hi // chunk_size
        for cid in range(first, last + 1):
            pos = cid * chunk_size
            size = min(chunk_size, file_size - pos)
            start_in_chunk = max(lo - pos, 0)
            end_in_chunk = min(hi - pos, size - 1)
            yield (
                cid,
                pos,
                size,
                start_in_chunk,
                end_in_chunk - start_in_chunk + 1,
            )


def register_functions(spark) -> None:
    """Register the engine's SQL functions on a session."""
    spark.udtf.register("chunk_plan", ChunkPlanUDTF)


def weighted_mean_udaf():
    """Grouped-aggregate Pandas UDAF (Arrow-batched): value-weighted mean
    — the UDAF point on the UDF/UDAF/UDTF surface (SURVEY.md §2.4). Used
    as `df.groupBy(k).agg(weighted_mean_udaf()(col_v, col_w))`; executes
    as a two-phase aggregation with the Python stage only at the final
    combine."""

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        total = float((v * w).sum())
        denom = float(w.sum())
        return total / denom if denom else float("nan")

    return weighted_mean
