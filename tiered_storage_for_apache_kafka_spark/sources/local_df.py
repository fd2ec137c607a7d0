"""DataFrames from driver-local metadata lists, with a slice count
derived from the row count.

``spark.createDataFrame(list, ...)`` parallelizes the list into
``defaultParallelism`` slices, so every bounded planning frame (file
lists, sequence-number maps, partition tuples, DV payloads) becomes a
32-task stage on a 32-core master even when it holds a dozen rows —
pure scheduling overhead on every merge-on-read scan. The slice count
here scales with the data instead: one slice per ``_ROWS_PER_SLICE``
rows, capped at ``defaultParallelism``, so tiny frames are 1-task
stages while genuinely large delete/manifest sets still spread.
"""

from __future__ import annotations

_ROWS_PER_SLICE = 10_000


def local_rows_df(spark, rows, schema, slices: int | None = None):
    """``createDataFrame`` for a driver-local list of row tuples.

    ``slices`` overrides the derived count (e.g. a frame that exists to
    fan out per-row work wants one slice per row)."""
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        # an empty list still parallelizes into defaultParallelism
        # EMPTY partitions by default — one empty slice instead
        return spark.createDataFrame(
            spark.sparkContext.parallelize([], 1), schema
        )
    if slices is None:
        slices = min(
            spark.sparkContext.defaultParallelism,
            (len(rows) - 1) // _ROWS_PER_SLICE + 1,
        )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, max(1, slices)), schema
    )
