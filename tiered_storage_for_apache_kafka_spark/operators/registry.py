"""Central query registry.

Every operator the engine claims (SURVEY.md §2) registers here:
a Spark callable ``(spark, sf_dir) -> DataFrame`` and, when
SQL-expressible, an equivalent DuckDB oracle SQL string. The driver
runs both sides at sf0.01 and hash-compares (order-insensitive,
columns sorted by name) — so Spark aliases and SQL ``AS`` names MUST
match exactly.

Portability rules used throughout the operator modules (so that the
same values hash identically from Spark and DuckDB):

- money/quantity aggregates: cast to DECIMAL *before* arithmetic/SUM
  (double sums differ in ulps between engines; decimal sums are exact);
- integer division: ``FLOOR(x / c.0)`` + cast BIGINT (DuckDB ``/`` on
  ints yields double, Spark yields double too — floor both);
- no raw TIMESTAMP outputs (parquet ns vs Spark µs truncation) — cast
  to DATE or extract fields;
- hashing of content: ``md5`` hex strings (identical in both engines);
- float similarity scores are never output raw — ranks are output, with
  ordering on ``round(sim, N)`` plus a deterministic id tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB SQL or None (rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
