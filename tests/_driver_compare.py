"""Driver-faithful result comparison, shared by the in-repo gates.

Used by ``test_queries_vs_duckdb.py`` (engine session, sf0.01) and by
the ``test_driver_session_parity.py`` subprocess (default-conf session,
sf0.001). Cells are stringified WITHOUT any semantic normalization —
``Decimal('253942.00')`` and ``float64 253942.0`` are *different* here,
exactly as they hash differently in the external correctness driver
(round-1 lesson: a semantic compare stayed green while the driver hash
was red).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb
import pandas as pd

from tiered_storage_for_apache_kafka_spark.tables import TABLE_NAMES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def canon(v) -> str:
    """Stringify a pandas cell with NO cross-dtype normalization (a
    Decimal and an equal float must stringify differently, as they hash
    differently in the driver)."""
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):  # covers np.float64 (subclass)
        if math.isnan(v):
            return "NaN"
        return f"f:{v!r}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return "1" if v else "0"
    return str(v)


def canon_frame(df: pd.DataFrame):
    cols = sorted(df.columns)
    return sorted(
        tuple(canon(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )


def compare_frames(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    """Raise AssertionError on any driver-visible mismatch (columns,
    row count, order-insensitive values)."""
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={list(spark_pdf.columns)} "
        f"duck={list(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s = canon_frame(spark_pdf)
    d = canon_frame(duck_pdf)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
