"""Iceberg partition transforms (spec "Partition Transforms").

Real Iceberg tables rarely partition by identity: the spec's transform
set — ``bucket[N]`` (32-bit Murmur3, the x86 variant with seed 0, of
the value's canonical byte form, masked positive, mod N),
``truncate[W]`` (floor to width for ints, prefix for strings), and the
temporal family ``year/month/day/hour`` (offsets from the Unix epoch)
— is what production write paths use. This module implements the
transform functions bit-for-bit per the spec (Murmur3 pinned by the
spec's own published test vectors: ``bucket`` hash of int/long 34 is
2017239379, of UTF-8 "iceberg" is 1210000089), both scalar (planning:
predicate -> partition value) and vectorized over numpy int64 arrays
(write path: Arrow-batched partition-column computation).

Scale shape: the vectorized forms are pure uint32 numpy arithmetic —
one pass, no Python loop — used from a pandas UDF so the hot path
stays Arrow-batched; the scalar forms serve metadata-plane pruning
(one value per predicate, driver-side).
"""

from __future__ import annotations

import re
import struct

import numpy as np
import pandas as pd

_M32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593

#: micros per unit for the temporal transforms
_MICROS_PER_HOUR = 3_600_000_000
_MICROS_PER_DAY = 86_400_000_000


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Murmur3 x86 32-bit of ``data`` (seed 0 per the Iceberg spec).
    Returns the SIGNED 32-bit hash, as Java does."""
    h = seed & _M32
    n4 = len(data) // 4
    for i in range(n4):
        (k,) = struct.unpack_from("<I", data, i * 4)
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[n4 * 4 :]
    k = 0
    for i, b in enumerate(tail):
        k |= b << (8 * i)
    if tail:
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def bucket_hash_long(v: int) -> int:
    """The spec's bucket hash for int/long: Murmur3 of the 8-byte
    little-endian value (ints are hashed as longs so the two types
    bucket identically)."""
    return murmur3_32(struct.pack("<q", int(v)))


def bucket_hash_str(s: str) -> int:
    """The spec's bucket hash for strings: Murmur3 of the UTF-8 bytes."""
    return murmur3_32(s.encode("utf-8"))


def _rotl32_arr(x: "np.ndarray", r: int) -> "np.ndarray":
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def bucket_hash_long_vec(vals: "np.ndarray") -> "np.ndarray":
    """Vectorized :func:`bucket_hash_long` over an int64 array; returns
    int32 hashes. Pure uint32 numpy arithmetic (two 4-byte blocks, no
    tail), verified elementwise against the scalar form."""
    v = vals.astype(np.int64).view(np.uint64)
    lo = (v & np.uint64(_M32)).astype(np.uint32)
    hi = (v >> np.uint64(32)).astype(np.uint32)
    with np.errstate(over="ignore"):
        h = np.zeros(len(vals), dtype=np.uint32)
        for k in (lo, hi):
            k = (k * np.uint32(_C1)).astype(np.uint32)
            k = _rotl32_arr(k, 15)
            k = (k * np.uint32(_C2)).astype(np.uint32)
            h ^= k
            h = _rotl32_arr(h, 13)
            h = (h * np.uint32(5) + np.uint32(0xE6546B64)).astype(np.uint32)
        h ^= np.uint32(8)  # length
        h ^= h >> np.uint32(16)
        h = (h * np.uint32(0x85EBCA6B)).astype(np.uint32)
        h ^= h >> np.uint32(13)
        h = (h * np.uint32(0xC2B2AE35)).astype(np.uint32)
        h ^= h >> np.uint32(16)
    return h.view(np.int32)


_TRANSFORM_RE = re.compile(r"^(identity|void|year|month|day|hour)$|^(bucket|truncate)\[(\d+)\]$")


def parse_transform(spec: str) -> tuple[str, int | None]:
    """``"bucket[8]"`` -> ("bucket", 8); ``"day"`` -> ("day", None)."""
    m = _TRANSFORM_RE.match(spec)
    if not m:
        raise ValueError(f"unknown partition transform {spec!r}")
    if m.group(1):
        return m.group(1), None
    return m.group(2), int(m.group(3))


def transform_value(spec: str, value, value_is_micros: bool = True):
    """Apply a transform to ONE source value (planning side: a
    predicate's literal -> the partition value to prune with).
    Temporal transforms take epoch-micros (the spec's timestamp
    representation)."""
    name, arg = parse_transform(spec)
    if name == "identity":
        return value
    if name == "void":
        return None
    if name == "bucket":
        h = (
            bucket_hash_str(value)
            if isinstance(value, str)
            else bucket_hash_long(value)
        )
        return (h & 0x7FFFFFFF) % arg
    if name == "truncate":
        if isinstance(value, str):
            return value[:arg]
        v = int(value)
        return v - (((v % arg) + arg) % arg)
    # temporal: value is epoch-micros (or already a day ordinal)
    micros = int(value)
    if not value_is_micros:
        raise ValueError("temporal transforms take epoch-micros")
    if name == "hour":
        return _floor_div(micros, _MICROS_PER_HOUR)
    days = _floor_div(micros, _MICROS_PER_DAY)
    if name == "day":
        return days
    import datetime as _dt

    d = _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
    if name == "month":
        return (d.year - 1970) * 12 + (d.month - 1)
    if name == "year":
        return d.year - 1970
    raise AssertionError(name)


def _floor_div(a: int, b: int) -> int:
    return a // b  # Python floordiv is floor (negatives included)


def is_order_preserving(spec: str) -> bool:
    """Whether a range predicate on the source column maps to a range
    on the transformed value (spec: every transform except bucket is
    order-preserving; void preserves nothing)."""
    name, _ = parse_transform(spec)
    return name in ("identity", "truncate", "year", "month", "day", "hour")


def transform_column(df, source_col: str, spec: str, name: str):
    """Append the transformed partition column ``name`` to a Spark
    DataFrame. Order-preserving transforms are pure JVM expressions;
    ``bucket`` uses a vectorized Arrow-batched pandas UDF (Spark's
    built-in ``hash()`` is a different Murmur3 layout/seed and would
    not interoperate with external Iceberg writers)."""
    from pyspark.sql import functions as F

    tname, arg = parse_transform(spec)
    col = F.col(source_col)
    if tname == "identity":
        return df.withColumn(name, col)
    if tname == "void":
        # spec: void always produces null — the drop-a-partition-field
        # evolution alias (real Iceberg rewrites a removed field as
        # void rather than renumbering the struct)
        return df.withColumn(name, F.lit(None).cast("int"))
    if tname == "truncate":
        dt = dict(df.dtypes).get(source_col)
        if dt == "string":
            # spec: string truncate is the W-codepoint prefix (substring
            # is codepoint-indexed in Spark, matching Python slicing)
            return df.withColumn(name, F.substring(col, 1, arg))
        if dt not in ("bigint", "int", "smallint", "tinyint"):
            raise NotImplementedError(
                f"truncate partition column over {dt!r} source: "
                "integer and string sources are supported"
            )
        # truncate preserves the source width (a wide long stays long)
        return df.withColumn(
            name, col - (((col % arg) + arg) % arg)
        )
    if tname in ("day", "hour"):
        unit = _MICROS_PER_DAY if tname == "day" else _MICROS_PER_HOUR
        return df.withColumn(
            name, F.floor(col / F.lit(unit)).cast("int")
        )
    if tname in ("month", "year"):
        # DATE arithmetic from the epoch-day ordinal: calendar-pure and
        # timezone-free (F.year/F.month over timestamp_micros would
        # extract in the SESSION timezone and disagree with the UTC
        # scalar transform_value on non-UTC sessions)
        d = F.date_add(
            F.lit("1970-01-01").cast("date"),
            F.floor(col / F.lit(_MICROS_PER_DAY)).cast("int"),
        )
        if tname == "month":
            expr = (F.year(d) - 1970) * 12 + F.month(d) - 1
        else:
            expr = F.year(d) - 1970
        return df.withColumn(name, expr.cast("int"))
    if tname == "bucket":
        from pyspark.sql.functions import pandas_udf

        dt = dict(df.dtypes).get(source_col)
        n = arg
        if dt in ("bigint", "int", "smallint", "tinyint"):

            @pandas_udf("int")
            def _bucket(v: pd.Series) -> pd.Series:
                # spec: bucket(null) = null — mask nulls before the
                # numpy cast (a NaN would cast to a garbage int64 and
                # silently land rows in a wrong bucket)
                mask = v.isna()
                filled = v.fillna(0).to_numpy(dtype=np.int64)
                h = bucket_hash_long_vec(filled)
                out = pd.Series(
                    (h.astype(np.int64) & 0x7FFFFFFF) % n, dtype="Int32"
                )
                out[mask.to_numpy()] = None
                return out

        elif dt == "string":
            # strings hash per-value (variable-length Murmur3 doesn't
            # vectorize cleanly); still Arrow-batched per partition
            @pandas_udf("int")
            def _bucket(v: pd.Series) -> pd.Series:
                return pd.Series(
                    [
                        (bucket_hash_str(s) & 0x7FFFFFFF) % n
                        if s is not None
                        else None
                    for s in v],
                    dtype="Int32",
                )

        else:
            raise NotImplementedError(
                f"bucket partition column over {dt!r} source: integer "
                "and string sources are supported"
            )
        return df.withColumn(name, _bucket(col))
    raise ValueError(f"transform {spec!r} has no partition-column form")


def sort_field_expr(spec: str):
    """The Spark sort Column for one ``sort_by`` entry — direction and
    null-order per :func:`manifests.parse_sort_field`, so the rows
    written land in exactly the order the table's registered sort order
    declares."""
    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.sources.iceberg.manifests import (
        parse_sort_field,
    )

    c, direction, null_order = parse_sort_field(spec)
    col = F.col(c)
    if direction == "asc":
        return (
            col.asc_nulls_first()
            if null_order == "nulls-first"
            else col.asc_nulls_last()
        )
    return (
        col.desc_nulls_first()
        if null_order == "nulls-first"
        else col.desc_nulls_last()
    )


_ZORDER_NUMERIC_DTYPES = (
    "tinyint", "smallint", "int", "bigint", "float", "double",
)


def zorder_surrogate_expr(df, c: str):
    """The numeric JVM surrogate a zorder dimension ranks through —
    an ORDER-PRESERVING map of the source column into a numeric space,
    so dimension bounds aggregate and ranks compute over the SAME
    expression (any tz/encoding subtlety cancels by construction):

    - numeric columns pass through;
    - date -> epoch-day ordinal (datediff — the day-transform plane's
      calendar-pure route, transforms.py epoch-micros family);
    - timestamp / timestamp_ntz -> epoch micros (unix_micros; ntz casts
      through the session timestamp first — monotonic, and consistent
      because bounds and ranks share the expression);
    - string -> first-8-UTF-8-byte magnitude (hex right-padded with '0'
      = bytes right-padded with 0x00, decoded base-16 — Iceberg's
      zorder strings-as-byte-prefix posture), in double (the rank
      needs only the top 16 bits);
    - anything else (arrays, maps, binary, decimals beyond double
      range) raises a typed error NAMING the column — previously a
      temporal/string dimension died in raw Spark analysis arithmetic
      (or, with ANSI off, silently ranked every row 0 and reported a
      successful rewrite that clustered nothing)."""
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    if c not in dtypes:
        raise ValueError(f"zorder column {c!r} is not a table column")
    dt = dtypes[c]
    col = F.col(c)
    if dt in _ZORDER_NUMERIC_DTYPES or dt.startswith("decimal"):
        return col
    if dt == "date":
        return F.datediff(col, F.lit("1970-01-01").cast("date"))
    if dt in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(col.cast("timestamp"))
    if dt == "string":
        return F.conv(
            F.rpad(F.hex(F.substring(F.encode(col, "UTF-8"), 1, 8)), 16, "0"),
            16,
            10,
        ).cast("double")
    raise ValueError(
        f"zorder column {c!r} has type {dt!r}: numeric, date, "
        "timestamp, and string dimensions are supported"
    )


def zorder_column(df, cols: list[str], stats: dict, name: str):
    """Attach a Z-ORDER interleave column (the clustering key of
    Iceberg's ``rewriteDataFiles`` zorder strategy): each source column
    maps through :func:`zorder_surrogate_expr` (numeric pass-through,
    temporal epoch ordinals, string byte-prefix magnitude) and
    normalizes to a 16-bit rank over its surrogate's [min, max] from
    ``stats`` (driver-computed, one bounded agg OVER THE SURROGATES),
    and the ranks' bits interleave round-robin into one long — so
    sorting by it clusters rows that are close in EVERY dimension, and
    file slicing yields tight per-file bounds on ALL the zorder columns
    at once (a linear sort tightens only its leading column). Pure JVM
    expressions (shiftright/and/or unrolled over 16 bits x N columns),
    whole-stage-codegen friendly — no UDF. Up to 4 columns (64-bit key
    budget); nulls rank lowest (0), matching the sort plane's
    nulls-first."""
    from pyspark.sql import functions as F

    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder takes 1-4 columns")
    n = len(cols)
    ranks = []
    for c in cols:
        mn, mx = stats[c]
        span = (mx - mn) or 1
        # rank in DOUBLE, not long: (col - mn) * 65535 would wrap int64
        # for spans past ~1.4e14 (e.g. a multi-year microsecond
        # timestamp), silently randomizing the interleave; a double
        # ratio keeps the 16-bit rank exact to well past 2^53 spans,
        # clamped against the value == max edge rounding to 65536
        ranks.append(
            F.least(
                F.lit(65535),
                F.greatest(
                    F.lit(0),
                    F.coalesce(
                        F.floor(
                            (
                                zorder_surrogate_expr(df, c) - F.lit(mn)
                            ).cast("double")
                            / F.lit(float(span))
                            * 65535.0
                        ),
                        F.lit(0),
                    ),
                ),
            ).cast("long")
        )
    z = F.lit(0).cast("long")
    for i in range(16):
        for j, rk in enumerate(ranks):
            bit = F.shiftright(rk, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return df.withColumn(name, z)
