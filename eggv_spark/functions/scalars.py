"""Scalar function families: date/time, higher-order array math, and
semi-structured attr-map parsing.

The reference's only scalar functions are the string/regex family of
SURVEY §2.2; these extend the engine to the families a general
analytics workload needs (§2.8 "absent categories").  Everything is
a pure Column expression — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---- date/time ------------------------------------------------------------

def date_parts(col: Column | str) -> dict[str, Column]:
    """Standard calendar decomposition of a date/timestamp column."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "year": F.year(c),
        "month": F.month(c),
        "day": F.dayofmonth(c),
        "dow": F.dayofweek(c),  # 1=Sunday .. 7=Saturday (ANSI)
        "week": F.weekofyear(c),
        "quarter": F.quarter(c),
    }


def days_between(end: Column | str, start: Column | str) -> Column:
    """Whole-day difference (end - start)."""
    return F.datediff(end, start)


# ---- attr-map parsing -----------------------------------------------------

def attr_to_map(col: Column | str, pair_sep: str = ";", kv_sep: str = "=") -> Column:
    """Parse a ``k1=v1;k2=v2`` attribute string into a map<string,string>.

    The *structured* alternative to the reference's per-field regex
    extraction from GVF/GTF ``attr`` columns
    (``eggv/process.py:125-158`` runs one regex per field over the
    same string): parse once, then ``element_at`` per field.
    ``element_at`` returns NULL for missing keys — the same
    pandas-compatible null semantics as
    :func:`eggv_spark.functions.extract.regexp_extract_null`.
    """
    return F.str_to_map(col, F.lit(pair_sep), F.lit(kv_sep))


def attr_field(col: Column | str, key: str, **kwargs: str) -> Column:
    """One field out of an attr string (NULL when absent)."""
    return F.element_at(attr_to_map(col, **kwargs), key)


# ---- higher-order array math ---------------------------------------------

def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float arrays via zip_with + aggregate —
    executes inside codegen, no data leaves the JVM."""
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def array_stats(a: Column | str) -> dict[str, Column]:
    """Per-row array statistics with higher-order functions."""
    c = F.col(a) if isinstance(a, str) else a
    n = F.size(c)
    total = F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x)
    return {
        "n_dims": n,
        "vec_sum": total,
        "vec_mean": total / n,
        "vec_min": F.array_min(c),
        "vec_max": F.array_max(c),
        "n_positive": F.size(F.filter(c, lambda x: x > 0)),
    }
