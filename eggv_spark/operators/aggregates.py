"""Grouped, multi-level, and analytic-window aggregation operators.

SURVEY §2.8: the reference has NO group-by aggregation, grouping
sets, or window functions — all its aggregation is deduplication.
These are first-class capabilities of the new engine, built on
Spark's native HashAggregate / WindowExec so every one gets map-side
partial aggregation and whole-stage codegen.

Scale notes
-----------
* rollup/cube expand each input row into one row per grouping set
  BEFORE the shuffle (Expand operator) — a cube over d dimensions
  multiplies shuffle volume by 2^d; keep d small or pre-aggregate on
  the full key first.
* analytic windows shuffle once on the partition key; a pathological
  hot key serializes into one task — salt or pre-aggregate if a key
  exceeds executor memory.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _agg_exprs(aggs: Mapping[str, Column]) -> list[Column]:
    return [expr.alias(name) for name, expr in aggs.items()]


def grouped_agg(
    df: DataFrame, keys: Sequence[str], aggs: Mapping[str, Column]
) -> DataFrame:
    """Plain GROUP BY: one shuffle, partial aggregation map-side."""
    return df.groupBy(*keys).agg(*_agg_exprs(aggs))


def rollup_agg(
    df: DataFrame, keys: Sequence[str], aggs: Mapping[str, Column]
) -> DataFrame:
    """ROLLUP: hierarchical subtotals (k, k-1, ..., grand total).
    ``grouping_id`` distinguishes subtotal rows from data rows whose
    key column is genuinely null."""
    return (
        df.rollup(*keys)
        .agg(*_agg_exprs(aggs), F.grouping_id().alias("grouping_level"))
    )


def cube_agg(
    df: DataFrame, keys: Sequence[str], aggs: Mapping[str, Column]
) -> DataFrame:
    """CUBE: every subset of ``keys`` (2^k grouping sets)."""
    return (
        df.cube(*keys)
        .agg(*_agg_exprs(aggs), F.grouping_id().alias("grouping_level"))
    )


def grouping_sets_agg(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    keys: Sequence[str],
    aggs: Mapping[str, Column],
) -> DataFrame:
    """Explicit GROUPING SETS — only the named subsets, no 2^k blowup."""
    return (
        df.groupingSets([list(s) for s in sets], *[F.col(k) for k in keys])
        .agg(*_agg_exprs(aggs), F.grouping_id().alias("grouping_level"))
    )


def with_lag_lead(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    lag_name: str = "prev_value",
    lead_name: str = "next_value",
) -> DataFrame:
    """LAG/LEAD over a keyed, explicitly-ordered window (order must
    include a unique tiebreak for determinism)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumns(
        {lag_name: F.lag(col).over(w), lead_name: F.lead(col).over(w)}
    )


def with_running_sum(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    out: str = "running_sum",
) -> DataFrame:
    """Running total per key — ROWS UNBOUNDED PRECEDING..CURRENT ROW
    (ROWS, not RANGE, so tied order keys still accumulate row by
    row — deterministic given a unique tiebreak in ``order_by``)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(col).over(w))


def with_moving_avg(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    preceding: int = 2,
    out: str = "moving_avg",
) -> DataFrame:
    """Moving average over the current row and ``preceding`` prior
    rows (ROWS frame)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-preceding, Window.currentRow)
    )
    return df.withColumn(out, F.avg(col).over(w))


def pivot_counts(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
) -> DataFrame:
    """Pivot: one column per ``pivot_values`` entry with the group's
    row count (0 when absent, matching SQL conditional counts).

    ``pivot_values`` is REQUIRED: without it Spark runs an extra
    distinct-values job over the full table before planning — never
    acceptable on 100 TB inputs.
    """
    out = df.groupBy(*keys).pivot(pivot_col, list(pivot_values)).count()
    return out.na.fill({v: 0 for v in pivot_values})


def gini_by_group(
    df: DataFrame, keys: Sequence[str], col: str, out: str = "gini"
) -> DataFrame:
    """Gini coefficient per group via an Arrow-batched Pandas UDAF —
    the custom-aggregate extension point for statistics the built-in
    aggregates can't express.

    UDAF mechanics: each group's values arrive as ONE pandas Series
    (Arrow transfer, no per-row Python); the shuffle is the same
    hash-partition a built-in aggregate uses, but partial (map-side)
    aggregation is NOT possible for arbitrary UDAFs — at 100 TB
    prefer a sort-based SQL formulation when one exists (the oracle
    for this operator is exactly that formulation).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _gini(v: pd.Series) -> float:
        import numpy as np

        x = np.sort(v.to_numpy(dtype="float64"))
        n = len(x)
        total = x.sum()
        if n == 0 or total == 0:
            return 0.0
        i = np.arange(1, n + 1)
        return float(2.0 * (i * x).sum() / (n * total) - (n + 1.0) / n)

    return df.groupBy(*keys).agg(F.round(_gini(F.col(col)), 4).alias(out))


def distinct_counts(
    df: DataFrame, keys: Sequence[str], col: str
) -> DataFrame:
    """Exact COUNT(DISTINCT) per key (expands to a two-phase
    aggregate) plus approx_count_distinct (HyperLogLog++, one pass,
    mergeable sketch — the 100 TB path when ±2% is acceptable)."""
    return df.groupBy(*keys).agg(
        F.count_distinct(F.col(col)).alias("n_distinct"),
        F.approx_count_distinct(F.col(col)).alias("n_distinct_approx"),
    )
