"""Exact multi-quantile percentile_disc in one pass.

Spark's builtin ``percentile_disc`` buffers every value once PER CALL — five
quantiles over a column cost five full materializations of the column in
aggregation buffers (measured ~9 s for 600k rows × 5). This operator gets
all of them from one value-counts shuffle:

  groupBy(value).count()                 — shuffle sized by #distinct values
  window cumsum over sorted values       — one single-partition pass
  quantile p = min value with cum ≥ ceil(p·n)   — percentile_disc definition

Semantics are identical to ``percentile_disc(p) WITHIN GROUP (ORDER BY c)``
(the reference's default quantile branch, profiler.py:1184-1186) and to
DuckDB's — the correctness gate compares against DuckDB directly.

Scale note: the cumsum stage is a single task over the distinct values. For
~10^6 distinct values that is milliseconds; for a 10^12-row column of
mostly-unique doubles it degenerates — there the profiler's ``approx``
config flag (percentile_approx) is the documented path, same as the
reference's approx branches on redshift/athena (profiler.py:1163-1173).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def percentile_disc_multi(
    df: DataFrame, col: str, ps: tuple[float, ...], aliases: tuple[str, ...] | None = None
) -> DataFrame:
    """One-row DataFrame with one column per requested quantile."""
    aliases = aliases or tuple(f"p{int(p * 100)}" for p in ps)
    vc = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = Window.partitionBy()
    cum = vc.select(
        "v",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    aggs = [
        F.min(F.when(F.col("cum") >= F.ceil(F.lit(p) * F.col("n")), F.col("v"))).alias(a)
        for p, a in zip(ps, aliases)
    ]
    return cum.agg(*aggs)
