"""Time-series metrics engine: the reference's dbt-metric evaluator rebuilt.

Reference (/root/reference/piperider_cli/metrics_engine/metrics.py):
  * grain truncation + aggregate per period   (metrics.py:183-221)
  * date spine UNION ALL of literal rows      (metrics.py:251-269)
  * spine LEFT OUTER JOIN agg, zero-fill      (metrics.py:214-221)
  * derived metrics: chain-join parents on d, eval expression with
    ``a/b`` → ``a/nullif(b,0)``               (metrics.py:118-148)

Spark-first rendition: the spine is ``sequence()`` + ``explode`` (no N-row
union), broadcast into the join (it is tiny by construction — ≤ a few
hundred periods); the aggregate side shuffles once on the truncated date.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GRAIN_INTERVAL = {
    "day": "interval 1 day",
    "week": "interval 7 day",
    "month": "interval 1 month",
    # reference grain set includes quarter via dialect shims (quarter →
    # 3 month, metrics.py:223-237); Spark date_trunc supports it natively
    "quarter": "interval 3 month",
    "year": "interval 1 year",
}

AGG_FNS = {
    "count": lambda c: F.count(c),
    "count_distinct": lambda c: F.count_distinct(c),
    "sum": lambda c: F.sum(c),
    "average": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}

ADDITIVE = {"count", "count_distinct", "sum"}  # zero-filled after spine join
                                              # (metrics.py:207-213)


def _trunc_date(d: date, grain: str) -> date:
    """Driver-side twin of the engine's date_trunc for spine bounds."""
    if isinstance(d, datetime):
        d = d.date()
    if grain == "day":
        return d
    if grain == "week":
        return d - timedelta(days=d.weekday())
    if grain == "month":
        return d.replace(day=1)
    if grain == "quarter":
        return d.replace(month=((d.month - 1) // 3) * 3 + 1, day=1)
    if grain == "year":
        return d.replace(month=1, day=1)
    raise ValueError(f"unknown grain {grain!r}")


def date_spine(spark: SparkSession, start: date, end: date, grain: str) -> DataFrame:
    """All period starts from start..end inclusive at the given grain."""
    iv = GRAIN_INTERVAL[grain]
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr(iv)
            )
        ).alias("d")
    )


def metric_series(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    calculation: str,
    grain: str = "day",
    start: date | None = None,
    end: date | None = None,
    where: str | None = None,
) -> DataFrame:
    """(d, value) series: aggregate per truncated period, joined onto the
    full date spine so empty periods exist (zero for additive metrics, NULL
    otherwise) — the reference's spine semantics."""
    spark = df.sparkSession
    src = df.where(where) if where else df
    trunc = F.date_trunc(grain, F.col(ts_col)).cast("date")
    agg = (
        src.where(F.col(ts_col).isNotNull())
        .groupBy(trunc.alias("d"))
        .agg(AGG_FNS[calculation](F.col(value_col)).alias("m"))
    )
    if start is None or end is None:
        lo, hi = src.agg(F.min(trunc), F.max(trunc)).collect()[0]
        start = start or lo
        end = end or hi
    if start is None:
        return spark.createDataFrame([], "d date, value double")
    # Bounds must be grain-TRUNCATED: the spine steps whole grains from
    # `start` and the aggregate keys are truncated, so a raw mid-month
    # start would misalign EVERY spine point and the additive zero-fill
    # would silently report an all-zero series (review finding — the old
    # comment stated the requirement but only the derived path met it).
    # Truncate both bounds here, for user-supplied values too.
    start = _trunc_date(start, grain)
    end = _trunc_date(end, grain)
    spine = date_spine(spark, start, end, grain)
    value = F.col("m")
    if calculation in ADDITIVE:
        value = F.coalesce(value, F.lit(0))
    # broadcast the AGGREGATE side (≤ one row per period): the spine is
    # the left join's PRESERVED side, which Spark cannot use as a
    # broadcast build side for LeftOuter — the old broadcast(spine) hint
    # was silently unusable (review finding)
    return (
        spine.join(F.broadcast(agg), "d", "left")
        .select("d", value.cast("double").alias("value"))
        .orderBy("d")
    )


def derived_metric(parents: dict[str, DataFrame], expression: str) -> DataFrame:
    """Evaluate an expression over parent metric series joined on d.

    Divide-by-zero guard: callers write ``a / nullif(b, 0)`` (the reference
    rewrites ``/`` via string surgery, metrics.py:134-139 — here the guard
    is simply part of the expression language).
    """
    names = list(parents)
    joined = None
    for name in names:
        p = parents[name].select("d", F.col("value").alias(name))
        joined = p if joined is None else joined.join(p, "d", "full_outer")
    return joined.select("d", F.expr(expression).alias("value")).orderBy("d")
