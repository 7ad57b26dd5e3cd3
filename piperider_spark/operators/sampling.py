"""Deterministic sampling / retention operators for corpus curation.

Training-data pipelines need *reproducible* samples — `df.sample()` depends
on partition layout and seed plumbing, so two runs (or two engines) disagree.
Everything here keys off the portable 60-bit md5 hash of a stable id
(functions.text.md5_60bit), making every sample a pure function of the data:
re-runs, resumes, and the DuckDB oracle all select the identical rows.

Reference analogue: PipeRider's row-limit sampling is the only sampling it
has (profiler.py:720-731, `LIMIT n` — nondeterministic under parallel scan).
These operators are the corpus-scale extension: rate sampling (keep p% of
docs), quota sampling (at most n per stratum, e.g. per language), and
quality-canonical retention (keep the best doc of each duplicate group).

Scale notes:
* rate sampling is a pure filter — codegen'd, no shuffle, prunes nothing but
  costs nothing;
* quota sampling is one window shuffle on the stratum key (bounded output:
  ≤ quota rows per stratum leave every partition after the rank filter);
* canonical retention is one window shuffle on the group key — same class
  as exact dedup, with the ranking pushed into the same exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from piperider_spark.functions.text import md5_60bit


def sample_hash(id_col: Column | str, buckets: int = 100) -> Column:
    """Stable per-row sample bucket in [0, buckets): portable md5 of the id
    string — identical in DuckDB as
    ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT % buckets``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(md5_60bit(c.cast("string")), F.lit(buckets))


def deterministic_sample(
    df: DataFrame, id_col: str, pct: int, buckets: int = 100
) -> DataFrame:
    """Keep rows whose hash bucket < pct — a reproducible ~pct% sample that
    is stable across runs, partitionings, and engines."""
    return df.where(sample_hash(id_col, buckets) < pct)


def quota_sample(
    df: DataFrame, stratum_col: str, id_col: str, quota: int
) -> DataFrame:
    """At most ``quota`` rows per stratum, chosen by hash order (stable,
    engine-independent) with the id as tiebreak — e.g. balance a corpus to
    n docs per language."""
    w = Window.partitionBy(stratum_col).orderBy(
        md5_60bit(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= quota)
        .drop("__rank")
    )


def canonical_by_quality(
    df: DataFrame,
    group_col: str,
    quality_col: Column | str,
    id_col: str,
) -> DataFrame:
    """Keep exactly one row per group: the highest-quality one (ties broken
    by smallest id — deterministic in both engines). The retention policy
    half of exact dedup: group on the fingerprint, keep the best doc."""
    q = F.col(quality_col) if isinstance(quality_col, str) else quality_col
    w = Window.partitionBy(group_col).orderBy(q.desc(), F.col(id_col).asc())
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") == 1)
        .drop("__rank")
    )
