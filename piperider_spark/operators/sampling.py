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


_HASH_SPACE = 1 << 60  # md5_60bit range


def quota_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    quota: int,
    prefilter_mult: float = 8.0,
) -> DataFrame:
    """At most ``quota`` rows per stratum, chosen by hash order (stable,
    engine-independent) with the id as tiebreak — e.g. balance a corpus to
    n docs per language.

    Skew-safe two-phase plan: a naive rank window ships EVERY row of a
    dominant stratum (90%-English corpora are normal) to one task before
    discarding all but ``quota``. Instead:

      1. per-stratum counts (map-side partial agg, tiny result);
      2. broadcast a hash threshold ≈ ``prefilter_mult × quota/count`` of
         the hash space per stratum — the scan-level filter keeps ~mult×
         quota rows per stratum;
      3. exact rank window over the survivors only;
      4. exactness check: a stratum with fewer than min(quota, count)
         survivors (astronomically unlikely at mult=8, but possible)
         falls back to the unpruned window FOR THAT STRATUM alone.

    The selected rows are identical to the naive plan's — the quota
    smallest hashes are by definition below any threshold that admits
    ≥ quota rows — so the small-scale oracle twin stays one plain window.
    NULL strata sample as their own stratum (the internal join key is
    null-coalesced), matching the window plan's NULL-partition behavior.
    """
    h = md5_60bit(F.col(id_col).cast("string"))
    # non-null internal stratum key: equi-joins drop NULL keys, but NULL
    # strata must sample like any other (the naive window treats NULL as a
    # partition)
    st = F.coalesce(F.col(stratum_col).cast("string"), F.lit("\x00__null__"))
    dfk = df.withColumn("__st", st)
    counts = dfk.groupBy("__st").agg(F.count(F.lit(1)).alias("__n"))
    thr = F.least(
        F.lit(_HASH_SPACE),
        F.ceil(F.lit(float(prefilter_mult * quota * _HASH_SPACE)) / F.col("__n")).cast(
            "long"
        ),
    )
    thr_df = counts.select("__st", thr.alias("__thr"), "__n")
    # persist: the pruned relation is small (~mult×quota rows per stratum)
    # and feeds both the rank window and the survivor counts — without it
    # the base scan + join + hash filter would run twice
    # NULL-id rows hash to NULL, which ascending sort places FIRST — the
    # naive window (and the fallback path) therefore picks them before any
    # hashed row, so the prefilter must admit them too (review finding:
    # `h < thr` is NULL for them and the pruned path silently dropped
    # them, diverging from the fallback inside one function)
    pruned = (
        dfk.join(F.broadcast(thr_df), "__st")
        .where((h < F.col("__thr")) | h.isNull())
        .persist()
    )

    w = Window.partitionBy("__st").orderBy(h, F.col(id_col))
    ranked = pruned.withColumn("__rank", F.row_number().over(w))
    picked = ranked.where(F.col("__rank") <= quota)

    # exactness fallback: strata whose prefilter under-admitted. Start from
    # the counts side — a stratum with ZERO survivors has no row in the
    # survivors aggregate at all and must still be flagged.
    survivors = pruned.groupBy("__st").agg(F.count(F.lit(1)).alias("__s"))
    short = (
        thr_df.select("__st", "__n")
        .join(survivors, "__st", "left")
        .where(
            F.coalesce(F.col("__s"), F.lit(0)) < F.least(F.lit(quota), F.col("__n"))
        )
        .select("__st")
    )
    fallback = (
        dfk.join(F.broadcast(short), "__st")
        .withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= quota)
    )
    keep_cols = df.columns
    # materializing return: one action executes the plan, then the pruned
    # cache is released — a lazy return would leak one persisted relation
    # per call into the session (same defect class as the r2 LSH verdict
    # item). The checkpointed result is ≤ quota × strata rows — tiny.
    out = (
        picked.join(F.broadcast(short), "__st", "left_anti")
        .select(*keep_cols)
        .unionByName(fallback.select(*keep_cols))
        .localCheckpoint(eager=True)
    )
    pruned.unpersist()
    return out


def canonical_by_quality(
    df: DataFrame,
    group_col: str,
    quality_col: Column | str,
    id_col: str,
) -> DataFrame:
    """Keep exactly one row per group: the highest-quality one (ties broken
    by smallest id — deterministic in both engines). The retention policy
    half of exact dedup: group on the fingerprint, keep the best doc.

    Skew-safe: duplicate groups can be enormous (the empty-document
    fingerprint at corpus scale), and a rank window would ship a whole
    group to one task. This plan is all partial-aggregable: max quality per
    group, join back for the tied rows (few), min id among them, then one
    semi-join to recover the full row — every exchange combines map-side,
    no single-task group materialization.
    """
    q = F.col(quality_col) if isinstance(quality_col, str) else quality_col
    # non-null internal group key (equi-joins drop NULL keys; a NULL group
    # must still keep its best row), and null-safe quality equality (a
    # group whose qualities are ALL NULL keeps its smallest id — matching
    # the rank-window semantics with NULLS LAST ordering). Requires id to
    # be unique within a group (true for document/row ids).
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00__null__"))
    qd = df.withColumn("__q", q).withColumn("__g", g)
    best_q = qd.groupBy("__g").agg(F.max("__q").alias("__bq"))
    tied = qd.join(best_q, "__g").where(F.col("__q").eqNullSafe(F.col("__bq")))
    best_id = tied.groupBy("__g").agg(F.min(id_col).alias("__bid"))
    return (
        qd.join(best_id, "__g")
        .where(F.col(id_col) == F.col("__bid"))
        .select(*df.columns)
    )
