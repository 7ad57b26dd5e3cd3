"""Exact multi-quantile percentile_disc in one pass, fully distributed.

Spark's builtin ``percentile_disc`` buffers every value once PER CALL — five
quantiles over a column cost five full materializations of the column in
aggregation buffers (measured ~9 s for 600k rows × 5). This operator gets
all of them from one value-counts shuffle:

  groupBy(value).count()            — shuffle sized by #distinct values
  order-monotone domain bucketing   — uniform bins over the column's
                                      [min, max] (the packing trick,
                                      operators/packing.py: two-phase cumsum)
  per-bucket window cumsum          — parallel across buckets, NO
                                      single-partition global window
  broadcast bucket offsets          — ≤ n_buckets rows collected driver-side
                                      (the reference's own two-phase min/max
                                      pattern, profiler.py)
  quantile p = min value with global cum ≥ ceil(p·n)   — percentile_disc

Semantics are identical to ``percentile_disc(p) WITHIN GROUP (ORDER BY c)``
(the reference's default quantile branch, profiler.py:1184-1186) and to
DuckDB's — the correctness gate compares against DuckDB directly.

Exactness does not depend on bucket balance: any ORDER-MONOTONE bucket
function satisfies cum(v) = offset(bucket(v)) + local_cum(v), and uniform
bins over [min, max] are monotone (NaN → its own top bucket, matching NaN's
sort-last order). Skewed value distributions only unbalance bucket sizes,
never results; worst case degrades toward the old single-window plan.

Scale note: the per-bucket cumsum stage now parallelizes over n_buckets
tasks (default 256), so a 10^9-distinct-value column is ~4M values per
task instead of 10^9 in one. For 10^12-row mostly-unique columns the
profiler's HLL cardinality guard still auto-routes to percentile_approx
(the same exact→sketch trade the reference's redshift/athena branches
make, profiler.py:1163-1173).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _disc_rank(p: float, n: int) -> int:
    """Smallest 1-based rank r with ``r/n >= p`` under IEEE double
    division — the exact ``percentile_disc`` / ``cume_dist`` selection
    rule. ``ceil(p*n)`` is only an estimate (float products round both
    ways); the fix-up loops move at most a step or two."""
    r = max(int(math.ceil(p * n)), 1)
    while r > 1 and (r - 1) / n >= p:
        r -= 1
    while r < n and r / n < p:
        r += 1
    return r


def percentile_disc_multi(
    df: DataFrame,
    col: str,
    ps: tuple[float, ...],
    aliases: tuple[str, ...] | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """One-row DataFrame with one column per requested quantile.

    EAGER-MATERIALIZING: constructing the returned DataFrame runs Spark
    jobs immediately (a ``localCheckpoint`` of the value-counts shuffle,
    a bounds ``first()`` and a bucket-totals ``collect()`` — all bounded
    by ``n_buckets``, not data size), the same contract as
    ``dedup.minhash_lsh_pairs``. Plan-only consumers (plan dumps,
    ``explain`` tooling) pay the value-counts shuffle; checkpointed
    blocks are executor-resident and not recomputable after executor
    loss — a production job that needs fault-tolerant lineage should
    checkpoint to reliable storage instead."""
    # round, not int-truncate: int(0.29*100) == 28 (review finding — a
    # mislabeled column, and (0.28, 0.29) would produce two 'p28's)
    aliases = aliases or tuple(f"p{round(p * 100)}" for p in ps)
    vc = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # The distinct-value set is consumed by THREE actions below (domain
    # bounds, bucket totals, final quantile agg) — materialize the one
    # value-counts shuffle eagerly (the dedup.py localCheckpoint idiom;
    # blocks are executor-resident and ContextCleaner-managed) instead of
    # re-executing it per action.
    vc = vc.localCheckpoint(eager=True)

    # Domain bounds from the (much smaller) distinct set. Min/max ignore
    # NaN via the isnan guard — NaN must land in the top bucket, not
    # poison the bounds. Bounds only need to be FINITE and ordered for the
    # bucket function to stay order-monotone (out-of-range values clamp to
    # the edge buckets), so deriving them from the checkpointed vc is
    # exact by construction.
    dtype = dict(df.dtypes).get(col, "")
    is_float = dtype in ("float", "double")
    vcol = F.col("v")
    finite = ~F.isnan(vcol) if is_float else F.lit(True)
    row = vc.agg(
        F.min(F.when(finite, vcol)).alias("mn"),
        F.max(F.when(finite, vcol)).alias("mx"),
    ).first()
    mn, mx = row["mn"], row["mx"]

    numeric = isinstance(mn, (int, float)) and not isinstance(mn, bool)
    degenerate = (
        mn is None
        or not numeric
        or mn == mx
        or (isinstance(mn, float) and not (math.isfinite(mn) and math.isfinite(mx)))
    )
    if degenerate:
        # ≤1 finite distinct value / non-numeric orderable / infinite bounds:
        # the single-window path is exact and the distinct set is tiny (or
        # the type can't be binned arithmetically) — keep it as the fallback.
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wn = Window.partitionBy()
        cum = vc.select(
            "v",
            F.sum("cnt").over(w).alias("cum"),
            F.sum("cnt").over(wn).alias("n"),
        )
        # compare cume_dist DIRECTLY (cum/n as double >= p) — the
        # definitional percentile_disc rule. The previous ceil(p*n) rank
        # diverges for non-canonical p under float rounding (review
        # finding: 0.07*100 = 7.000000000000001 → rank 8, while
        # percentile_disc returns the 7th value).
        aggs = [
            F.min(
                F.when(
                    (F.col("cum").cast("double") / F.col("n")) >= F.lit(float(p)),
                    F.col("v"),
                )
            ).alias(a)
            for p, a in zip(ps, aliases)
        ]
        return cum.agg(*aggs)

    width = (float(mx) - float(mn)) / n_buckets
    b = F.floor((F.col("v").cast("double") - F.lit(float(mn))) / F.lit(width))
    b = F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), b)).cast("int")
    if is_float:
        b = F.when(F.isnan(F.col("v")), F.lit(n_buckets)).otherwise(b)
    bucketed = vc.select("v", "cnt", b.alias("b"))

    # Bucket totals: a partial-aggregable groupBy over ≤ n_buckets+1 groups,
    # collected driver-side (bounded by construction) → exclusive prefix
    # offsets broadcast back as a literal map.
    totals = {
        r["b"]: r["t"]
        for r in bucketed.groupBy("b").agg(F.sum("cnt").alias("t")).collect()
    }
    n_total = sum(totals.values())
    offsets: dict[int, int] = {}
    acc = 0
    for k in sorted(totals):
        offsets[k] = acc
        acc += totals[k]
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )

    # Per-bucket cumsum: the window is PARTITIONED (by bucket) — parallel
    # across buckets, no single-task global-order stage.
    wb = Window.partitionBy("b").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bucketed.select(
        "v",
        (F.sum("cnt").over(wb) + offset_map[F.col("b")]).alias("cum"),
    )
    # exact percentile_disc rank: smallest r with fl(r/n) >= p under IEEE
    # double division (python floats and JVM doubles share IEEE-754, so
    # this driver-side loop reproduces the engine comparison bit-for-bit);
    # ceil(p*n) alone is off by one for non-canonical p (review finding)
    aggs = [
        F.min(
            F.when(F.col("cum") >= F.lit(_disc_rank(p, n_total)), F.col("v"))
        ).alias(a)
        for p, a in zip(ps, aliases)
    ]
    return cum.agg(*aggs)
