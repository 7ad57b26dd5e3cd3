"""Sequence packing: concat-then-chunk assignment for pretraining data.

The standard pretraining pack: lay every document's tokens end-to-end in a
deterministic global order, then slice the stream into fixed ``max_len``
context windows. Each document gets its global ``start_offset`` and the
chunk range it lands in (documents may straddle a boundary — that IS the
concat-then-chunk semantics).

Spark-first scalable design — the naive form is a GLOBAL cumulative sum,
i.e. a single-partition window that cannot scale. Here it is two-phase:

  1. deterministic bucketing (portable md5 of the id) defines the global
     order ``(bucket, id)``;
  2. per-bucket cumsum — a parallel window per bucket (shuffle on bucket);
  3. bucket totals (tiny: n_buckets rows) → driver prefix-sum → broadcast
     join of per-bucket offsets.

The same two-phase trick the reference uses for histograms (stats first,
then bucketed pass — profiler.py:1030-1032) applied to prefix sums; at
10^12 docs each bucket's window is ~1/n_buckets of the data and the only
driver-side state is n_buckets numbers.

The DuckDB oracle computes the identical assignment with one global window
ordered by (bucket, id) — small-scale exact twin of the distributed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from piperider_spark.operators.sampling import sample_hash


def concat_chunk_pack(
    df: DataFrame,
    id_col: str,
    len_col: str,
    max_len: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every row a global token ``start_offset`` and its chunk range
    under concat-then-chunk packing at ``max_len``.

    Returns (id, len, start_offset, first_chunk, last_chunk, n_chunks).
    Rows with len <= 0 are excluded (they occupy no tokens).
    """
    if max_len <= 0:
        raise ValueError(f"max_len must be positive, got {max_len}")
    idc = F.col(id_col)
    ln = F.col(len_col).cast("long")
    # persist: the totals action and the final windowed plan both consume
    # `bucketed`; without it the input scans twice AND a nondeterministic
    # upstream (sample/limit/AQE re-plan) could make the offsets disagree
    # with the rows the window sums — silently breaking the tiling
    # invariant. The persisted projection is (id, len, bucket) — tiny.
    bucketed = (
        df.where(ln > 0)
        .select(
            idc.alias("id"),
            ln.alias("len"),
            sample_hash(idc, n_buckets).alias("__b"),
        )
        .persist()
    )

    # phase 1+2: per-bucket inclusive cumsum (parallel window per bucket).
    # ROWS frame, not the default RANGE: RANGE treats duplicate ids as
    # peers sharing one cumulative end, which overlaps their spans and
    # breaks the disjoint-tiling invariant (review finding); with ROWS,
    # duplicate ids tile disjointly (their mutual order is arbitrary but
    # the offsets stay exact)
    w = (
        Window.partitionBy("__b")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("__cend", F.sum("len").over(w))

    # phase 3: bucket totals → driver prefix sums → broadcast offsets.
    # n_buckets rows on the driver — the same legitimate two-phase pattern
    # as the reference's histogram min/max pass.
    totals = {
        r["__b"]: r["t"]
        for r in bucketed.groupBy("__b").agg(F.sum("len").alias("t")).collect()
    }
    offsets, acc = [], 0
    for b in range(n_buckets):
        offsets.append((b, acc))
        acc += totals.get(b, 0)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "__b int, __off long")

    # chunk math in INTEGER division (`div`) — `/` is IEEE double division,
    # which misassigns chunks once global offsets approach 2^53 (reachable
    # at the documented 10^12-doc scale)
    end = F.col("__off") + F.col("__cend")
    start = end - F.col("len")
    with_offsets = local.join(F.broadcast(off_df), "__b").select(
        "id", "len", start.alias("start_offset"), (end - 1).alias("__last_tok")
    )
    first = F.expr(f"start_offset div {int(max_len)}")
    last = F.expr(f"__last_tok div {int(max_len)}")
    # materializing return: the checkpoint executes the windowed plan while
    # `bucketed` is still cached (keeping offsets and window sums reading
    # the SAME rows — the determinism guarantee the persist exists for),
    # then releases that cache. Storage is a wash: the checkpointed result
    # is the same narrow one-row-per-doc shape as the projection it
    # replaces, and a lazy return would leak the persisted frame.
    out = with_offsets.select(
        "id",
        "len",
        "start_offset",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
    ).localCheckpoint(eager=True)
    bucketed.unpersist()
    return out
