"""Skew mitigation for large-large joins: deterministic key salting.

When one join key dominates (the Zipf head — a boilerplate fingerprint, a
bot user_id), hash partitioning sends ALL of that key's rows to one task.
AQE's skew-join splitting handles this transparently for sort-merge joins
(enabled in session.py) — salting is the explicit fallback for the cases
AQE can't fix: joins that must be shuffle-hash, aggregation-like
self-joins, or engines/paths where AQE is off.

The construction: the skewed (big) side gets a per-ROW salt derived from a
row-distinguishing column (deterministic — re-computation under task retry
yields the same salt, unlike ``rand()``); the other side is replicated
``salt_n`` times with every salt value; the join key becomes
``(key, salt)``, spreading each hot key over ``salt_n`` tasks. Output rows
are identical to the unsalted join (verified in tests) at the cost of
replicating the smaller side ``salt_n``×.

Reference analogue: none — PipeRider's warehouse handles physical joins.
This is the §2.11 skew toolkit next to AQE and the pipeline's bucket
salting (``pmod(xxhash64(conv_id), n_buckets)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    row_col: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (big, hot-keyed; salted per row via ``row_col``)
    with ``other`` (replicated ``salt_n``×) on ``key`` — every hot key
    spreads over ``salt_n`` tasks. Columns of both inputs are preserved
    (the internal salt column is dropped).

    Only join types that never emit unmatched RIGHT-side rows are valid:
    the replicated side would surface ``salt_n`` null-padded copies of
    each unmatched row under right/full outer semantics.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "cross"}
    if how.replace("_", "").lower() not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only: the replicated "
            f"side would duplicate unmatched rows under {how!r}"
        )
    salt = F.pmod(F.xxhash64(F.col(row_col)), F.lit(salt_n))
    left = skewed.withColumn("__salt", salt.cast("int"))
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return left.join(right, [key, "__salt"], how).drop("__salt")
