"""Bucketed tables: co-located joins and aggregations without a shuffle.

The 100 TB join strategy ladder (SURVEY §2.3 / task brief):

  1. broadcast — dimension-sized side (queries.py star joins);
  2. AQE shuffle-hash / skew-split — one-off large joins;
  3. **bucketed co-location (this module)** — RECURRING joins/aggregations
     on the same key: pay the shuffle once at write time (``bucketBy`` on
     the join key), then every subsequent join or groupBy on that key is
     exchange-free — both sides' bucket files are hash-aligned and Spark
     plans SortMergeJoin with zero Exchange.

Spark's ``bucketBy`` requires a managed table (``saveAsTable`` — bucket
metadata lives in the catalog); the session's warehouse dir defaults under
``spark.sql.warehouse.dir``. An Iceberg deployment uses a
``bucket(n, key)`` partition transform for the same effect with hidden
partitioning.

Reference analogue: none — PipeRider delegates physical layout to the
warehouse. This is the Spark-native answer to the reference's recurring
per-table profiling workload shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 16
) -> None:
    """Materialize ``df`` as a managed parquet table bucketed (and sorted)
    by ``bucket_col`` — the one-time shuffle that buys exchange-free joins
    and aggregations on that key forever after."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts Spark aligns bucket files 1:1 — the plan contains NO
    Exchange (verified in tests)."""
    return spark.table(left_table).join(spark.table(right_table), key)
