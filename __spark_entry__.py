"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship transcript-style quality-filter plan over the
sf0.001 documents table; ``queries``/``oracle_sql`` expose the operator
surface from SURVEY.md §2 plus the training-data ops (dedup families,
similarity search, text analysis), each paired with DuckDB-runnable ANSI
SQL where the op is SQL-expressible (see piperider_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piperider_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full quality-filter pipeline (langid + perplexity
    pandas UDFs → heuristic rules → keep/drop + reasons → scrub) over the
    sf0.001 documents table viewed as single-turn transcripts."""
    from piperider_spark.pipeline import build_decisions

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    transcripts = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    decided = build_decisions(transcripts)
    return decided.select(
        "conv_id", "turn_idx", "keep", "reasons", "lang", "ppl", "text_scrubbed"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
