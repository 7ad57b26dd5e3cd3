"""Spark-side scrub: vectorized pandas UDF over Arrow batches.

Regexes are compiled once at module import (per executor python worker, not
per batch — BASELINE.json input_hint mandates no per-row Python). The UDF is
order-independent row-wise (each row scrubbed independently), so Arrow batch
boundaries and partition layout cannot change bytes; stable
(conv_id, turn_idx) ordering matters only for *emitting* results, handled by
the pipeline's final sort / write layout, not here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from piperider_spark.scrub.rules import scrub_series


@pandas_udf(StringType())
def scrub_udf(texts: pd.Series) -> pd.Series:
    # one blob-pass per rule over the whole Arrow batch (scrub/rules.py);
    # same frozen rule order as the serial spec, byte-identical output.
    return scrub_series(texts)


def scrub_col(text: Column | str) -> Column:
    return scrub_udf(F.col(text) if isinstance(text, str) else text)


def with_scrubbed_text(df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed") -> DataFrame:
    return df.withColumn(out_col, scrub_col(text_col))
