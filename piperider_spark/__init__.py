"""piperider_spark — a PySpark-native analytics / data-quality engine.

A from-scratch rebuild of the query and data-processing capabilities of
InfuseAI/piperider ("code review for data"), re-expressed Spark-first:

* profiler       — PipeRider's column-profiling metrics as fused single-pass
                   DataFrame aggregations (reference: piperider_cli/profiler/profiler.py)
* rules          — declarative per-turn keep/drop predicates (the reference's
                   assertion surface, vectorized as Column expressions)
* signals        — language-ID + hashed n-gram perplexity as pandas/Arrow UDFs
* scrub          — byte-exact PII / toxicity scrubbing under stable ordering
* pipeline       — the end-to-end transcript quality-filter job with
                   per-partition lineage + metrics and checkpoint/resume
* metrics_engine — dbt-style time-series metrics (date spine + grain aggs,
                   reference: piperider_cli/metrics_engine/metrics.py)
* compare        — run-over-run report drift (reference: compare_report.py)
* extras         — web-scale training-data ops: dedup (exact/minhash/simhash),
                   ANN similarity, multimodal plumbing, text analysis

Everything is built on the public PySpark DataFrame/SQL API; no code is
copied from the reference (it is a SQLAlchemy-to-warehouse compiler, a
different execution model entirely).
"""

__version__ = "0.1.0"

from piperider_spark.session import get_spark  # noqa: F401
