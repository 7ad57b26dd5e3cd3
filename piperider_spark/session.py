"""SparkSession factory.

The reference keeps one cached SQLAlchemy engine per database
(/root/reference/piperider_cli/datasource/__init__.py:92-104); here the
equivalent is one SparkSession per process, configured for the execution
profile this engine targets:

* AQE on (skew-join splitting + partition coalescing at runtime),
* Arrow on (all Python crossings are vectorized pandas/Arrow UDFs),
* shuffle partitions sized to the local core count (on a real cluster this
  is set to ~2-3x total executor cores via spark-submit conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "piperider_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cores`` may be an int (→ ``local[n]``) or a full master string. When a
    session already exists it is returned as-is (Spark's singleton model);
    callers that need a specific parallelism (the bench harness) must stop
    the existing session first.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # int / digit-string → local[n]; anything else is a FULL master URL
    # passed through verbatim (the old startswith("local") test mangled
    # "spark://host:7077" into local[spark://host:7077] — review finding)
    cs = str(cores)
    master = f"local[{cs}]" if cs.isdigit() or cs == "*" else cs
    if shuffle_partitions is None:
        inner = master[len("local[") : -1] if master.startswith("local[") else ""
        n = int(inner) if inner.isdigit() else (os.cpu_count() or 8)
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # post-shuffle stages here run pandas UDFs whose per-byte cost is
        # ~100× a columnar scan's; the 64 MB default advisory size lets AQE
        # coalesce the UDF stage below core count (measured 1.5× slower).
        # 8 MB keeps UDF parallelism at cluster width while still merging
        # genuinely tiny partitions.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing: 5k rows (~1.5 MB of text) keeps each UDF
        # batch's blob + numpy temporaries inside the worker's L3 share —
        # measured 2-3× faster under full-machine concurrency than 50k-row
        # batches on this memory-bandwidth-limited host
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "5000")
        .config("spark.sql.session.timeZone", "UTC")
        # NB: keep the local heap moderate — JVM heaps >~12g measurably stall
        # the first big collection in this sandbox (first-touch page zeroing);
        # on a real cluster executor memory is set via spark-submit.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # InferFiltersFromGenerate adds size(e)>0 AND isnotnull(e) before
        # every Generate, and predicate pushdown then inlines the
        # generator input's WHOLE expression tree below the projections
        # that staged it — for explodes over computed arrays (k-token
        # window hashes, shingles, minhash bands) the pushed copies
        # re-evaluate the array build 2-3× per row, and re-inline the
        # tokenizer PER WINDOW in the substring family (measured 4.4× on
        # duplicate_substring_stats: 9.8 s → 2.3 s at sf0.1). The rule
        # only pays when generate inputs are often empty AND cheap —
        # never this engine's shape; generators skip null/empty rows
        # natively, so excluding it is semantics-free.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    # Shuffle/spill scratch on tmpfs when available: this box's single
    # shared disk is a non-scaling resource that a real cluster doesn't
    # have (each executor node brings its own local disks), so routing
    # shuffle files through RAM — identically at every parallelism level —
    # removes a measurement artifact rather than adding an advantage. On a
    # real deployment spark.local.dir is set per-node by the cluster
    # manager and this default is irrelevant.
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        builder = builder.config(
            "spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def iceberg_conf(catalog: str = "ice", warehouse: str = "/tmp/iceberg-warehouse") -> dict[str, str]:
    """Session conf for an Iceberg hadoop catalog — pass as ``extra_conf``
    on a cluster with iceberg-spark-runtime on the classpath.

    This sandbox ships no Iceberg jar (verified: catalog plugin class not
    found), so the repo's tests/benches run on parquet; the pipeline's
    checkpoint/resume model (per-bucket lineage rows, anti-join on restart —
    pipeline.py) is the same mechanism that rides Iceberg snapshot ids in a
    real deployment, and the report sink maps to an Iceberg `metrics` table
    (SURVEY.md §2.1).
    """
    return {
        "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def plan_width(df) -> int:
    """Estimated scan parallelism WITHOUT touching ``df.rdd`` (which forces
    a full analysis + RDD conversion of the plan per call). File sources:
    the file count is the lower bound on scan tasks (small files never merge
    below one task per file; large files only split *finer*, so
    under-estimating width at most triggers a harmless repartition of an
    already-parallel scan — and at 100 TB there are thousands of files, so
    the callers' re-split guards are no-ops). Non-file plans (in-memory,
    post-shuffle): assume cluster parallelism."""
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - defensive for exotic sources
        files = []
    return len(files) if files else df.sparkSession.sparkContext.defaultParallelism


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
