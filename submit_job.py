"""spark-submit entry point for the transcript quality-filter pipeline.

    spark-submit --py-files dist/piperider_spark.zip submit_job.py \
        --input  <transcripts parquet/Iceberg path> \
        --output <output dir>  [--buckets 16] [--no-resume]

Delegates to piperider_spark.pipeline.main (bucketed waves, per-wave
lineage rows, resume by anti-joining finished buckets).
"""

from piperider_spark.pipeline import main

if __name__ == "__main__":
    main()
