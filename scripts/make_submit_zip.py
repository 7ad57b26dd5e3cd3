"""Build the --py-files archive for spark-submit deployment.

Usage:
    python scripts/make_submit_zip.py [out.zip]
    spark-submit --py-files dist/piperider_spark.zip \
        --master <cluster> \
        -c spark.sql.adaptive.advisoryPartitionSizeInBytes=8m \
        -c spark.sql.execution.arrow.maxRecordsPerBatch=5000 \
        submit_job.py --input <iceberg-or-parquet> --output <dir>

The package is pure Python (no compiled extensions), so one zip serves any
executor. `piperider_spark/pipeline.py:main` is the job entry.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build(out: str | None = None) -> str:
    out_path = Path(out) if out else REPO / "dist" / "piperider_spark.zip"
    out_path.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "piperider_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return str(out_path)


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
