"""Run-report assembly + JSON sink.

Mirrors the reference's run.json writer: the report dict validates against
/root/reference/piperider_cli/profiler/schema.json (tables → columns →
metrics), Nones stripped and NaN/Inf stringified exactly like
runner.py:283-306, datasource/metadata decoration like runner.py:331-341,
`latest` symlink like runner.py:256-273.
"""

from __future__ import annotations

import json
import math
import os
import time
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame

from piperider_spark.profiler.core import Profiler, ProfilerConfig


def clean_nulls(value: Any) -> Any:
    """Recursively drop None dict entries and stringify non-finite floats
    (the reference's _clean_nulls + NaN handling, runner.py:283-306).
    Underscore-prefixed keys are in-memory diagnostics (e.g. the profiler's
    ``_distribution_mode`` cardinality-guard marker) — stripped here so
    run.json keeps validating the reference's additionalProperties:false
    schema."""
    if isinstance(value, dict):
        return {
            k: clean_nulls(v)
            for k, v in value.items()
            if v is not None and not (isinstance(k, str) and k.startswith("_"))
        }
    if isinstance(value, list):
        return [clean_nulls(v) for v in value]
    if isinstance(value, float) and not math.isfinite(value):
        return str(value)
    return value


def table_file_metadata(df: DataFrame, now: float | None = None) -> dict:
    """Table metadata metrics (reference profiler.py:420-497: row_count /
    created / last_altered / bytes from warehouse metadata; freshness =
    now − last_altered, profiler.py:494-495). For file-backed DataFrames the
    equivalents come from the scanned files; an Iceberg table would read its
    snapshot summary (committed-at, total-files-size) instead — same shape.
    """
    import time as _time

    try:
        files = [f[len("file:"):] if f.startswith("file:") else f for f in df.inputFiles()]
        stats = [os.stat(f) for f in files if os.path.exists(f)]
    except Exception:
        stats = []
    if not stats:
        return {}
    created = min(s.st_mtime for s in stats)
    altered = max(s.st_mtime for s in stats)
    now = now if now is not None else _time.time()
    return {
        "created": datetime.fromtimestamp(created, tz=timezone.utc).isoformat(),
        "last_altered": datetime.fromtimestamp(altered, tz=timezone.utc).isoformat(),
        "freshness": int(now - altered),  # seconds, like the reference's timedelta
        "bytes": sum(s.st_size for s in stats),
    }


def build_run_report(
    tables: dict[str, DataFrame],
    datasource_name: str = "spark",
    config: ProfilerConfig | None = None,
    created_at: str | None = None,
) -> dict:
    """Profile every table and assemble the reference-shaped report."""
    profiler = Profiler(config)
    created_at = created_at or datetime.now(timezone.utc).isoformat()
    import hashlib

    # NOT python's hash(): it is salted per process (irreproducible) and
    # depends only on created_at (two same-second reports collided) —
    # review finding. md5 over timestamp + table names is stable across
    # processes and distinct for distinct inputs.
    rid = hashlib.md5(
        (created_at + ":" + ",".join(sorted(tables))).encode()
    ).hexdigest()[:10]
    report = {
        "id": f"run-{rid}",
        "created_at": created_at,
        "datasource": {"name": datasource_name, "type": "spark"},
        "tables": {},
    }
    for name, df in tables.items():
        t0 = time.perf_counter()
        tbl = profiler.profile_table(df, name)
        duration = time.perf_counter() - t0
        # self-instrumentation like the reference's per-table timings
        # (profiler.py:555-562, 665-668); the fused design has no
        # per-column statements, so wall time is table-granular
        tbl["profile_duration"] = f"{duration:.2f}"
        tbl["elapsed_milli"] = int(duration * 1000)
        tbl.update(table_file_metadata(df))
        report["tables"][name] = tbl
    return clean_nulls(report)


def write_run_json(report: dict, output_dir: str) -> str:
    """Write run.json under a timestamped dir + refresh the `latest` symlink
    (reference layout: runner.py:256-273, 688-692)."""
    # keep fractional seconds: two same-second runs previously shared a
    # dir and the second json.dump clobbered the first (review finding)
    stamp = (
        report.get("created_at", "run").replace(":", "").replace("+", "Z")[:24].rstrip(".")
    )
    run_dir = os.path.join(output_dir, stamp)
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, "run.json")
    with open(path, "w") as f:
        json.dump(report, f, separators=(",", ":"), default=str)
    latest = os.path.join(output_dir, "latest")
    try:
        if os.path.islink(latest) or os.path.exists(latest):
            os.unlink(latest)
        # the bare stamp, not run_dir: a symlink target resolves relative
        # to the LINK's directory, so a cwd-relative run_dir ('out/<stamp>')
        # produced a dangling out/out/<stamp> link (review finding)
        os.symlink(stamp, latest)
    except OSError:
        pass
    return path
