"""dbt-artifact source: profile subjects + test ingestion from dbt state.

The reference treats a dbt project's compiled artifacts as a data source:
``manifest.json`` drives WHICH relations get profiled (model/seed/source
nodes filtered by materialization, tag, or an explicit resource list —
dbtutil.py:171-227) and decorates the report with node descriptions
(dbtutil.py:150-168); ``run_results.json`` contributes executed dbt test
outcomes into the run report's ``tests`` list (dbtutil.py:230-290,
consumed by runner.py:577-593, 643-648).

Spark-first scope: the artifact PARSING and selection semantics are
reproduced 1:1, but subjects resolve to Spark catalog tables (or
caller-supplied DataFrames) instead of SQLAlchemy reflections — the
profiling itself is the fused two-job profiler. Orchestration shell
(dbt invocation, git integration, recipes) stays out of scope per
SURVEY §7.4.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_MATERIAL_WHITELIST = ("seed", "table", "incremental")  # dbtutil.py:173
_RESOURCE_WHITELIST = ("model", "seed")  # dbtutil.py:174


def load_manifest(dbt_state_dir: str) -> dict:
    """Read manifest.json from a dbt target dir (dbtutil.py:137-147)."""
    with open(os.path.join(dbt_state_dir, "manifest.json")) as f:
        return json.load(f)


def load_run_results(dbt_state_dir: str) -> dict | None:
    """Read run_results.json if present (dbtutil.py:125-135; absence is
    normal — `dbt compile` emits only a manifest)."""
    path = os.path.join(dbt_state_dir, "run_results.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


@dataclass
class DbtSubject:
    """One relation selected for profiling."""

    name: str
    schema: str | None
    database: str | None
    unique_id: str
    resource_type: str
    description: str = ""
    column_descriptions: dict[str, str] = field(default_factory=dict)

    @property
    def ref_id(self) -> str:
        return self.unique_id

    def qualified_name(self) -> str:
        parts = [p for p in (self.database, self.schema, self.name) if p]
        return ".".join(parts)


def _node_subject(node: dict) -> DbtSubject:
    return DbtSubject(
        name=node.get("name"),
        schema=node.get("schema"),
        database=node.get("database"),
        unique_id=node.get("unique_id", ""),
        resource_type=node.get("resource_type", ""),
        description=node.get("description") or "",
        column_descriptions={
            cname: (c.get("description") or "")
            for cname, c in (node.get("columns") or {}).items()
            if c.get("description")
        },
    )


def dbt_state_candidates(
    manifest: dict,
    tag: str | None = None,
    resources: set[str] | None = None,
    include_views: bool = False,
) -> list[DbtSubject]:
    """Select profile subjects from a manifest, mirroring the reference's
    filter ladder (dbtutil.py:171-227): an explicit resource list (unique_id
    or dotted fqn) wins; else a tag filter; else the materialization
    whitelist (seed/table/incremental, + view when ``include_views``).
    Nodes are restricted to model/seed; every manifest ``source`` entry goes
    through the same chooser.
    """
    material_ok = _MATERIAL_WHITELIST + (("view",) if include_views else ())

    def chosen(node: dict) -> bool:
        if resources is not None:
            fqn = ".".join(node.get("fqn") or [])
            return node.get("unique_id") in resources or fqn in resources
        if tag:
            return tag in (node.get("tags") or [])
        material = (node.get("config") or {}).get("materialized")
        # sources run through the SAME materialization check as the
        # reference's chooser (dbtutil.py:199-204): they carry no
        # `materialized` config, so None fails the whitelist and sources
        # are excluded by default — selectable via tag or resource list
        return material in material_ok

    out: list[DbtSubject] = []
    for node in (manifest.get("nodes") or {}).values():
        if node.get("resource_type") not in _RESOURCE_WHITELIST:
            continue
        if chosen(node):
            out.append(_node_subject(node))
    for node in (manifest.get("sources") or {}).values():
        if chosen(node):
            out.append(_node_subject(node))
    return out


def dbt_test_results(
    manifest: dict, run_results: dict | None, table_filter: str | None = None
) -> list[dict]:
    """Executed dbt test outcomes in the reference's run.json ``tests``
    entry shape (dbtutil.py:230-290): one dict per EXECUTED test (status
    'success' means compiled-not-run and is skipped), attributed to the
    first model/seed/source the test depends on."""
    if not run_results:
        return []
    nodes = manifest.get("nodes") or {}
    sources = manifest.get("sources") or {}
    out: list[dict] = []
    for result in run_results.get("results", []):
        unique_id = result.get("unique_id")
        node = nodes.get(unique_id)
        if not node or node.get("resource_type") != "test":
            continue
        if result.get("status") == "success":  # compiled only, not executed
            continue
        table = None
        for dep in node.get("depends_on", {}).get("nodes", []):
            if dep.startswith("source"):
                src = sources.get(dep)
                if src is None:  # pruned/partial manifest — keep searching
                    continue
                table = f"{src.get('source_name')}.{src.get('name')}"
                break
            dep_node = nodes.get(dep) or {}
            if dep_node.get("resource_type") in ("model", "seed"):
                table = dep_node.get("name")
                break
        if table is None:
            continue
        if table_filter is not None:
            tname = table.split(".")[-1]
            if tname != table_filter:
                continue
        column = node.get("column_name")
        out.append(
            {
                "id": unique_id,
                "name": unique_id,
                "table": table,
                "column": column if column != node.get("name") else None,
                "status": "failed" if result.get("status") == "fail" else "passed",
                "tags": [],
                "message": result.get("message"),
                "display_name": node.get("name"),
                "source": "dbt",
            }
        )
    return out


def append_descriptions(report: dict, manifest: dict) -> None:
    """Copy node + column descriptions from the manifest onto a run report
    in place (dbtutil.py:150-168, extended to columns from the manifest's
    per-node column metadata)."""
    for node in (manifest.get("nodes") or {}).values():
        name = node.get("name")
        tbl = report.get("tables", {}).get(name)
        if not tbl:
            continue
        if node.get("description"):
            tbl["description"] = str(node["description"])
        if node.get("unique_id"):
            tbl["ref_id"] = node["unique_id"]
        for cname, cmeta in (node.get("columns") or {}).items():
            col = tbl.get("columns", {}).get(cname)
            if col is not None and cmeta.get("description"):
                col["description"] = str(cmeta["description"])


def resolve_subject(spark: SparkSession, subject: DbtSubject) -> DataFrame | None:
    """Resolve a subject to a Spark relation: try the fully qualified
    catalog name, then schema.name. The bare name is accepted only when it
    resolves to a TEMPORARY view — an explicitly caller-registered stand-in
    (the test-fixture / notebook case); a bare-name hit on a *permanent*
    table in some unrelated default database would silently profile the
    wrong relation, so it is rejected. Returns None when nothing resolves —
    the caller skips, like the reference skips unreflectable relations."""
    candidates = []
    if subject.database and subject.schema:
        candidates.append(f"{subject.database}.{subject.schema}.{subject.name}")
    if subject.schema:
        candidates.append(f"{subject.schema}.{subject.name}")
    for qname in candidates:
        try:
            return spark.table(qname)
        except Exception:
            continue
    try:
        if spark.catalog.getTable(subject.name).tableType == "TEMPORARY":
            return spark.table(subject.name)
    except Exception:
        pass
    return None


def profile_dbt_state(
    spark: SparkSession,
    dbt_state_dir: str,
    tag: str | None = None,
    resources: set[str] | None = None,
    include_views: bool = False,
    config: Any = None,
    created_at: str | None = None,
) -> dict:
    """End-to-end dbt-source profile: manifest → subjects → fused profiler
    → report decorated with descriptions + executed test results (the data
    side of the reference's `piperider run --dbt-state` flow,
    runner.py:577-593, 643-648)."""
    from piperider_spark.profiler.report import build_run_report

    manifest = load_manifest(dbt_state_dir)
    subjects = dbt_state_candidates(
        manifest, tag=tag, resources=resources, include_views=include_views
    )
    tables: dict[str, DataFrame] = {}
    for s in subjects:
        df = resolve_subject(spark, s)
        if df is not None:
            # same-named subjects (a source and a model, or same-named
            # models across packages) must not silently overwrite each
            # other — the collision loser keys by its qualified name
            key = s.name if s.name not in tables else s.qualified_name()
            tables[key] = df
    report = build_run_report(
        tables, datasource_name="dbt", config=config, created_at=created_at
    )
    append_descriptions(report, manifest)
    report["tests"] = dbt_test_results(manifest, load_run_results(dbt_state_dir))
    return report
