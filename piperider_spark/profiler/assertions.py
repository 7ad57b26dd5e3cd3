"""Declarative assertions over profile reports.

PipeRider's assertion surface (docs/metrics.md "Assertion" column; results
shaped like dbt-test ingestion, /root/reference/piperider_cli/dbtutil.py:
284-294) as a small evaluator: each assertion names a table, an optional
column, a metric from the profile report, an operator and an expected
value. Evaluation is driver-side over the report dict (reports are KB-sized
— same locality choice as the reference); the *data-level* assertion layer
(per-turn keep/drop predicates) lives in rules/heuristics.py per the north
rule.

Example::

    asserts = [
        Assertion("lineitem", None, "row_count", "gte", 1),
        Assertion("lineitem", "l_quantity", "nulls_p", "lte", 0.01),
        Assertion("lineitem", "l_returnflag", "distinct", "in", [3]),
    ]
    results = evaluate_assertions(report, asserts)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

OPS = {
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
    "gt": lambda a, b: a is not None and a > b,
    "gte": lambda a, b: a is not None and a >= b,
    "lt": lambda a, b: a is not None and a < b,
    "lte": lambda a, b: a is not None and a <= b,
    "in": lambda a, b: a in b,
    "not_null": lambda a, _b: a is not None,
    "between": lambda a, b: a is not None and b[0] <= a <= b[1],
}


@dataclass(frozen=True)
class Assertion:
    table: str
    column: str | None
    metric: str
    op: str
    expected: Any = None
    name: str | None = None

    @property
    def display_name(self) -> str:
        tgt = f"{self.table}.{self.column}" if self.column else self.table
        return self.name or f"{tgt}: {self.metric} {self.op} {self.expected}"


def _lookup(report: dict, a: Assertion) -> Any:
    tbl = report.get("tables", {}).get(a.table)
    if tbl is None:
        return None
    node = tbl if a.column is None else tbl.get("columns", {}).get(a.column, {})
    return node.get(a.metric) if isinstance(node, dict) else None


def evaluate_assertions(report: dict, assertions: list[Assertion]) -> list[dict]:
    """One result row per assertion — the reference's test-result shape
    (name/status/actual/expected, dbtutil.py:284-294)."""
    out = []
    for a in assertions:
        if a.op not in OPS:
            raise ValueError(f"unknown assertion op {a.op!r}")
        actual = _lookup(report, a)
        passed = bool(OPS[a.op](actual, a.expected))
        out.append(
            {
                "name": a.display_name,
                "table": a.table,
                "column": a.column,
                "metric": a.metric,
                "status": "passed" if passed else "failed",
                "actual": actual,
                "expected": a.expected,
            }
        )
    return out


def load_assertions(spec: list[dict]) -> list[Assertion]:
    """From config dicts (e.g. parsed YAML/JSON):
    {table, column?, metric, op, expected?, name?}."""
    return [
        Assertion(
            table=d["table"],
            column=d.get("column"),
            metric=d["metric"],
            op=d["op"],
            expected=d.get("expected"),
            name=d.get("name"),
        )
        for d in spec
    ]
