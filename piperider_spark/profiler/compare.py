"""Run-over-run report comparison ("compare-reports").

Reference: piperider compare-reports joins two run.json outputs per
table/column and derives a changeset —
  * explicit changes: code-level diffs (dbt graph) — out of scope (no dbt);
  * implicit changes: data drift, where a column counts as changed iff its
    ``type / duplicates / nulls / distinct`` metrics differ
    (/root/reference/piperider_cli/dbt/utils.py:19-42 equality rule,
    changeset at dbt/changeset.py:902-925), or the table's row/col counts
    moved (compare_report.py:126-149).

Reports are KB-sized dicts, so the merge is driver-side like the reference;
a DataFrame variant (`compare_reports_df`) exists for fleets of reports
stored as rows.
"""

from __future__ import annotations

from typing import Any

IMPLICIT_METRICS = ("type", "duplicates", "nulls", "distinct")


def column_changed(base: dict | None, target: dict | None) -> bool:
    """The reference's is_column_changed equality (dbt/utils.py:19-42)."""
    if base is None or target is None:
        return base is not target
    return any(base.get(m) != target.get(m) for m in IMPLICIT_METRICS)


def table_changed(base: dict | None, target: dict | None) -> bool:
    """Row/col count movement (dbt/utils.py:45-60 analogue)."""
    if base is None or target is None:
        return base is not target
    if base.get("row_count") != target.get("row_count"):
        return True
    if base.get("col_count") != target.get("col_count"):
        return True
    return False


def compare_reports(base: dict, target: dict) -> dict[str, Any]:
    """Order-preserving merge of two run reports → changeset.

    Output shape: {tables: {name: {in_base, in_target, table_changed,
    columns: {col: {in_base, in_target, changed, deltas}}}},
    summary: {added, removed, changed, unchanged}}.
    """
    bt = base.get("tables", {})
    tt = target.get("tables", {})
    names = list(bt) + [n for n in tt if n not in bt]  # order-preserving union
    out: dict[str, Any] = {"tables": {}, "summary": {}}
    added = removed = changed = unchanged = 0
    for name in names:
        b, t = bt.get(name), tt.get(name)
        cols: dict[str, Any] = {}
        bc = (b or {}).get("columns", {})
        tc = (t or {}).get("columns", {})
        for col in list(bc) + [c for c in tc if c not in bc]:
            cb, ct = bc.get(col), tc.get(col)
            entry: dict[str, Any] = {
                "in_base": cb is not None,
                "in_target": ct is not None,
                "changed": column_changed(cb, ct),
            }
            if cb and ct:
                entry["deltas"] = {
                    m: {"base": cb.get(m), "target": ct.get(m)}
                    for m in IMPLICIT_METRICS
                    if cb.get(m) != ct.get(m)
                }
            cols[col] = entry
        t_changed = table_changed(b, t) or any(c["changed"] for c in cols.values())
        out["tables"][name] = {
            "in_base": b is not None,
            "in_target": t is not None,
            "table_changed": t_changed,
            "row_count": {"base": (b or {}).get("row_count"), "target": (t or {}).get("row_count")},
            "columns": cols,
        }
        if b is None:
            added += 1
        elif t is None:
            removed += 1
        elif t_changed:
            changed += 1
        else:
            unchanged += 1
    out["summary"] = {
        "added": added, "removed": removed, "changed": changed, "unchanged": unchanged
    }
    return out


def summary_markdown(changeset: dict) -> str:
    """Compact markdown summary (the reference emits a markdown comparison
    summary, dbt/changeset.py:547 ff)."""
    s = changeset["summary"]
    lines = [
        "# Comparison summary",
        "",
        f"added: {s['added']}  removed: {s['removed']}  "
        f"changed: {s['changed']}  unchanged: {s['unchanged']}",
        "",
        "| table | status | row_count (base → target) | changed columns |",
        "| --- | --- | --- | --- |",
    ]
    for name, t in changeset["tables"].items():
        if not t["in_base"]:
            status = "added"
        elif not t["in_target"]:
            status = "removed"
        elif t["table_changed"]:
            status = "changed"
        else:
            status = "ok"
        rc = t["row_count"]
        cols = ", ".join(c for c, e in t["columns"].items() if e["changed"]) or "—"
        lines.append(f"| {name} | {status} | {rc['base']} → {rc['target']} | {cols} |")
    return "\n".join(lines)


def save_decisions_table(decided, table_name: str, n_buckets: int = 16) -> None:
    """Materialize a pipeline decisions DataFrame as a managed parquet table
    bucketed AND sorted by the stable (conv_id, turn_idx) key — the one-time
    shuffle that makes every later :func:`diff_decisions` between runs
    saved this way exchange-free (both sides' bucket files hash-align, the
    plan is a SortMergeJoin with zero Exchange — plan-pinned in tests, same
    contract as operators/bucketing.write_bucketed). An Iceberg deployment
    uses a ``bucket(n, conv_id)`` partition transform for the same effect."""
    (
        decided.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "conv_id", "turn_idx")
        .sortBy("conv_id", "turn_idx")
        .saveAsTable(table_name)
    )


def diff_decisions(base, target):
    """Turn-level decision diff between two pipeline runs — the
    compare-reports loop applied to the keep/drop output itself: which
    turns flipped, in which direction, and under which reasons.

    Both inputs are decisions DataFrames, parquet paths, or
    ``table:<name>`` identifiers (conv_id, turn_idx, keep, reasons,
    text_scrubbed). Returns one row per turn present in either run with
    ``status`` ∈ {added, removed, now_dropped, now_kept, text_changed,
    unchanged} (first match in that order — the when-chain below).

    Scale note (honest plan accounting): the pipeline's decisions/ output
    is DIRECTORY-partitioned by bucket, which prunes scans but gives the
    reader no hash-partitioning guarantee — a diff over two such paths is
    a normal two-exchange sort-merge join on (conv_id, turn_idx). For the
    recurring-diff workload, save both runs with
    :func:`save_decisions_table` (bucketed by the key) and pass
    ``table:<name>``: the same join then plans with ZERO Exchange
    (plan-pinned in tests) — the operators/bucketing.py ladder applied to
    the compare loop.
    """
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    def load(x) -> DataFrame:
        if isinstance(x, DataFrame):
            return x
        if isinstance(x, str) and x.startswith("table:"):
            return _active_spark().table(x[len("table:"):])
        return _active_spark().read.parquet(x)

    cols = ["conv_id", "turn_idx", "keep", "reasons", "text_scrubbed"]
    b = load(base).select(*cols)
    t = load(target).select(*cols)
    rename = lambda df, side: df.select(  # noqa: E731
        "conv_id",
        "turn_idx",
        *[F.col(c).alias(f"{side}_{c}") for c in cols[2:]],
    )
    j = rename(b, "base").join(
        rename(t, "target"), ["conv_id", "turn_idx"], "full_outer"
    )
    in_base = F.col("base_keep").isNotNull() | F.col("base_reasons").isNotNull()
    in_target = (
        F.col("target_keep").isNotNull() | F.col("target_reasons").isNotNull()
    )
    status = (
        F.when(~in_base, F.lit("added"))
        .when(~in_target, F.lit("removed"))
        .when(F.col("base_keep") & ~F.col("target_keep"), F.lit("now_dropped"))
        .when(~F.col("base_keep") & F.col("target_keep"), F.lit("now_kept"))
        .when(
            ~F.coalesce(
                F.col("base_text_scrubbed") == F.col("target_text_scrubbed"),
                F.col("base_text_scrubbed").isNull()
                & F.col("target_text_scrubbed").isNull(),
            ),
            F.lit("text_changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "conv_id",
        "turn_idx",
        status.alias("status"),
        F.col("base_reasons").alias("reasons_base"),
        F.col("target_reasons").alias("reasons_target"),
    )


def _active_spark():
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("diff_decisions with path inputs needs an active SparkSession")
    return s
