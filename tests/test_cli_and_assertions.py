"""CLI end-to-end (profile → assert → compare → filter) + skew behavior."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from piperider_spark.cli import main as cli_main


@pytest.fixture(scope="module")
def run_json(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_out")
    rc = cli_main(
        [
            "profile",
            "--source", "/root/testdata/sf0.001",
            "--table", "nation",
            "--table", "region",
            "--output", str(out),
        ]
    )
    assert rc == 0
    path = out / "latest" / "run.json"
    assert path.exists()
    return str(path)


def test_cli_profile_report_shape(run_json):
    with open(run_json) as f:
        report = json.load(f)
    assert set(report["tables"]) == {"nation", "region"}
    nat = report["tables"]["nation"]
    assert nat["row_count"] == 25
    assert nat["columns"]["n_name"]["distinct"] == 25
    assert nat["columns"]["n_name"]["nulls"] == 0


def test_cli_assert(run_json, tmp_path, capsys):
    spec = [
        {"table": "nation", "metric": "row_count", "op": "eq", "expected": 25},
        {"table": "nation", "column": "n_name", "metric": "nulls_p", "op": "lte", "expected": 0.0},
        {"table": "region", "metric": "row_count", "op": "between", "expected": [1, 10]},
    ]
    spec_path = tmp_path / "asserts.json"
    spec_path.write_text(json.dumps(spec))
    rc = cli_main(["assert", "--report", run_json, "--assertions", str(spec_path)])
    assert rc == 0
    assert "3/3 passed" in capsys.readouterr().out

    spec.append({"table": "nation", "metric": "row_count", "op": "eq", "expected": 999})
    spec_path.write_text(json.dumps(spec))
    rc = cli_main(["assert", "--report", run_json, "--assertions", str(spec_path)])
    assert rc == 1


def test_cli_compare(run_json, tmp_path, capsys):
    rc = cli_main(
        ["compare", "--base", run_json, "--target", run_json, "--output", str(tmp_path / "c.json")]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "unchanged: 2" in out
    cs = json.loads((tmp_path / "c.json").read_text())
    assert cs["summary"]["changed"] == 0


def test_skewed_conversation_pipeline(spark, tmp_path):
    """One mega-conversation (Zipf head) must neither break correctness nor
    concentrate in one bucket-wave output file group."""
    from piperider_spark.oracle import oracle_labels
    from piperider_spark.pipeline import build_decisions

    rng = np.random.default_rng(3)
    mega = 20_000
    texts = [
        "the quick brown fox jumps over the lazy dog number %d" % i for i in range(mega)
    ]
    # duplicate every 100th turn to exercise the lag rule inside the mega conv
    for i in range(100, mega, 100):
        texts[i] = texts[i - 1]
    rows = {
        "conv_id": ["mega"] * mega + [f"c{i}" for i in range(500)],
        "turn_idx": list(range(mega)) + [0] * 500,
        "role": ["user"] * (mega + 500),
        "text": texts + ["a short reply that should pass the filter rules fine"] * 500,
        "tool": [None] * (mega + 500),
        "ts": pd.to_datetime(["2024-01-01"] * (mega + 500)),
    }
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf)
    got = (
        build_decisions(df)
        .select("conv_id", "turn_idx", "keep", "reasons")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = oracle_labels(pdf).reset_index(drop=True)
    assert (got["keep"].values == want["keep"].values).all()
    n_dup = sum("duplicate_turn" in r for r in got["reasons"])
    assert n_dup == len(range(100, mega, 100))  # lag rule fired inside the mega conv


def test_table_file_metadata(spark):
    from piperider_spark.profiler.report import table_file_metadata

    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    md = table_file_metadata(df, now=4102444800.0)  # fixed "now" for determinism
    assert md["bytes"] > 0
    assert md["freshness"] > 0
    assert md["created"] <= md["last_altered"]


def test_cli_profile_untyped(spark, tmp_path):
    """--untyped: CSV dirty cells become invalids in the run.json."""
    import json as _json

    from piperider_spark.cli import main

    (tmp_path / "m.csv").write_text("amount\n1\noops\n3\n")
    out = tmp_path / "runs"
    rc = main(
        [
            "profile",
            "--source", str(tmp_path),
            "--output", str(out),
            "--untyped",
        ]
    )
    assert rc == 0
    run = _json.load(open(out / "latest" / "run.json"))
    col = run["tables"]["m"]["columns"]["amount"]
    assert col["type"] == "integer" and col["invalids"] == 1 and col["valids"] == 2


# ---- dbt-artifact source (reference dbtutil.py:125-290) ---------------------


def _dbt_state(tmp_path):
    manifest = {
        "nodes": {
            "model.proj.orders_clean": {
                "unique_id": "model.proj.orders_clean",
                "resource_type": "model",
                "name": "orders_clean",
                "schema": "analytics",
                "database": "db",
                "fqn": ["proj", "marts", "orders_clean"],
                "tags": ["nightly"],
                "config": {"materialized": "table"},
                "description": "cleaned orders",
                "columns": {
                    "o_orderkey": {"name": "o_orderkey", "description": "pk"}
                },
            },
            "model.proj.tmp_cte": {
                "unique_id": "model.proj.tmp_cte",
                "resource_type": "model",
                "name": "tmp_cte",
                "schema": "analytics",
                "database": "db",
                "fqn": ["proj", "tmp_cte"],
                "tags": [],
                "config": {"materialized": "ephemeral"},
                "columns": {},
            },
            "model.proj.orders_view": {
                "unique_id": "model.proj.orders_view",
                "resource_type": "model",
                "name": "orders_view",
                "schema": "analytics",
                "database": "db",
                "fqn": ["proj", "orders_view"],
                "tags": [],
                "config": {"materialized": "view"},
                "columns": {},
            },
            "seed.proj.country_codes": {
                "unique_id": "seed.proj.country_codes",
                "resource_type": "seed",
                "name": "country_codes",
                "schema": "analytics",
                "database": "db",
                "fqn": ["proj", "country_codes"],
                "tags": [],
                "config": {"materialized": "seed"},
                "columns": {},
            },
            "test.proj.not_null_orders_clean_o_orderkey": {
                "unique_id": "test.proj.not_null_orders_clean_o_orderkey",
                "resource_type": "test",
                "name": "not_null_orders_clean_o_orderkey",
                "column_name": "o_orderkey",
                "depends_on": {"nodes": ["model.proj.orders_clean"]},
            },
            "test.proj.src_rowcount": {
                "unique_id": "test.proj.src_rowcount",
                "resource_type": "test",
                "name": "src_rowcount",
                "column_name": None,
                "depends_on": {"nodes": ["source.proj.raw.events_raw"]},
            },
            "test.proj.compiled_only": {
                "unique_id": "test.proj.compiled_only",
                "resource_type": "test",
                "name": "compiled_only",
                "column_name": None,
                "depends_on": {"nodes": ["model.proj.orders_clean"]},
            },
        },
        "sources": {
            "source.proj.raw.events_raw": {
                "unique_id": "source.proj.raw.events_raw",
                "resource_type": "source",
                "name": "events_raw",
                "source_name": "raw",
                "schema": "raw",
                "database": "db",
                "fqn": ["proj", "raw", "events_raw"],
                "tags": [],
                "columns": {},
            }
        },
    }
    run_results = {
        "results": [
            {
                "unique_id": "test.proj.not_null_orders_clean_o_orderkey",
                "status": "fail",
                "failures": 2,
                "message": "got 2 nulls",
            },
            {
                "unique_id": "test.proj.src_rowcount",
                "status": "pass",
                "failures": 0,
                "message": None,
            },
            {
                "unique_id": "test.proj.compiled_only",
                "status": "success",
                "failures": None,
                "message": None,
            },
        ]
    }
    import json

    (tmp_path / "manifest.json").write_text(json.dumps(manifest))
    (tmp_path / "run_results.json").write_text(json.dumps(run_results))
    return str(tmp_path)


def test_dbt_candidate_selection(tmp_path):
    from piperider_spark.sources.dbt import dbt_state_candidates, load_manifest

    m = load_manifest(_dbt_state(tmp_path))
    names = {s.name for s in dbt_state_candidates(m)}
    # table + seed chosen; ephemeral and view excluded by default, and
    # sources too (no materialized config -> fails the whitelist, exactly
    # the reference chooser's behavior, dbtutil.py:199-204)
    assert names == {"orders_clean", "country_codes"}
    by_source_id = {
        s.name
        for s in dbt_state_candidates(m, resources={"source.proj.raw.events_raw"})
    }
    assert by_source_id == {"events_raw"}
    with_views = {s.name for s in dbt_state_candidates(m, include_views=True)}
    assert "orders_view" in with_views
    tagged = {s.name for s in dbt_state_candidates(m, tag="nightly")}
    assert tagged == {"orders_clean"}
    picked = {
        s.name
        for s in dbt_state_candidates(m, resources={"proj.marts.orders_clean"})
    }
    assert picked == {"orders_clean"}
    # metadata chooser (reference dbtutil.py:206-210): everything except
    # ephemeral — views and sources included, the profiling whitelist
    # ignored
    meta = {s.name for s in dbt_state_candidates(m, select_for_metadata=True)}
    assert "orders_view" in meta and "events_raw" in meta
    assert not any("ephemeral" in n or n == "orders_stg" for n in meta)
    names_all = {s.name for s in dbt_state_candidates(m, select_for_metadata=True)}
    assert "orders_clean" in names_all and "country_codes" in names_all


def test_dbt_test_results_shape(tmp_path):
    from piperider_spark.sources.dbt import (
        dbt_test_results,
        load_manifest,
        load_run_results,
    )

    d = _dbt_state(tmp_path)
    tests = dbt_test_results(load_manifest(d), load_run_results(d))
    by_id = {t["id"]: t for t in tests}
    # compiled-only (status success) excluded, executed pass+fail kept
    assert set(by_id) == {
        "test.proj.not_null_orders_clean_o_orderkey",
        "test.proj.src_rowcount",
    }
    failed = by_id["test.proj.not_null_orders_clean_o_orderkey"]
    assert failed["status"] == "failed" and failed["table"] == "orders_clean"
    assert failed["column"] == "o_orderkey" and failed["source"] == "dbt"
    # source-attributed test gets the source_name.name table form
    assert by_id["test.proj.src_rowcount"]["table"] == "raw.events_raw"
    assert by_id["test.proj.src_rowcount"]["status"] == "passed"


def test_profile_dbt_state_end_to_end(spark, tmp_path):
    """manifest → subjects → fused profiler → report with descriptions and
    executed dbt tests; the result must validate the reference's own
    run.json schema."""
    import json

    import jsonschema

    from piperider_spark.sources.dbt import profile_dbt_state

    d = _dbt_state(tmp_path)
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None)], "o_orderkey int, o_flag string"
    ).createOrReplaceTempView("orders_clean")
    spark.createDataFrame([("US",), ("DE",)], "code string").createOrReplaceTempView(
        "country_codes"
    )
    report = profile_dbt_state(
        spark, d, created_at="2026-01-01T00:00:00+00:00"
    )
    # events_raw has no resolvable relation -> skipped, others profiled
    assert set(report["tables"]) == {"orders_clean", "country_codes"}
    t = report["tables"]["orders_clean"]
    assert t["description"] == "cleaned orders"
    assert t["ref_id"] == "model.proj.orders_clean"
    assert t["columns"]["o_orderkey"]["description"] == "pk"
    assert t["row_count"] == 3
    assert {x["id"] for x in report["tests"]} == {
        "test.proj.not_null_orders_clean_o_orderkey",
        "test.proj.src_rowcount",
    }
    schema = json.load(open("/root/reference/piperider_cli/profiler/schema.json"))
    jsonschema.validate(report, schema)


def test_dbt_state_metrics_parse(tmp_path):
    import json

    from piperider_spark.sources.dbt import dbt_state_metrics, guard_division

    manifest = {
        "nodes": {
            "model.proj.orders_clean": {
                "unique_id": "model.proj.orders_clean",
                "resource_type": "model",
                "name": "orders_clean",
                "alias": "orders_clean",
                "schema": "analytics",
                "database": "db",
            }
        },
        "metrics": {
            "metric.proj.revenue": {
                "unique_id": "metric.proj.revenue",
                "name": "revenue",
                "label": "Revenue",
                "calculation_method": "sum",
                "expression": "amount",
                "timestamp": "ts",
                "time_grains": ["day", "month"],
                "tags": ["finance"],
                "filters": [
                    {"field": "status", "operator": "=", "value": "'paid'"}
                ],
                "depends_on": {"nodes": ["model.proj.orders_clean"]},
            },
            "metric.proj.n_orders": {
                "unique_id": "metric.proj.n_orders",
                "name": "n_orders",
                "calculation_method": "count",
                "expression": "order_id",
                "timestamp": "ts",
                "time_grains": ["day", "month"],
                "tags": [],
                "filters": [],
                "depends_on": {"nodes": ["model.proj.orders_clean"]},
            },
            "metric.proj.rev_per_order": {
                "unique_id": "metric.proj.rev_per_order",
                "name": "rev_per_order",
                "calculation_method": "derived",
                "expression": "revenue / n_orders",
                "timestamp": None,
                "time_grains": ["day", "month"],
                "tags": [],
                "filters": [],
                "depends_on": {
                    "nodes": ["metric.proj.revenue", "metric.proj.n_orders"]
                },
            },
            "metric.proj.unrefd": {
                "unique_id": "metric.proj.unrefd",
                "name": "unrefd",
                "calculation_method": "sum",
                "expression": "x",
                "timestamp": "ts",
                "time_grains": ["day"],
                "tags": [],
                "filters": [],
                # model not ref()'ed -> empty depends_on -> skipped
                "depends_on": {"nodes": []},
            },
            "metric.proj.windowed": {
                "unique_id": "metric.proj.windowed",
                "name": "windowed",
                "calculation_method": "sum",
                "expression": "x",
                "timestamp": "ts",
                "time_grains": ["day"],
                "tags": [],
                "filters": [],
                "window": {"count": 14, "period": "day"},
                "depends_on": {"nodes": ["model.proj.orders_clean"]},
            },
        },
    }
    ms = dbt_state_metrics(manifest)
    by_name = {m.name: m for m in ms}
    # unref'd (empty depends_on) and windowed metrics skipped, like the
    # reference (dbtutil.py:327-329, 345-350)
    assert set(by_name) == {"revenue", "n_orders", "rev_per_order"}
    assert by_name["revenue"].table == "orders_clean"
    assert by_name["revenue"].schema == "analytics"
    assert by_name["rev_per_order"].table is None
    assert [p.name for p in by_name["rev_per_order"].ref_metrics] == [
        "revenue",
        "n_orders",
    ]
    assert {m.name for m in dbt_state_metrics(manifest, tag="finance")} == {"revenue"}
    assert guard_division("a / b / c") == "a / nullif(b, 0) / nullif(c, 0)"
    assert guard_division("a + b") == "a + b"


def test_evaluate_dbt_metric_end_to_end(spark, tmp_path):
    """Parsed dbt metrics evaluate through the Spark metrics engine:
    filtered sum at daily grain with spine zero-fill, and a derived
    metric with the reference's nullif division guard."""
    from datetime import date

    from piperider_spark.sources.dbt import (
        DbtMetric,
        evaluate_dbt_metric,
    )

    rows = [
        ("2026-01-01 10:00:00", 10.0, "paid", 1),
        ("2026-01-01 11:00:00", 5.0, "void", 2),
        ("2026-01-03 09:00:00", 7.0, "paid", 3),
    ]
    spark.createDataFrame(
        [(r[0], r[1], r[2], r[3]) for r in rows],
        "ts_s string, amount double, status string, order_id int",
    ).selectExpr(
        "cast(ts_s as timestamp) as ts", "amount", "status", "order_id"
    ).createOrReplaceTempView("orders_clean")

    revenue = DbtMetric(
        name="revenue", table="orders_clean", schema=None, database=None,
        expression="amount", timestamp="ts", calculation_method="sum",
        time_grains=["day", "month"],
        filters=[{"field": "status", "operator": "=", "value": "'paid'"}],
    )
    n_orders = DbtMetric(
        name="n_orders", table="orders_clean", schema=None, database=None,
        expression="order_id", timestamp="ts", calculation_method="count",
        time_grains=["day", "month"],
        filters=[{"field": "status", "operator": "=", "value": "'paid'"}],
    )
    rev = {
        r["d"].isoformat() if hasattr(r["d"], "isoformat") else str(r["d"]): r["value"]
        for r in evaluate_dbt_metric(
            spark, revenue, "day", start=date(2026, 1, 1), end=date(2026, 1, 3)
        ).collect()
    }
    # filter applied (void excluded), spine zero-fills Jan 2
    assert rev == {"2026-01-01": 10.0, "2026-01-02": 0.0, "2026-01-03": 7.0}

    derived = DbtMetric(
        name="rev_per_order", table=None, schema=None, database=None,
        expression="revenue / n_orders", timestamp=None,
        calculation_method="derived", time_grains=["day", "month"],
        ref_metrics=[revenue, n_orders],
    )
    d = {
        str(r["d"]): r["value"]
        for r in evaluate_dbt_metric(
            spark, derived, "day", start=date(2026, 1, 1), end=date(2026, 1, 3)
        ).collect()
    }
    # Jan 2: 0 orders -> nullif guard yields NULL, not a crash or 0/0
    assert d["2026-01-01"] == 10.0 and d["2026-01-03"] == 7.0
    assert d["2026-01-02"] is None

    import pytest

    with pytest.raises(ValueError):
        evaluate_dbt_metric(spark, revenue, "year")


def test_query_dbt_metric_business_metric_shape(spark):
    """query_dbt_metric returns the run.json BusinessMetric shape over the
    reference's last-N-slots window, and a report carrying it validates
    the reference schema."""
    import json
    from datetime import date

    import jsonschema

    from piperider_spark.sources.dbt import DbtMetric, query_dbt_metric

    spark.createDataFrame(
        [("2026-01-05 10:00:00", 10.0), ("2025-11-20 11:00:00", 5.0)],
        "ts_s string, amount double",
    ).selectExpr("cast(ts_s as timestamp) as ts", "amount").createOrReplaceTempView(
        "rev_model"
    )
    m = DbtMetric(
        name="revenue", table="rev_model", schema=None, database=None,
        expression="amount", timestamp="ts", calculation_method="sum",
        time_grains=["month"], label="Revenue", description="money",
        ref_id="metric.proj.revenue",
    )
    q = query_dbt_metric(spark, m, "month", today=date(2026, 1, 15))
    assert q["name"] == "revenue_monthly"
    assert q["label"] == "Revenue (Monthly)"
    assert q["headers"] == ["date_month", "revenue"]
    assert q["grain"] == "month" and q["dimensions"] == []
    by_d = dict(q["data"])
    # 12 slots + current = 13 months, zero-filled; observed months populated
    assert len(q["data"]) == 13
    assert by_d["2026-01-01"] == 10.0 and by_d["2025-11-01"] == 5.0
    assert by_d["2025-12-01"] == 0.0 and by_d["2025-02-01"] == 0.0

    report = {
        "id": "r1",
        "created_at": "2026-01-15T00:00:00+00:00",
        "datasource": {"name": "dbt", "type": "spark"},
        "tables": {},
        "metrics": [q],
    }
    schema = json.load(open("/root/reference/piperider_cli/profiler/schema.json"))
    jsonschema.validate(report, schema)


def test_cli_profile_dbt_state(spark, tmp_path):
    """`profile --dbt-state <dir> --source <dir>`: source tables back the
    manifest's relations; the written run.json carries dbt descriptions
    and tests."""
    import json

    from piperider_spark.cli import main

    (tmp_path / "state").mkdir(exist_ok=True)
    d = _dbt_state(tmp_path / "state")
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "o_orderkey int, o_flag string"
    ).write.mode("overwrite").parquet(str(src_dir / "orders_clean.parquet"))
    spark.createDataFrame([("US",)], "code string").write.mode(
        "overwrite"
    ).parquet(str(src_dir / "country_codes.parquet"))
    out = tmp_path / "runs"
    rc = main(
        [
            "profile",
            "--dbt-state", d,
            "--source", str(src_dir),
            "--output", str(out),
        ]
    )
    assert rc == 0
    run = json.load(open(out / "latest" / "run.json"))
    assert set(run["tables"]) == {"orders_clean", "country_codes"}
    assert run["tables"]["orders_clean"]["description"] == "cleaned orders"
    assert {t["id"] for t in run["tests"]} == {
        "test.proj.not_null_orders_clean_o_orderkey",
        "test.proj.src_rowcount",
    }
    # neither --source nor --dbt-state -> usage error
    assert main(["profile", "--output", str(out)]) == 2


def test_dbt_ratio_metric_evaluates_and_bad_grain_skips(spark, tmp_path):
    """Review findings: (1) ratio metrics never parsed numerator/
    denominator nor wired ref_metrics — evaluation built 'None/None' over
    an empty parents dict and crashed with AttributeError; (2) a derived
    metric whose parent lacks a grain raised out of query_dbt_metrics and
    killed the whole metrics pass — it must skip that series only."""
    import json

    from piperider_spark.sources.dbt import (
        dbt_state_metrics,
        load_manifest,
        query_dbt_metrics,
    )

    spark.createDataFrame(
        [("2026-01-03", 10.0, 2.0), ("2026-01-04", 20.0, 4.0)],
        "d string, rev double, cost double",
    ).selectExpr("cast(d as timestamp) ts", "rev", "cost").createOrReplaceTempView(
        "facts"
    )
    manifest = {
        "nodes": {
            "model.p.facts": {
                "name": "facts",
                "resource_type": "model",
                "schema": "main",
                "database": None,
                "unique_id": "model.p.facts",
            }
        },
        "metrics": {
            "metric.p.rev": {
                "name": "rev_sum",
                "model": "ref('facts')",
                "expression": "rev",
                "timestamp": "ts",
                "calculation_method": "sum",
                "time_grains": ["day"],
                "depends_on": {"nodes": ["model.p.facts"]},
            },
            "metric.p.cost": {
                "name": "cost_sum",
                "model": "ref('facts')",
                "expression": "cost",
                "timestamp": "ts",
                "calculation_method": "sum",
                "time_grains": ["day"],
                "depends_on": {"nodes": ["model.p.facts"]},
            },
            "metric.p.margin": {
                "name": "margin",
                "calculation_method": "ratio",
                "numerator": "rev_sum",
                "denominator": "cost_sum",
                # 'month' is NOT supported by the parents -> that series
                # must be skipped, not crash the pass
                "time_grains": ["day", "month"],
                "depends_on": {"nodes": ["metric.p.rev", "metric.p.cost"]},
            },
        },
    }
    mpath = tmp_path / "manifest.json"
    mpath.write_text(json.dumps(manifest))
    metrics = dbt_state_metrics(load_manifest(str(tmp_path)))
    out = query_dbt_metrics(spark, [m for m in metrics if m.name == "margin"])
    assert len(out) == 1  # day evaluated, month skipped
    series = out[0]
    assert series["grain"] == "day"
