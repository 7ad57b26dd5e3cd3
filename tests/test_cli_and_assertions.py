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
