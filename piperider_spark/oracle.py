"""Pure-Python/pandas oracle for the quality-filter pipeline.

Produces the reference keep/drop labels and scrubbed text that the Spark
pipeline is graded against (BASELINE.json: F1 >= 0.99 + byte-exact scrub).
The rule logic here is written independently in pandas (serial, driver-side)
— only the frozen *spec* modules are shared (rules/spec.py thresholds,
signals/core.py scorers, scrub/rules.py regex list), mirroring SURVEY.md §5:
"a pure-Python/pandas oracle implementing the keep/drop + scrub rules".
"""

from __future__ import annotations

import json

import pandas as pd

from piperider_spark.rules.spec import DEFAULT_SPEC, RuleSpec
from piperider_spark.scrub.rules import scrub_text
from piperider_spark.signals.core import detect_lang_batch, perplexity_batch


def _tool_json_valid(payload: object) -> bool:
    if payload is None or not isinstance(payload, str):
        return False
    try:
        obj = json.loads(payload)
    except (ValueError, TypeError):
        return False
    return isinstance(obj, dict) and isinstance(obj.get("name"), str)


def oracle_labels(pdf: pd.DataFrame, spec: RuleSpec = DEFAULT_SPEC) -> pd.DataFrame:
    """Labels + scrubbed text for a transcripts frame.

    Returns columns: conv_id, turn_idx, keep, reasons (list[str] in
    spec.reason_order), text_scrubbed. Input order is normalized to stable
    (conv_id, turn_idx) — the per-row invariant of the north rule.
    """
    df = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    text = df["text"]
    stripped = text.fillna("").str.strip()

    fired: dict[str, pd.Series] = {}
    fired["role_invalid"] = ~df["role"].isin(spec.valid_roles) | df["role"].isna()
    fired["text_empty"] = text.isna() | (stripped.str.len() == 0)
    fired["too_long"] = text.str.len().fillna(0) > spec.max_chars

    # frozen token spec: maximal \S+ runs of the lowercased text
    toks = text.fillna("").str.lower().str.findall(r"\S+")
    n_tok = toks.str.len().fillna(0)
    n_uniq = toks.map(lambda t: len(set(t)) if isinstance(t, list) else 0)
    rep_ratio = 1.0 - (n_uniq / n_tok.where(n_tok > 0, 1))
    fired["repetition"] = (n_tok >= spec.rep_min_tokens) & (rep_ratio > spec.rep_max_ratio)

    is_tool = df["role"] == spec.tool_role
    fired["tool_json_invalid"] = is_tool & ~df["tool"].map(_tool_json_valid)

    prev_text = df.groupby("conv_id", sort=False)["text"].shift(1)
    fired["duplicate_turn"] = text.notna() & prev_text.notna() & (text == prev_text)

    lang = detect_lang_batch(text)
    fired["non_english"] = ~lang.isin(spec.langid_keep)

    ppl = perplexity_batch(text)
    fired["high_perplexity"] = (text.str.len().fillna(0) >= spec.ppl_min_chars) & (
        ppl > spec.ppl_max
    )

    reason_mat = pd.DataFrame({name: fired[name].fillna(False) for name in spec.reason_order})
    reasons = reason_mat.apply(
        lambda row: [n for n in spec.reason_order if row[n]], axis=1
    )
    keep = ~reason_mat.any(axis=1)

    return pd.DataFrame(
        {
            "conv_id": df["conv_id"],
            "turn_idx": df["turn_idx"],
            "keep": keep,
            "reasons": reasons,
            "text_scrubbed": text.map(scrub_text),
            "lang": lang,
            "ppl": ppl,
        }
    )
