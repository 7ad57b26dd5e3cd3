"""Frozen PII / toxicity scrub rules.

This module is THE spec: the pure-Python oracle and the Spark pandas-UDF
both import it, so scrubbed text is byte-identical by construction; what the
fixtures then verify is that the *distributed execution* (Arrow batching,
partitioning, ordering) is faithful to a serial pass.

Design constraints (BASELINE.json north_rule / input_hint):
  * ordered, non-overlapping application — rules run top to bottom, each on
    the output of the previous one;
  * byte-exact determinism — plain `re` with no locale- or random-dependent
    behavior; patterns avoid constructs RE2-class engines lack (no
    backreferences, no lookbehind) so the same rules can also be pushed into
    SQL `regexp_replace` for oracle cross-checks;
  * compiled once per process (module level) — per-executor, not per-batch.

Reference analogue: PipeRider has no scrubbing; its closest surface is the
validity CASE-cascade transform applied before profiling
(/root/reference/piperider_cli/profiler/profiler.py:802-809) — a per-value
normalization pass, which is what this is for text.
"""

from __future__ import annotations

import re

# Each rule: (name, compiled pattern, replacement). ORDER IS FROZEN —
# changing order changes bytes. Email runs before phone so digit runs inside
# addresses are never half-eaten; SSN before phone (disjoint shapes, but the
# explicit order makes the spec total).
SCRUB_RULES: list[tuple[str, re.Pattern[str], str]] = [
    (
        "email",
        re.compile(r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
        "<EMAIL>",
    ),
    (
        "ssn",
        re.compile(r"\b\d{3}-\d{2}-\d{4}\b"),
        "<SSN>",
    ),
    (
        "phone",
        # +1 555-123-4567 | (555) 123-4567 | 555.123.4567 | 555-123-4567
        re.compile(r"(\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b"),
        "<PHONE>",
    ),
    (
        "api_key",
        # sk-... / api_... style secrets: known prefix + >=16 token chars
        re.compile(r"\b(sk|pk|api|key|token)[-_][A-Za-z0-9]{16,}\b"),
        "<KEY>",
    ),
    (
        "ipv4",
        re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
        "<IP>",
    ),
]

# Toxicity masking: frozen lowercase lexicon, whole-word, case-insensitive.
# (Synthetic placeholder tokens — the mechanism, list-driven whole-word
# masking, is what matters; a real deployment swaps the lexicon.)
TOXIC_LEXICON: tuple[str, ...] = (
    "frak",
    "gorram",
    "smeghead",
    "dirtbag",
    "scumbucket",
)
_TOXIC_RE = re.compile(
    r"\b(" + "|".join(re.escape(w) for w in TOXIC_LEXICON) + r")\b",
    re.IGNORECASE,
)
TOXIC_REPLACEMENT = "<TOX>"


def scrub_text(text: str | None) -> str | None:
    """Apply every scrub rule in frozen order. None passes through."""
    if text is None:
        return None
    out = text
    for _name, pattern, repl in SCRUB_RULES:
        out = pattern.sub(repl, out)
    out = _TOXIC_RE.sub(TOXIC_REPLACEMENT, out)
    return out


def scrub_series(texts) -> "object":
    """Vectorized scrub of a pandas Series, byte-identical to per-row
    :func:`scrub_text`.

    Non-null rows are joined into one '\\x00'-separated blob and each rule
    runs ONCE over it at C speed (none of the frozen patterns can match or
    span the separator: every pattern's character classes exclude \\x00, and
    \\b treats it as a non-word boundary exactly like start-of-string). Rows
    that themselves contain \\x00 fall back to the serial path.
    """
    import numpy as np
    import pandas as pd

    mask = texts.notna().to_numpy()
    vals = [str(v) for v in texts[texts.notna()]]
    if not vals:
        return texts.copy()
    if any("\x00" in v for v in vals):
        return texts.map(scrub_text)
    blob = "\x00".join(vals)
    for _name, pattern, repl in SCRUB_RULES:
        blob = pattern.sub(repl, blob)
    blob = _TOXIC_RE.sub(TOXIC_REPLACEMENT, blob)
    out = np.full(len(texts), None, dtype=object)
    out[mask] = blob.split("\x00")
    return pd.Series(out, index=texts.index, dtype=object)


def scrub_counts(text: str | None) -> dict[str, int]:
    """Per-rule hit counts (for metrics rows), applied in the same order."""
    counts: dict[str, int] = {}
    if text is None:
        return counts
    out = text
    for name, pattern, repl in SCRUB_RULES:
        out, n = pattern.subn(repl, out)
        if n:
            counts[name] = n
    _, n = _TOXIC_RE.subn(TOXIC_REPLACEMENT, out)
    if n:
        counts["toxicity"] = n
    return counts
