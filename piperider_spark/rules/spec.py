"""Frozen keep/drop rule thresholds — the single source of truth shared by
the Spark expressions (rules/heuristics.py) and the pure-pandas oracle
(piperider_spark/oracle.py).

This is PipeRider's declarative assertion surface (docs/metrics.md
"Assertion" column; residual engine at
/root/reference/piperider_cli/__init__.py:55-59) reimagined as per-turn
quality predicates over transcripts, per BASELINE.json north_rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class RuleSpec:
    valid_roles: tuple[str, ...] = ("system", "user", "assistant", "tool")
    max_chars: int = 8000               # turn-length upper bound
    rep_min_tokens: int = 20            # repetition rule applies from here
    rep_max_ratio: float = 0.6          # 1 - distinct_tokens/tokens above this -> drop
    ppl_max: float = 22.0               # char-bigram perplexity ceiling
    ppl_min_chars: int = 30             # perplexity rule applies from here
    langid_keep: tuple[str, ...] = ("en", "short")  # langs that pass
    tool_role: str = "tool"
    # drop-reason names, frozen order (reasons arrays are emitted in this order)
    reason_order: tuple[str, ...] = field(
        default=(
            "role_invalid",
            "text_empty",
            "too_long",
            "repetition",
            "tool_json_invalid",
            "duplicate_turn",
            "non_english",
            "high_perplexity",
        )
    )


DEFAULT_SPEC = RuleSpec()
