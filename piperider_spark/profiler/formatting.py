"""Driver-side number/label formatting with reference parity.

Reimplements the output algebra of the reference (not the SQL machinery):
  * format_float — human labels "10.00 _ 29.80", "980.20 _ 1.0K"
    (reference: piperider_cli/profiler/profiler.py:51-78; parity asserted by
    the num_float_hist fixture, tests/profiler/test_profiler.py:212-230)
  * percentage — ratio or None when total is falsy (profiler.py:81-86)
  * json_safe — Decimal→float, NaN/Inf→str (runner.py:283-306 hygiene)

Provenance note: format_float/percentage intentionally reproduce the
reference's ~40-line output formatters near-verbatim — histogram-label
byte-parity is a stated correctness requirement (SURVEY §2.8), and the
reference is Apache-2.0. Everything else in this repo is an independent
Spark-first design; this is the one deliberate textual overlap.
"""

from __future__ import annotations

import decimal
import math
from typing import Any


def percentage(number: float | int | None, total: float | int | None) -> float | None:
    if number is None:
        return None
    if not total:
        return None
    return number / total


def format_float(val: int | float) -> str:
    """Human-readable magnitude label; byte-parity with the reference's
    histogram labels (K/M/B/T suffixes, 2-3 significant decimals)."""
    if val == 0:
        return "0"
    base = math.floor(math.log10(abs(val)))
    if base < -2:
        return f"{val:.2e}"
    if base < 0:
        return f"{val:.3f}"
    if base < 3:
        return f"{val:.2f}"
    if base < 6:
        return f"{val / 10**3:.1f}K"
    if base < 9:
        return f"{val / 10**6:.1f}M"
    if base < 12:
        return f"{val / 10**9:.1f}B"
    if base < 15:
        return f"{val / 10**12:.1f}T"
    return f"{val / 10**12:.0f}T"


def json_safe(value: Any) -> Any:
    """Make a scalar JSON-serializable the way the reference's writer does:
    Decimals to float, non-finite floats to strings."""
    if isinstance(value, decimal.Decimal):
        value = float(value)
    if isinstance(value, float) and not math.isfinite(value):
        return str(value)
    return value
