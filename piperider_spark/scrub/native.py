"""JVM-native scrub twin: the frozen rule cascade as chained
``regexp_replace`` Column expressions.

Why this exists: the pipeline's scrub runs inside the one fused Arrow UDF
because it shares the crossing with the model signals — but a scrub-ONLY
job (re-scrub after a lexicon update, scrub-on-export) has no model
signals, and at 100 TB paying Python workers for five regex passes is
waste. This twin keeps such jobs entirely inside whole-stage codegen:
scan → regexp_replace chain → sink, zero Python processes.

Single spec source: patterns and order come from ``scrub.rules.SCRUB_RULES``
verbatim (``pattern.pattern``) — there is nothing here to drift.

Equivalence contract (measured, pinned in test_signals_fast_paths.py):
  * ASCII text: byte-identical to ``rules.scrub_text`` across Python, Java
    (Spark) and RE2 (DuckDB) — three-way tested.
  * Java vs the Python spec diverges in TWO classes: (1) ``\\d`` is
    Unicode-aware in Python (arabic-indic digit SSNs scrub) but ASCII in
    Java (they don't); (2) ``(?i)`` — Java's CASE_INSENSITIVE without
    UNICODE_CASE folds US-ASCII pairs only, while Python's IGNORECASE
    additionally folds the sre equivalences (ſ↔s U+017F, ı↔i U+0131,
    Kelvin↔k …), so e.g. ``ſmeghead`` is scrubbed by the Python spec but
    not by this path (the DuckDB ``scrub_sql_exprs`` oracle shares the
    ASCII-only fold). Java's ``\\b`` IS Unicode-aware like Python's, so
    word-boundary adjacency agrees (measured: ``é123-45-6789`` unscrubbed
    in both).
  * RE2 (the DuckDB oracle form) additionally has an ASCII-only ``\\b``,
    so non-ASCII letters adjacent to a match read as boundaries there.
  The frozen spec is the Python semantics; callers needing byte-exactness
  on corpora with non-ASCII digits must use the UDF path
  (``scrub_series``). This is the same honesty boundary the reference
  draws when it pushes validity CASEs into warehouse SQL
  (profiler.py:802-809): the engine's expression semantics, documented,
  not papered over.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from piperider_spark.scrub.rules import (
    SCRUB_RULES,
    TOXIC_REPLACEMENT,
    _TOXIC_RE,
)


def scrub_col(col: Column | str) -> Column:
    """The frozen scrub cascade as a native Column expression (NULL in →
    NULL out, like ``scrub_text``). See module docstring for the
    ASCII-equivalence contract."""
    out = F.col(col) if isinstance(col, str) else col
    for _name, pattern, repl in SCRUB_RULES:
        out = F.regexp_replace(out, F.lit(pattern.pattern), F.lit(repl))
    return F.regexp_replace(
        out, F.lit("(?i)" + _TOXIC_RE.pattern), F.lit(TOXIC_REPLACEMENT)
    )


def scrub_sql_exprs() -> list[tuple[str, str, str]]:
    """(name, pattern, replacement) triples for engines addressed as SQL —
    the DuckDB oracle test wraps these in nested regexp_replace(..., 'g')."""
    rules = [(n, p.pattern, r) for n, p, r in SCRUB_RULES]
    rules.append(("toxic", "(?i)" + _TOXIC_RE.pattern, TOXIC_REPLACEMENT))
    return rules
