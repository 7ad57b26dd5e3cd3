"""Staged corpus curation: the full document-side filter chain composed in
the order modern web-corpus pipelines run it (RefinedWeb / C4 / Gopher
lineage): exact dedup → corpus-wide line (boilerplate) dedup → C4 line
filters → Gopher repetition + quality rules, each stage scoring the
PREVIOUS stage's text.

Why composition order matters (frozen here): boilerplate lines removed
before C4's line rules (a nav bar must not count against the >=3-kept-lines
rule), C4's kept-lines rebuild before Gopher metrics (repetition fractions
are about content, not chrome). Reasons accumulate per stage; `keep` is
their conjunction — the same reasons-array contract as the transcript
pipeline (rules/heuristics.apply_rules).

Scale shape: the chain adds NO new shuffle class — it is exactly the union
of its stages' audited plans (SCALE.md §3: line dedup's three bounded
stages, exact dedup's single fingerprint shuffle) plus doc_id equi-joins to
reassemble, which co-partition on the id. The quality stages are
zero-shuffle projections (PLANS.md). Reference analogue: the reference
chains profiling → assertions → report per run (runner.py); this is that
lifecycle for corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from piperider_spark.operators.dedup import corpus_line_dedup, exact_dup_flags
from piperider_spark.operators.quality import (
    c4_filter_stats,
    encoding_quality_stats,
    fix_mojibake,
    gopher_quality_stats,
    gopher_repetition_stats,
)

# reason labels in firing-stage order (frozen, like rules/spec reason_order);
# "encoding" fires only with fix_encoding=True and precedes everything — a
# double-encoded doc must be repaired before any text-shape rule reads it;
# "dup_substring" fires only with substr_max_frac set and reads the
# line-deduped text (chrome must not inflate the duplication fraction)
REASON_ORDER = (
    "encoding",
    "exact_dup",
    "dup_substring",
    "c4",
    "gopher_repetition",
    "gopher_quality",
)


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_docs: int = 2,
    fix_encoding: bool = False,
    substr_max_frac: float | None = None,
    substr_k: int = 8,
) -> DataFrame:
    """Run the staged curation chain; returns one row per input doc:
    (id, text_curated, n_boilerplate_removed, reasons, keep).

    text_curated = line-deduped then C4-kept-lines text — what a kept doc
    would ship to training. Non-canonical exact duplicates exit at stage 1:
    they carry only the ``exact_dup`` reason and a NULL text_curated, and —
    crucially — they are REMOVED from the line-dedup corpus first, else a
    duplicated document's own lines count as cross-document boilerplate
    and line dedup would hollow out the canonical copy too.

    ``fix_encoding`` (opt-in; default off preserves the frozen four-stage
    contract byte-for-byte) prepends the encoding stage where the CCNet /
    RefinedWeb lineage runs text normalization: mojibake artifacts are
    REPAIRED first (quality.fix_mojibake — so dedup fingerprints and every
    text-shape rule read the corrected text, and a doc and its corrupted
    twin dedup together), then docs still failing encoding_quality_stats
    (U+FFFD damage, stray controls) drop with reason ``encoding``. Both
    additions are zero-shuffle projections — the chain's shuffle inventory
    is unchanged.

    ``substr_max_frac`` (opt-in) adds the exact-substring duplication GATE
    after line dedup: docs whose corpus-duplicated ``substr_k``-token-window
    coverage (dedup.duplicate_substring_stats over the line-deduped text)
    exceeds the threshold drop with reason ``dup_substring`` — Lee et
    al.'s signal as a document gate. The gate form (not span removal) is
    deliberate inside the chain: remove_duplicate_substrings rebuilds text
    with single-space joins, which would destroy the line structure C4 and
    the Gopher line-fraction rules read downstream; use the standalone
    operator when span surgery is what you want. This stage adds the
    substring plan's one partial-agg shuffle (SCALE.md) to the chain —
    the only opt-in stage that is not a pure projection.
    """
    enc_keep = None
    if fix_encoding:
        # repair FIRST, then gate the repaired text: a doc drops only for
        # damage the repair cannot undo (U+FFFD, stray controls, artifacts
        # outside the inventory) — never for what was just fixed
        df = df.withColumn(text_col, fix_mojibake(text_col))
        enc_keep = encoding_quality_stats(df, text_col=text_col, id_col=id_col).select(
            id_col, F.col("keep").alias("_enc_keep")
        )
    # materialize the tiny (id, is_canonical) frame: it feeds both the
    # canonical semi-join below AND the final spine join — without this the
    # full fingerprint groupBy+join shuffle executes twice per call
    dup = (
        exact_dup_flags(df, id_col, text_col)
        .select(id_col, "is_canonical")
        .localCheckpoint(eager=True)
    )
    canon = df.join(
        dup.where(F.col("is_canonical")).select(id_col), id_col, "left_semi"
    )

    lined = corpus_line_dedup(canon, id_col, text_col, min_docs=min_line_docs)
    lined = lined.select(
        id_col,
        # corpus_line_dedup aliases its rebuilt text to text_col (review
        # finding: the hardcoded "text" broke any non-default text_col)
        F.col(text_col).alias("_t1"),
        F.col("n_removed").alias("n_boilerplate_removed"),
    )
    # The line-dedup subtree (three shuffle stages) fans into four join
    # branches below (lined, c4, rep, qual); without materialization it
    # recomputes per branch unless ReusedExchange happens to fire. Eager
    # localCheckpoint (the dedup.py idiom) pins the result once and
    # truncates the lineage the four branches replay.
    lined = lined.localCheckpoint(eager=True)

    sub_keep = None
    if substr_max_frac is not None:
        from piperider_spark.operators.dedup import duplicate_substring_stats

        sub_keep = duplicate_substring_stats(
            lined, id_col=id_col, text_col="_t1", k=substr_k, hash_fn="xxhash64"
        ).select(
            id_col, (F.col("dup_frac") <= F.lit(substr_max_frac)).alias("_sub_keep")
        )

    c4 = c4_filter_stats(lined, text_col="_t1", id_col=id_col).select(
        id_col,
        F.col("text_clean").alias("text_curated"),
        F.col("keep").alias("_c4_keep"),
    )

    rep = gopher_repetition_stats(c4, text_col="text_curated", id_col=id_col)
    rep = rep.select(id_col, F.col("keep").alias("_rep_keep"))
    qual = gopher_quality_stats(c4, text_col="text_curated", id_col=id_col)
    qual = qual.select(id_col, F.col("keep").alias("_q_keep"))

    # left joins back onto the full id spine: downstream stages only ran on
    # canonical docs, so their flags are NULL for exact dups — coalesce to
    # "did not fire" (the dup already has its reason)
    joined = (
        dup.join(lined, id_col, "left")
        .join(c4, id_col, "left")
        .join(rep, id_col, "left")
        .join(qual, id_col, "left")
    )
    if enc_keep is not None:
        joined = joined.join(enc_keep, id_col, "left")
    if sub_keep is not None:
        joined = joined.join(sub_keep, id_col, "left")
    fired = {
        "encoding": (
            ~F.coalesce(F.col("_enc_keep"), F.lit(True))
            if enc_keep is not None
            else F.lit(False)
        ),
        "exact_dup": ~F.col("is_canonical"),
        "dup_substring": (
            ~F.coalesce(F.col("_sub_keep"), F.lit(True))
            if sub_keep is not None
            else F.lit(False)
        ),
        "c4": ~F.coalesce(F.col("_c4_keep"), F.lit(True)),
        "gopher_repetition": ~F.coalesce(F.col("_rep_keep"), F.lit(True)),
        "gopher_quality": ~F.coalesce(F.col("_q_keep"), F.lit(True)),
    }
    reasons = F.array_compact(
        F.array(
            *[F.when(fired[name], F.lit(name)) for name in REASON_ORDER]
        )
    )
    return joined.select(
        F.col(id_col),
        "text_curated",
        F.coalesce(F.col("n_boilerplate_removed"), F.lit(0))
        .cast("bigint")
        .alias("n_boilerplate_removed"),
        reasons.alias("reasons"),
        (F.size(reasons) == 0).alias("keep"),
    )
