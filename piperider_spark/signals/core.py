"""Frozen model-signal spec: language ID + hashed char-bigram perplexity.

Pure numpy/pandas, no Spark imports — shared verbatim by the pandas-UDF
executors AND the pure-Python oracle, so signal values are identical by
construction; fixtures then verify that distributed execution (Arrow
batching, partition layout) is faithful.

Both signals are batch-vectorized: a whole pd.Series in, numpy out, no
per-row Python in the hot path (BASELINE.json input_hint).

The language-ID plays the role of the fastText model in the north rule:
a deterministic stopword-regex + script-range scorer (no external model
files exist in this sandbox; the Spark-side contract — lazily-initialized
per-executor state, batched Series->Series — is identical to loading a real
fastText binary, and the scorer is swappable behind ``detect_lang_batch``).

The perplexity model is a KenLM-style fixed n-gram scorer reduced to
character bigrams with add-one smoothing over [a-z ], trained at import time
on a frozen embedded corpus — deterministic, no I/O.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Language ID
# ---------------------------------------------------------------------------

# Frozen per-language stopword regexes (whole-word, case-insensitive).
# Scoring: hits(lang) / tokens; argmax wins with ties broken by LANGS order;
# CJK decided first by script-range density. <5 tokens => 'short' (exempt
# from the non-English drop rule; too little evidence).
LANGS: tuple[str, ...] = ("en", "fr", "de", "es")

_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "are", "this", "have", "not", "you", "they", "will"),
    "fr": ("le", "la", "les", "des", "une", "est", "dans", "pour", "que",
           "qui", "pas", "vous", "avec", "sur", "nous", "mais", "plus"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ich", "mit", "ein",
           "eine", "sie", "von", "auf", "auch", "dem", "den", "werden"),
    "es": ("el", "los", "las", "es", "en", "que", "de", "un", "una", "para",
           "con", "por", "se", "no", "como", "su", "del", "pero"),
}

_LANG_RES: dict[str, re.Pattern[str]] = {
    lang: re.compile(r"\b(" + "|".join(words) + r")\b", re.IGNORECASE)
    for lang, words in _STOPWORDS.items()
}
_TOKEN_RE = re.compile(r"\S+")
_CJK_RE = re.compile(r"[一-鿿぀-ヿ가-힯]")

MIN_TOKENS_FOR_LANGID = 5


def detect_lang_batch(texts: pd.Series) -> pd.Series:
    """Vectorized language guess: one of en/fr/de/es/cjk/unknown/short."""
    s = texts.fillna("")
    n_tokens = s.str.count(_TOKEN_RE)
    n_chars = s.str.len().clip(lower=1)
    cjk_ratio = s.str.count(_CJK_RE) / n_chars

    hit_matrix = np.stack(
        [(s.str.count(_LANG_RES[lang]) / n_tokens.clip(lower=1)).to_numpy() for lang in LANGS]
    )  # shape (n_langs, n_rows)
    best_idx = hit_matrix.argmax(axis=0)  # ties -> lowest index == LANGS order
    best_score = hit_matrix.max(axis=0)

    lang = pd.Series(np.array(LANGS, dtype=object)[best_idx], index=s.index)
    lang = lang.mask(best_score <= 0.0, "unknown")
    lang = lang.mask(cjk_ratio.to_numpy() > 0.2, "cjk")
    lang = lang.mask(n_tokens.to_numpy() < MIN_TOKENS_FOR_LANGID, "short")
    return lang.astype(object)


# ---------------------------------------------------------------------------
# Perplexity (char-bigram, add-one smoothing over the 27-symbol alphabet)
# ---------------------------------------------------------------------------

# Frozen training corpus (plain English; what matters is that it is embedded,
# deterministic, and produces a usable bigram table — not its literary merit).
_TRAIN_CORPUS = (
    "the quick brown fox jumps over the lazy dog and then the dog chased the "
    "fox through the green field while the sun was setting over the hills in "
    "the distance people often say that practice makes perfect and that time "
    "heals all wounds but the truth is that careful attention to detail and a "
    "willingness to learn from mistakes will carry you further than talent "
    "alone the engineers reviewed the data pipeline and found that the "
    "aggregation step was reading far more columns than it needed so they "
    "added a projection and the query ran twice as fast language models "
    "estimate the probability of a sequence of words and a simple character "
    "model can still tell fluent text apart from random keyboard mashing the "
    "committee agreed to meet again next week to discuss the proposal and "
    "everyone went home satisfied that progress had been made it was a bright "
    "cold day in april and the clocks were striking thirteen all happy "
    "families are alike each unhappy family is unhappy in its own way"
)

_ALPHABET_SIZE = 27  # a-z + space
_NON_ALPHA_RE = re.compile(r"[^a-z ]+")
_SPACE_RUN_RE = re.compile(r" {2,}")


def _char_indices(text: str) -> np.ndarray:
    cleaned = _SPACE_RUN_RE.sub(" ", _NON_ALPHA_RE.sub(" ", text.lower()))
    arr = np.frombuffer(cleaned.encode("ascii", "replace"), dtype=np.uint8).astype(np.int64)
    idx = arr - ord("a")
    idx[(idx < 0) | (idx > 25)] = 26  # space & anything residual
    return idx


def _train_bigram_logprobs() -> np.ndarray:
    idx = _char_indices(_TRAIN_CORPUS)
    counts = np.ones((_ALPHABET_SIZE, _ALPHABET_SIZE), dtype=np.float64)  # add-one
    np.add.at(counts, (idx[:-1], idx[1:]), 1.0)
    return np.log(counts / counts.sum(axis=1, keepdims=True))


_BIGRAM_LP = _train_bigram_logprobs()

MIN_ALPHA_CHARS_FOR_PPL = 20


def perplexity_batch(texts: pd.Series) -> pd.Series:
    """Vectorized char-bigram perplexity. Rows with <2 usable chars -> 1.0.

    The whole batch is scored as one flat numpy array with row-boundary
    masking + ``np.add.reduceat`` — no per-row Python loop.
    """
    s = (
        texts.fillna("")
        .str.lower()
        .str.replace(_NON_ALPHA_RE, " ", regex=True)
        .str.replace(_SPACE_RUN_RE, " ", regex=True)
    )
    lengths = s.str.len().to_numpy(dtype=np.int64)
    n = len(s)
    if n == 0:
        return pd.Series([], dtype=np.float64, index=texts.index)

    blob = "".join(s.tolist())
    if not blob:
        return pd.Series(np.ones(n), index=texts.index)

    arr = np.frombuffer(blob.encode("ascii", "replace"), dtype=np.uint8).astype(np.int64)
    idx = arr - ord("a")
    idx[(idx < 0) | (idx > 25)] = 26

    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:]) if n > 1 else None
    ends = starts + lengths

    # bigram (i, i+1) is valid iff i+1 is not the first char of the next row
    lp = np.zeros(len(arr), dtype=np.float64)
    if len(arr) >= 2:
        lp[:-1] = _BIGRAM_LP[idx[:-1], idx[1:]]
    valid = np.ones(len(arr), dtype=bool)
    valid[ends - 1] = False  # last char of each row starts no bigram
    lp = lp * valid

    # per-row sums; reduceat needs strictly valid offsets (empty rows share
    # offsets with their successor — reduceat handles equal offsets by
    # returning the element there, so zero those rows after).
    offsets = np.minimum(starts, len(arr) - 1)
    rowsum = np.add.reduceat(lp, offsets) if len(arr) else np.zeros(n)
    nbig = np.maximum(lengths - 1, 0)
    rowsum = np.where(nbig > 0, rowsum, 0.0)
    ppl = np.where(nbig > 0, np.exp(-rowsum / np.maximum(nbig, 1)), 1.0)
    return pd.Series(ppl, index=texts.index)
