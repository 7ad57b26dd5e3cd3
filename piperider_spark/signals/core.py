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

# Frozen langid spec (v2):
#   * normalization: lower(), then every char outside [a-z'] becomes a space
#     (so word matching needs no IGNORECASE and \b ≡ space boundary);
#   * tokens: maximal [a-z']+ runs of the normalized text;
#   * hits: whole-word stopword matches against ONE combined pattern with
#     one named group per language — on a word in several languages' lists
#     the FIRST group in LANGS order wins (deterministic priority);
#   * score(lang) = hits / max(tokens, 1); argmax, ties → LANGS order;
#   * label: best score <= 0 → 'unknown'; < 5 tokens → 'short' (too little
#     evidence; exempt from the non-English rule); CJK char density > 0.2 of
#     raw chars → 'cjk' (checked last — CJK text has few latin tokens).
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

_COMBINED_LANG_RE = re.compile(
    rb"\b(?:"
    + b"|".join(
        f"(?P<{lang}>".encode() + "|".join(_STOPWORDS[lang]).encode() + b")" for lang in LANGS
    )
    + rb")\b"
)
_GROUP_ID = {lang: i for i, lang in enumerate(LANGS)}
_CJK_RE = re.compile(r"[一-鿿぀-ヿ가-힯]")

# Byte-level normalization table over the UTF-8 encoding: a-z and the ASCII
# apostrophe survive, A-Z lowercase, the \x00 row separator survives, every
# other byte (incl. all non-ASCII lead/continuation bytes) becomes a space.
# One bytes.translate call normalizes the whole batch at memcpy speed.
_NORM_TABLE = bytes(
    b if (ord("a") <= b <= ord("z")) or b == ord("'") or b == 0
    else (b + 32 if ord("A") <= b <= ord("Z") else ord(" "))
    for b in range(256)
)

MIN_TOKENS_FOR_LANGID = 5


def _detect_lang_serial(text: str | None) -> str:
    """Reference serial implementation of the frozen spec (one row).

    Used as the fallback when a row contains the blob separator, and by
    tests to pin the batched implementation."""
    raw = text or ""
    n_chars = max(len(raw), 1)
    cjk = len(_CJK_RE.findall(raw))
    norm = raw.replace("\x00", " ").encode("utf-8", "surrogatepass").translate(_NORM_TABLE)
    n_tokens = len(re.findall(rb"[a-z']+", norm))
    hits = [0] * len(LANGS)
    for m in _COMBINED_LANG_RE.finditer(norm):
        hits[_GROUP_ID[m.lastgroup]] += 1
    scores = [h / max(n_tokens, 1) for h in hits]
    best = max(range(len(LANGS)), key=lambda i: (scores[i], -i))
    label = LANGS[best] if scores[best] > 0 else "unknown"
    if n_tokens < MIN_TOKENS_FOR_LANGID:
        label = "short"
    if cjk / n_chars > 0.2:
        label = "cjk"
    return label


def detect_lang_batch(texts: pd.Series) -> pd.Series:
    """Vectorized language guess: one of en/fr/de/es/cjk/unknown/short.

    Implementation: all rows are joined into one '\\x00'-separated UTF-8
    byte blob; normalization is one bytes.translate (memcpy speed), token
    runs are counted with pure numpy boolean algebra, and the combined
    stopword pattern runs ONCE over the blob with matches binned back to
    rows via searchsorted — the per-executor hot path of the langid UDF.
    """
    s = texts.fillna("")
    vals = s.tolist()
    n = len(vals)
    if n == 0:
        return pd.Series([], dtype=object, index=texts.index)
    if any("\x00" in v for v in vals):  # separator char in data → serial path
        return s.map(_detect_lang_serial)
    raw_blob = "\x00".join(vals)

    lengths = np.fromiter((len(v) for v in vals), dtype=np.int64, count=n)
    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(lengths[:-1] + 1, out=starts[1:])

    # CJK density on the raw blob (few matches; finditer loop is cheap)
    cjk_pos = np.fromiter(
        (m.start() for m in _CJK_RE.finditer(raw_blob)), dtype=np.int64, count=-1
    )
    cjk_counts = (
        np.bincount(np.searchsorted(starts, cjk_pos, side="right") - 1, minlength=n)
        if len(cjk_pos)
        else np.zeros(n, dtype=np.int64)
    )
    cjk_ratio = cjk_counts / np.maximum(lengths, 1)

    norm_b = raw_blob.encode("utf-8", "surrogatepass").translate(_NORM_TABLE)
    arr = np.frombuffer(norm_b, dtype=np.uint8)
    sep = np.flatnonzero(arr == 0)

    # token counts: run-starts of non-space bytes, pure numpy
    istok = (arr != ord(" ")) & (arr != 0)
    run_start = istok.copy()
    run_start[1:] &= ~istok[:-1]
    tok_pos = np.flatnonzero(run_start)
    n_tokens = (
        np.bincount(np.searchsorted(sep, tok_pos, side="right"), minlength=n)
        if len(tok_pos)
        else np.zeros(n, dtype=np.int64)
    )

    # stopword hits: ONE combined scan; named group → language
    matches = [(m.start(), _GROUP_ID[m.lastgroup]) for m in _COMBINED_LANG_RE.finditer(norm_b)]
    hit_matrix = np.zeros((len(LANGS), n), dtype=np.int64)
    if matches:
        pos = np.fromiter((p for p, _g in matches), dtype=np.int64, count=len(matches))
        gid = np.fromiter((g for _p, g in matches), dtype=np.int64, count=len(matches))
        rows = np.searchsorted(sep, pos, side="right")
        np.add.at(hit_matrix, (gid, rows), 1)

    score = hit_matrix / np.maximum(n_tokens, 1)
    best_idx = score.argmax(axis=0)  # ties → lowest index == LANGS order
    best_score = score.max(axis=0)

    lang = np.array(LANGS, dtype=object)[best_idx]
    lang[best_score <= 0.0] = "unknown"
    lang[n_tokens < MIN_TOKENS_FOR_LANGID] = "short"
    lang[cjk_ratio > 0.2] = "cjk"
    return pd.Series(lang, index=texts.index, dtype=object)


# ---------------------------------------------------------------------------
# Token stats (whitespace tokens; feeds the repetition rule)
# ---------------------------------------------------------------------------

# Frozen token spec: tokens are maximal \S+ runs (unicode whitespace
# delimits) of the lowercased text; repetition = 1 - distinct/max(n,1).
_WS_TOKEN_RE = re.compile(r"\S+")


def _token_stats_serial(text: str | None) -> tuple[int, float]:
    toks = _WS_TOKEN_RE.findall((text or "").lower())
    n = len(toks)
    return n, 1.0 - len(set(toks)) / max(n, 1)


def token_stats_batch(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (n_tokens, repetition_ratio) per row.

    One lowercase blob joined on '\\x0b' (vertical tab: whitespace for \\S+,
    essentially absent from real text — rows containing it take the serial
    path); tokens come from one C findall, per-row distinct counts from
    factorize + unique over (row, token_code) pairs. Replaces the JVM-side
    split/array_distinct expressions, whose string allocations cost more
    than both model signals combined.
    """
    s = texts.fillna("")
    vals = s.tolist()
    n = len(vals)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    if any("\x0b" in v for v in vals):
        pairs = [_token_stats_serial(v) for v in vals]
        return (
            np.array([p[0] for p in pairs], dtype=np.int64),
            np.array([p[1] for p in pairs]),
        )
    blob = "\x0b".join(vals).lower()

    toks = _WS_TOKEN_RE.findall(blob)
    # per-row token counts via the marker trick: after substituting every
    # token with \x01, remaining bytes are whitespace only, so the \x0b
    # separator byte (one byte in UTF-8) and the markers are unambiguous
    marked = _WS_TOKEN_RE.sub("\x01", blob).encode("utf-8", "surrogatepass")
    arr = np.frombuffer(marked, dtype=np.uint8)
    sep = np.flatnonzero(arr == 0x0B)
    marks = np.flatnonzero(arr == 0x01)
    n_tok = np.bincount(np.searchsorted(sep, marks, side="right"), minlength=n)

    if toks:
        codes, uniques = pd.factorize(np.array(toks, dtype=object), sort=False)
        row_ids = np.repeat(np.arange(n, dtype=np.int64), n_tok)
        key = row_ids * np.int64(len(uniques)) + codes
        uniq_rows = np.unique(key) // np.int64(len(uniques))
        n_distinct = np.bincount(uniq_rows, minlength=n)
    else:
        n_distinct = np.zeros(n, dtype=np.int64)
    rep = 1.0 - n_distinct / np.maximum(n_tok, 1)
    return n_tok.astype(np.int64), rep


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
_NON_ALPHA_X_RE = re.compile(r"[^a-z \x00]+")  # blob variant: keeps row separator
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
# float32 flat view for the batched gather; scoring in float32 is part of
# the frozen spec (oracle and UDF share this module, so values agree
# bit-for-bit on both sides)
_BIGRAM_LP_FLAT32 = _BIGRAM_LP.astype(np.float32).ravel()

MIN_ALPHA_CHARS_FOR_PPL = 20


def perplexity_batch(texts: pd.Series) -> pd.Series:
    """Vectorized char-bigram perplexity. Rows with <2 usable chars -> 1.0.

    The whole batch is scored as one flat numpy array with row-boundary
    masking + ``np.add.reduceat`` — no per-row Python loop.
    """
    n = len(texts)
    if n == 0:
        return pd.Series([], dtype=np.float64, index=texts.index)

    # One blob, '\x00'-separated: lower() once, the two cleaning regexes run
    # once at C speed. '\x00' is excluded from both pattern classes, so runs
    # never merge across rows — per-row results are byte-identical to the
    # serial definition (NON_ALPHA→' ' then collapse space runs). Content
    # NULs are pre-mapped to spaces, which the spec does anyway (any
    # non-[a-z ] run → one space; splitting a run with a space collapses
    # back to one space), so they can't masquerade as row separators.
    vals_p = texts.fillna("").tolist()
    if any("\x00" in v for v in vals_p):
        vals_p = [v.replace("\x00", " ") for v in vals_p]
    raw = "\x00".join(vals_p).lower()
    cleaned = _SPACE_RUN_RE.sub(" ", _NON_ALPHA_X_RE.sub(" ", raw))
    rows = cleaned.split("\x00")
    lengths = np.fromiter((len(r) for r in rows), dtype=np.int64, count=n)

    blob = "".join(rows)
    if not blob:
        return pd.Series(np.ones(n), index=texts.index)

    # narrow dtypes throughout: int16 codes + a float32 flat table keep the
    # 30M-element intermediates ~8× smaller (large-allocation gathers are
    # pathologically slow on this host)
    arr = np.frombuffer(blob.encode("ascii", "replace"), dtype=np.uint8)
    idx = arr.astype(np.int16)
    idx -= ord("a")
    idx[(idx < 0) | (idx > 25)] = 26

    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:]) if n > 1 else None
    ends = starts + lengths

    # bigram (i, i+1) is valid iff i+1 is not the first char of the next row
    lp = np.zeros(len(arr), dtype=np.float32)
    if len(arr) >= 2:
        code = idx[:-1] * np.int16(_ALPHABET_SIZE)
        code += idx[1:]
        lp[:-1] = _BIGRAM_LP_FLAT32[code]
    lp[ends - 1] = 0.0  # last char of each row starts no bigram

    # per-row sums; reduceat needs strictly valid offsets (empty rows share
    # offsets with their successor — reduceat handles equal offsets by
    # returning the element there, so zero those rows after).
    offsets = np.minimum(starts, len(arr) - 1)
    rowsum = np.add.reduceat(lp, offsets) if len(arr) else np.zeros(n)
    nbig = np.maximum(lengths - 1, 0)
    rowsum = np.where(nbig > 0, rowsum, 0.0)
    ppl = np.where(nbig > 0, np.exp(-rowsum / np.maximum(nbig, 1)), 1.0)
    return pd.Series(ppl, index=texts.index)
