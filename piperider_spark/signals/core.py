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

# Frozen langid spec (v3) — one shared token stream for ALL text signals:
#   * tokens: maximal \S+ runs of the per-row lowercased text (identical to
#     the repetition rule's token spec);
#   * token language: strip every char outside [a-z'] from the token, look
#     the result up in the merged stopword table — a word in several
#     languages' lists belongs to the FIRST language in LANGS order
#     (deterministic priority); at most one hit per token;
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

_STOPWORD_LANG: dict[str, int] = {}
for _i, _lang in enumerate(LANGS):
    for _w in _STOPWORDS[_lang]:
        _STOPWORD_LANG.setdefault(_w, _i)  # first language in LANGS order wins

_TOKEN_NORM_RE = re.compile(r"[^a-z']+")  # strip punctuation/digits from a token
_CJK_RE = re.compile(r"[一-鿿぀-ヿ가-힯]")
_WS_TOKEN_RE = re.compile(r"\S+")  # the token spec: maximal non-whitespace runs
# The 19 non-ASCII characters Python's \s matches (== str.isspace(); parity
# asserted in tests). When a batch contains NONE of these, token-run
# boundaries are decidable on the UTF-8 bytes alone (ASCII whitespace is
# 9-13, 28-31, 32; continuation/lead bytes ≥ 0x80 are always token chars),
# which lets the per-row token COUNT come from a numpy scan instead of a
# second full regex substitution pass over the blob.
_NON_ASCII_WS_RE = re.compile(
    "[\x85\xa0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]"
)

MIN_TOKENS_FOR_LANGID = 5


def _lang_label(hits: list[int], n_tokens: int, cjk: int, n_chars: int) -> str:
    scores = [h / max(n_tokens, 1) for h in hits]
    best = max(range(len(LANGS)), key=lambda i: (scores[i], -i))
    label = LANGS[best] if scores[best] > 0 else "unknown"
    if n_tokens < MIN_TOKENS_FOR_LANGID:
        label = "short"
    if cjk / max(n_chars, 1) > 0.2:
        label = "cjk"
    return label


def _detect_lang_serial(text: str | None) -> str:
    """Reference serial implementation of the frozen spec (one row). Used as
    the fallback when a row contains the blob separator, and by tests to pin
    the batched implementation."""
    raw = text or ""
    toks = _WS_TOKEN_RE.findall(raw.lower())
    hits = [0] * len(LANGS)
    for t in toks:
        li = _STOPWORD_LANG.get(_TOKEN_NORM_RE.sub("", t), -1)
        if li >= 0:
            hits[li] += 1
    return _lang_label(hits, len(toks), len(_CJK_RE.findall(raw)), len(raw))


# ---------------------------------------------------------------------------
# Shared tokenization (feeds langid, repetition and the fused signal UDF)
# ---------------------------------------------------------------------------


# The EXACT Python \s character set (== str.isspace(); class-membership
# parity with both is pinned in tests), as literal codepoints — RE2 has no
# \uXXXX escapes. Used by the Arrow tokenizer so its token boundaries are
# byte-identical to findall(r'\S+') / str.split().
_PY_WS_CHARS = (
    "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)
_PA_WS_PATTERN = "[" + _PY_WS_CHARS + "]+"


def _tokenize_encoded(
    vals: list[str],
) -> tuple[np.ndarray, list[str], np.ndarray, np.ndarray] | None:
    """(codes, uniques, row_ids, n_tok) via Arrow C++ split + dictionary
    encode — the token stream never materializes as per-token Python
    strings (the old path allocated ~65 PyObjects/row; at 8+ cores that
    allocator traffic is the main shared-memory pressure). Only the few
    thousand UNIQUE tokens cross into Python, for the stopword lookup.

    Token spec is unchanged and parity-pinned: split on the exact Python
    \\s set (``_PA_WS_PATTERN``), drop empty splits == findall(r'\\S+') of
    the per-row lowercased text. Rows are still lowercased in Python
    (str.lower has context edge cases utf8proc may treat differently).
    Returns None when Arrow cannot represent the batch (lone surrogates) —
    callers fall back to :func:`_tokenize_batch`, then serial.
    """
    arr = _lowered_arrow([v.lower() for v in vals])
    if arr is None:
        return None
    return _tokenize_encoded_from_arrow(arr, len(vals))


def _lowered_arrow(lowered: list[str]):
    """Arrow string array of pre-lowered rows, or None when Arrow cannot
    represent the batch (lone surrogates)."""
    try:
        import pyarrow as pa

        return pa.array(lowered, type=pa.string())
    except Exception:
        return None


def _tokenize_encoded_from_arrow(
    arr, n: int
) -> tuple[np.ndarray, list[str], np.ndarray, np.ndarray]:
    import pyarrow.compute as pc

    lst = pc.split_pattern_regex(arr, pattern=_PA_WS_PATTERN)
    counts = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lst)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
    nonempty = pc.not_equal(flat, "")
    mask = nonempty.to_numpy(zero_copy_only=False)
    if not mask.all():
        flat = flat.filter(nonempty)
        row_ids = row_ids[mask]
    d = pc.dictionary_encode(flat)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    n_tok = np.bincount(row_ids, minlength=n).astype(np.int64)
    return codes, d.dictionary.to_pylist(), row_ids, n_tok


def _encoded_token_stream(
    vals: list[str],
) -> tuple[np.ndarray, list[str], np.ndarray, np.ndarray] | None:
    """Unified encoded token stream (codes, uniques, row_ids, n_tok):
    Arrow C++ path first (no per-token Python objects), then the joined-blob
    split+factorize path, else None → caller goes fully serial. All three
    produce the identical stream (hypothesis-pinned vs the serial spec)."""
    enc = _tokenize_encoded(vals)
    if enc is not None:
        return enc
    tk = _tokenize_batch(vals)
    if tk is None:
        return None
    toks, n_tok = tk
    if toks:
        codes, uniques = pd.factorize(np.array(toks, dtype=object), sort=False)
        uniq_list = list(uniques)
        row_ids = np.repeat(np.arange(len(vals), dtype=np.int64), n_tok)
    else:
        codes = np.zeros(0, dtype=np.int64)
        uniq_list = []
        row_ids = np.zeros(0, dtype=np.int64)
    return codes.astype(np.int64, copy=False), uniq_list, row_ids, n_tok


def _tokenize_batch(vals: list[str]) -> tuple[list[str], np.ndarray] | None:
    """(all tokens in row order, per-row token counts) for a list of rows.

    Rows are lowercased individually (str.lower is context-sensitive at row
    edges — final sigma), joined on '\\x0b' (vertical tab: whitespace for
    \\S+, essentially absent from real text), tokenized with ONE C-level
    str.split() (== findall(r'\\S+'), parity-pinned); per-row counts come
    from a numpy byte scan when possible, else the marker trick (every
    token substituted with \\x01 leaves only whitespace + separators, all
    single bytes in UTF-8).
    Returns None when a row contains the separator OR a NUL byte → caller
    goes serial (pandas' factorize hashes C strings, so tokens differing
    only after a NUL would collide).
    """
    if any("\x0b" in v or "\x00" in v for v in vals):
        return None
    lowered = [v.lower() for v in vals]
    blob = "\x0b".join(lowered)
    # str.split() == findall(r'\S+'): both split on the str.isspace() set,
    # which is exactly \s (test-pinned); split() is ~3.5x faster at C level
    # (no match-object machinery). Equivalence pinned by
    # test_split_equals_findall_token_spec.
    toks = blob.split()
    if _NON_ASCII_WS_RE.search(blob) is None:
        # Fast count: with only ASCII whitespace present, token runs are
        # decidable on the UTF-8 bytes (whitespace = 9-13, 28-31, 32;
        # bytes ≥ 0x80 always belong to tokens). A token starts at a
        # non-whitespace byte at position 0 or preceded by whitespace —
        # one numpy pass instead of the full-blob marker substitution
        # (measured 1.2 s per 100k rows, ~45% of tokenize cost).
        arr = np.frombuffer(blob.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        is_ws = ((arr >= 9) & (arr <= 13)) | ((arr >= 28) & (arr <= 32))
        tok_start = ~is_ws
        tok_start[1:] &= is_ws[:-1]
        starts_pos = np.flatnonzero(tok_start)
        if len(starts_pos) == len(toks):  # belt-and-braces vs findall
            sep = np.flatnonzero(arr == 0x0B)
            n_tok = np.bincount(
                np.searchsorted(sep, starts_pos, side="right"), minlength=len(vals)
            )
            return toks, n_tok.astype(np.int64)
    # general path: the marker trick (every token substituted with \x01
    # leaves only whitespace + separators, all single bytes in UTF-8)
    marked = _WS_TOKEN_RE.sub("\x01", blob).encode("utf-8", "surrogatepass")
    arr = np.frombuffer(marked, dtype=np.uint8)
    sep = np.flatnonzero(arr == 0x0B)
    marks = np.flatnonzero(arr == 0x01)
    n_tok = np.bincount(np.searchsorted(sep, marks, side="right"), minlength=len(vals))
    return toks, n_tok.astype(np.int64)


def _lang_hit_matrix(
    codes: np.ndarray, uniques, row_ids: np.ndarray, n: int
) -> np.ndarray:
    """Per-row stopword hits by language, from factorized tokens: normalize
    and classify each UNIQUE token once (a few thousand per batch), then
    gather + bincount over the full token stream."""
    lang_of_unique = np.fromiter(
        (
            _STOPWORD_LANG.get(_TOKEN_NORM_RE.sub("", u), -1)
            for u in uniques
        ),
        dtype=np.int64,
        count=len(uniques),
    )
    tok_lang = lang_of_unique[codes]
    hit_matrix = np.zeros((len(LANGS), n), dtype=np.int64)
    mask = tok_lang >= 0
    if mask.any():
        np.add.at(hit_matrix, (tok_lang[mask], row_ids[mask]), 1)
    return hit_matrix


def _cjk_ratio_batch(vals: list[str]) -> np.ndarray:
    """Per-row CJK character density (CJK chars / raw chars). One finditer
    over the '\\x0b'-joined raw blob (callers have already verified no row
    contains the separator); CJK matches are rare so the match loop is
    cheap."""
    n = len(vals)
    lengths = np.fromiter((len(v) for v in vals), dtype=np.int64, count=n)
    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(lengths[:-1] + 1, out=starts[1:])
    blob = "\x0b".join(vals)
    pos = np.fromiter(
        (m.start() for m in _CJK_RE.finditer(blob)), dtype=np.int64, count=-1
    )
    counts = (
        np.bincount(np.searchsorted(starts, pos, side="right") - 1, minlength=n)
        if len(pos)
        else np.zeros(n, dtype=np.int64)
    )
    return counts / np.maximum(lengths, 1)


def _labels_from_parts(
    hit_matrix: np.ndarray, n_tok: np.ndarray, cjk_ratio: np.ndarray
) -> np.ndarray:
    score = hit_matrix / np.maximum(n_tok, 1)
    best_idx = score.argmax(axis=0)  # ties → lowest index == LANGS order
    best_score = score.max(axis=0)
    lang = np.array(LANGS, dtype=object)[best_idx]
    lang[best_score <= 0.0] = "unknown"
    lang[n_tok < MIN_TOKENS_FOR_LANGID] = "short"
    lang[cjk_ratio > 0.2] = "cjk"
    return lang


def detect_lang_batch(texts: pd.Series) -> pd.Series:
    """Vectorized language guess: one of en/fr/de/es/cjk/unknown/short.

    Tokens come from one C findall over the joined batch; each UNIQUE token
    is normalized and looked up once (factorize) — no regex scan over the
    full text for stopwords at all. This is the per-executor hot path of
    the langid UDF; the fused :func:`text_signals_batch` shares the token
    stream with the repetition stats.
    """
    s = texts.fillna("")
    vals = s.tolist()
    n = len(vals)
    if n == 0:
        return pd.Series([], dtype=object, index=texts.index)
    enc = _encoded_token_stream(vals)
    if enc is None:
        return s.map(_detect_lang_serial)
    codes, uniques, row_ids, n_tok = enc
    hit_matrix = _lang_hit_matrix(codes, uniques, row_ids, n)
    lang = _labels_from_parts(hit_matrix, n_tok, _cjk_ratio_batch(vals))
    return pd.Series(lang, index=texts.index, dtype=object)


# ---------------------------------------------------------------------------
# Token stats (whitespace tokens; feeds the repetition rule)
# ---------------------------------------------------------------------------

# Frozen token spec: tokens are maximal \S+ runs (unicode whitespace
# delimits) of the lowercased text; repetition = 1 - distinct/max(n,1).


def _token_stats_serial(text: str | None) -> tuple[int, float]:
    toks = _WS_TOKEN_RE.findall((text or "").lower())
    n = len(toks)
    return n, 1.0 - len(set(toks)) / max(n, 1)


def _distinct_counts(
    codes: np.ndarray, n_uniques: int, row_ids: np.ndarray, n: int
) -> np.ndarray:
    nu = np.int64(max(n_uniques, 1))  # empty stream: avoid //0 on the empty array
    key = row_ids * nu + codes
    uniq_rows = np.unique(key) // nu
    return np.bincount(uniq_rows, minlength=n)


def token_stats_batch(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (n_tokens, repetition_ratio) per row: one findall + one
    factorize + unique over (row, token_code) pairs. Replaces the JVM-side
    split/array_distinct expressions, whose string allocations cost more
    than both model signals combined."""
    s = texts.fillna("")
    vals = s.tolist()
    n = len(vals)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    enc = _encoded_token_stream(vals)
    if enc is None:
        pairs = [_token_stats_serial(v) for v in vals]
        return (
            np.array([p[0] for p in pairs], dtype=np.int64),
            np.array([p[1] for p in pairs]),
        )
    codes, uniques, row_ids, n_tok = enc
    n_distinct = _distinct_counts(codes, len(uniques), row_ids, n)
    rep = 1.0 - n_distinct / np.maximum(n_tok, 1)
    return n_tok, rep


def text_signals_batch(texts: pd.Series) -> dict[str, object]:
    """lang + n_tok + rep_ratio from ONE tokenize + ONE factorize (the fused
    path the process UDF uses; perplexity is separate — char-level)."""
    s = texts.fillna("")
    vals = s.tolist()
    n = len(vals)
    if n == 0:
        empty = np.zeros(0)
        return {"lang": pd.Series([], dtype=object, index=texts.index),
                "n_tok": empty.astype(np.int64), "rep_ratio": empty}
    enc = _encoded_token_stream(vals)
    if enc is None:
        pairs = [_token_stats_serial(v) for v in vals]
        return {
            "lang": s.map(_detect_lang_serial),
            "n_tok": np.array([p[0] for p in pairs], dtype=np.int64),
            "rep_ratio": np.array([p[1] for p in pairs]),
        }
    codes, uniques, row_ids, n_tok = enc
    hit_matrix = _lang_hit_matrix(codes, uniques, row_ids, n)
    n_distinct = _distinct_counts(codes, len(uniques), row_ids, n)
    lang = _labels_from_parts(hit_matrix, n_tok, _cjk_ratio_batch(vals))
    rep = 1.0 - n_distinct / np.maximum(n_tok, 1)
    return {
        "lang": pd.Series(lang, index=texts.index, dtype=object),
        "n_tok": n_tok,
        "rep_ratio": rep,
    }


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


def _ppl_clean_regex(vals_p: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """REFERENCE cleaner (the frozen spec, verbatim): lower → replace every
    non-[a-z ] run with a space → collapse space runs, per row. Returns
    (int16 alphabet codes for the concatenated cleaned rows, per-row cleaned
    lengths). One '\\x00'-joined blob: '\\x00' is excluded from both pattern
    classes, so runs never merge across rows — per-row results are
    byte-identical to the serial definition. Kept as the parity pin for the
    byte-level fast cleaner (test_ppl_cleaners_agree)."""
    n = len(vals_p)
    raw = "\x00".join(vals_p).lower()
    cleaned = _SPACE_RUN_RE.sub(" ", _NON_ALPHA_X_RE.sub(" ", raw))
    rows = cleaned.split("\x00")
    lengths = np.fromiter((len(r) for r in rows), dtype=np.int64, count=n)
    blob = "".join(rows)
    arr = np.frombuffer(blob.encode("ascii", "replace"), dtype=np.uint8)
    idx = arr.astype(np.int16)
    idx -= ord("a")
    idx[(idx < 0) | (idx > 25)] = 26
    return idx, lengths

def _ppl_clean_bytes(vals_p: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Byte-level cleaner, exactly equivalent to :func:`_ppl_clean_regex`
    (~8× cheaper: no regex passes, no re-join, no second encode).

    Equivalence argument: the blob is lowered FIRST (str.lower, full
    unicode), so every kept character is ASCII a-z = one byte; every other
    character — including each byte of a multi-byte UTF-8 sequence, all
    ≥ 0x80 — is a non-letter byte. A maximal run of non-letter chars is
    therefore exactly a maximal run of non-letter bytes, and the spec maps
    each such run (spaces included) to ONE space. '\\x00' row separators
    break runs on both sides, matching the regex classes that exclude
    '\\x00'. Pinned against the regex cleaner by test_ppl_cleaners_agree."""
    n = len(vals_p)
    raw = "\x00".join(vals_p).lower()
    arr = np.frombuffer(raw.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    letter = (arr >= 97) & (arr <= 122)
    nul = arr == 0
    other = ~(letter | nul)
    # keep a non-letter byte only at the head of its run (prev is letter,
    # separator, or blob start) — run-collapse in one vector pass
    prev_other = np.empty(len(arr), dtype=bool)
    if len(arr):
        prev_other[0] = False
        prev_other[1:] = other[:-1]
    keep = letter | nul | (other & ~prev_other)
    kept = arr[keep]
    sep_pos = np.flatnonzero(kept == 0)
    bounds = np.concatenate(
        [np.int64([-1]), sep_pos, np.int64([len(kept)])]
    )
    lengths = np.diff(bounds) - 1  # the -1/len sentinels make every row
    # (first, middle, last) the same "between separators" case
    idx = kept[kept != 0].astype(np.int16)
    idx -= ord("a")
    idx[(idx < 0) | (idx > 25)] = 26
    return idx, lengths.astype(np.int64)

def perplexity_batch(texts: pd.Series) -> pd.Series:
    """Vectorized char-bigram perplexity. Rows with <2 usable chars -> 1.0.

    The whole batch is cleaned byte-level (:func:`_ppl_clean_bytes`) and
    scored as one flat numpy array with row-boundary masking + a per-row
    ``np.bincount`` accumulation — no per-row Python loop, and each row's
    float accumulation order is fixed regardless of what shares the batch
    (scores are partition-independent by construction). Content NULs are
    pre-mapped to spaces, which the spec does anyway (any non-[a-z ] run →
    one space; splitting a run with a space collapses back to one space),
    so they can't masquerade as row separators.
    """
    n = len(texts)
    if n == 0:
        return pd.Series([], dtype=np.float64, index=texts.index)

    vals_p = texts.fillna("").tolist()
    if any("\x00" in v for v in vals_p):
        vals_p = [v.replace("\x00", " ") for v in vals_p]
    # narrow dtypes throughout: int16 codes + a float32 flat table keep the
    # 30M-element intermediates ~8× smaller (large-allocation gathers are
    # pathologically slow on this host)
    idx, lengths = _ppl_clean_bytes(vals_p)
    return _ppl_score(idx, lengths, n, texts.index)


def _ppl_score(idx: np.ndarray, lengths: np.ndarray, n: int, index) -> pd.Series:
    """Score cleaned (idx, per-row lengths) — shared by the joined-blob and
    Arrow-buffer cleaners (identical math, parity-pinned)."""
    if not len(idx):
        return pd.Series(np.ones(n), index=index)

    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:]) if n > 1 else None
    ends = starts + lengths

    # bigram (i, i+1) is valid iff i+1 is not the first char of the next row
    lp = np.zeros(len(idx), dtype=np.float32)
    if len(idx) >= 2:
        code = idx[:-1] * np.int16(_ALPHABET_SIZE)
        code += idx[1:]
        lp[:-1] = _BIGRAM_LP_FLAT32[code]
    lp[ends - 1] = 0.0  # last char of each row starts no bigram

    # per-row sums via bincount: a single in-order pass that accumulates each
    # row's own lp values sequentially into a float64 slot. The result for a
    # row depends ONLY on that row's elements and their order — NOT on batch
    # composition. (np.add.reduceat is pairwise over float32: the pairing
    # tree changes with segment length, so the offset clamp for trailing
    # empty rows shifted row sums by 1 ulp depending on the rows that
    # happened to share the batch — a partition-dependent score.)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), lengths)
    rowsum = np.bincount(row_ids, weights=lp, minlength=n)
    nbig = np.maximum(lengths - 1, 0)
    rowsum = np.where(nbig > 0, rowsum, 0.0)
    ppl = np.where(nbig > 0, np.exp(-rowsum / np.maximum(nbig, 1)), 1.0)
    return pd.Series(ppl, index=index)


def _ppl_clean_arrow(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow-buffer twin of :func:`_ppl_clean_bytes`: consumes the lowered
    string array's UTF-8 buffer directly (offsets are the row bounds — no
    join, no second lower, no re-encode). Semantics identical and
    parity-pinned: kept bytes = letters + one head byte per non-letter run,
    runs never span rows; content NULs are non-letter bytes and merge into
    runs exactly like the blob path's NUL→space premapping."""
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(arr) + 1)
    total = int(offs[-1])
    if total == 0:
        return np.zeros(0, dtype=np.int16), np.zeros(len(arr), dtype=np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8, count=total)
    letter = (data >= 97) & (data <= 122)
    other = ~letter
    prev_other = np.empty(total, dtype=bool)
    prev_other[0] = False
    prev_other[1:] = other[:-1]
    row_starts = offs[:-1]
    prev_other[row_starts[row_starts < total]] = False  # runs break at rows
    keep = letter | (other & ~prev_other)
    kept = data[keep]
    # per-row kept counts via one cumsum indexed at the row offsets (no
    # per-kept-byte searchsorted — that cost more than the join it saved)
    c = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(keep, out=c[1:])
    lengths = (c[offs[1:]] - c[offs[:-1]]).astype(np.int64)
    idx = kept.astype(np.int16)
    idx -= ord("a")
    idx[(idx < 0) | (idx > 25)] = 26
    return idx, lengths


def text_signals_and_ppl_batch(texts: pd.Series) -> dict[str, object]:
    """The fully fused python stage: lang + n_tok + rep_ratio + ppl from
    ONE per-row lower() and ONE Arrow array — the tokenizer splits it, the
    ppl cleaner reads its UTF-8 buffer in place (no blob join / re-lower /
    re-encode). Falls back to the separate batch paths when Arrow declines
    the batch (lone surrogates)."""
    s = texts.fillna("")
    vals = s.tolist()
    n = len(vals)
    if n == 0:
        out = text_signals_batch(texts)
        out["ppl"] = perplexity_batch(texts)
        return out
    arr = _lowered_arrow([v.lower() for v in vals])
    if arr is None:
        out = text_signals_batch(texts)
        out["ppl"] = perplexity_batch(texts)
        return out
    codes, uniques, row_ids, n_tok = _tokenize_encoded_from_arrow(arr, n)
    hit_matrix = _lang_hit_matrix(codes, uniques, row_ids, n)
    n_distinct = _distinct_counts(codes, len(uniques), row_ids, n)
    lang = _labels_from_parts(hit_matrix, n_tok, _cjk_ratio_batch(vals))
    rep = 1.0 - n_distinct / np.maximum(n_tok, 1)
    return {
        "lang": pd.Series(lang, index=texts.index, dtype=object),
        "n_tok": n_tok,
        "rep_ratio": rep,
        "ppl": _ppl_score(*_ppl_clean_arrow(arr), n, texts.index),
    }
