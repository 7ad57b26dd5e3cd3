"""Distributed BPE tokenizer training — learn merge rules from the corpus.

The reference ships token *counting* (its profiler's length/distinct stats
over string columns, profiler.py:952-1005); a training-data engine also
needs the tokenizer itself. BPE training is famously driver-hostile if done
naively (the merge loop is inherently sequential), so this follows the way
every production trainer (subword-nmt, HuggingFace tokenizers,
SentencePiece's BPE mode) actually scales: **train from the word-frequency
table, not from the corpus**.

Spark-first decomposition:

  1. :func:`bpe_word_counts` — ONE partial-agg shuffle: JVM-side
     pre-tokenization (``BPE_TOKEN_RE``, the same single-sourced regex the
     gated ``bpe_token_stats_documents`` entry counts with) → explode →
     ``groupBy(word).count()``. At 10^12 tokens the distinct pre-token
     count is Heaps'-law bounded (~10^7-10^8); ``min_count`` prunes the
     hapax tail and ``top_words`` hard-caps driver transfer via
     TakeOrderedAndProject, so the collected table is MBs, not TBs.
  2. :func:`train_bpe` — the sequential merge loop runs driver-side over
     that bounded table with an inverted pair→words index (the
     subword-nmt incremental-update scheme): each merge touches only the
     words that contain the pair, not the whole vocabulary. Deterministic
     tie-breaking (count desc, then lexicographic pair) makes the learned
     merges independent of dict iteration order and partitioning.
  3. :func:`apply_bpe` — encoding back over the corpus is an
     embarrassingly-parallel stateless projection: JVM pre-tokenization
     (Python never re-implements the regex) feeding an Arrow-batched
     pandas UDF that applies merges by rank with a per-batch word cache
     (Zipf: a few thousand distinct words cover almost every batch).
     Stateless ⇒ drops into a readStream unchanged.

Scale notes in SCALE.md (BPE family): the only corpus-sized stage is the
word-count shuffle; training is O(total symbol occurrences of affected
words) per merge on a driver-bounded table; encoding is shuffle-free.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

from piperider_spark.functions.text import BPE_TOKEN_RE

__all__ = [
    "bpe_word_counts",
    "train_bpe",
    "encode_word",
    "apply_bpe",
    "merges_to_df",
]


def bpe_word_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    top_words: int | None = None,
) -> DataFrame:
    """Word-frequency table under the BPE pre-tokenizer: (word, n).

    One partial-agg shuffle (map-side combine via groupBy count). Words are
    the raw ``BPE_TOKEN_RE`` matches — leading-space convention preserved,
    case preserved (BPE is case-sensitive by construction). ``min_count``
    drops the long hapax tail *after* counting (pruning before the groupBy
    is impossible — a word's total isn't known map-side); ``top_words``
    caps the result via sort-limit (TakeOrderedAndProject — no global
    sort materialization). Ties at the cap boundary break on the word
    itself so the table is deterministic.
    """
    words = df.select(
        F.explode(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")), F.lit(BPE_TOKEN_RE), 0
            )
        ).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        counts = counts.where(F.col("n") >= min_count)
    if top_words is not None:
        counts = counts.orderBy(F.col("n").desc(), F.col("word")).limit(top_words)
    return counts


def _pair_counts_index(
    syms: list[list[str]], freqs: list[int]
) -> tuple[dict[tuple[str, str], int], dict[tuple[str, str], set[int]]]:
    """Initial pair→count and pair→{word ids containing it} tables."""
    counts: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wid, (s, f) in enumerate(zip(syms, freqs)):
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            counts[p] = counts.get(p, 0) + f
            index.setdefault(p, set()).add(wid)
    return counts, index


def _merge_word(s: list[str], a: str, b: str, merged: str) -> list[str]:
    """Replace every non-overlapping left-to-right (a, b) adjacency."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        if i < n - 1 and s[i] == a and s[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def train_bpe(
    word_counts: DataFrame | pd.DataFrame | Iterable[tuple[str, int]],
    n_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merge rules from a word-frequency table.

    Accepts the :func:`bpe_word_counts` DataFrame (collected here — the
    caller bounds driver transfer with ``min_count``/``top_words``), a
    pandas frame, or an iterable of (word, count). Words are split into
    unicode characters; each iteration merges the most frequent adjacent
    symbol pair, ties broken by lexicographically smallest pair — fully
    deterministic regardless of input order. Stops early when no pair
    reaches ``min_pair_count`` (2 by default: a pair seen once carries no
    generalization). Returns the ordered merge list; rank = list position.

    Incremental updates via an inverted pair→words index: a merge
    re-derives pair counts only for the words that contain the merged
    pair (subword-nmt's scheme) — O(affected symbols), not O(vocabulary),
    per merge.
    """
    if isinstance(word_counts, DataFrame):
        rows = [(r[0], int(r[1])) for r in word_counts.collect()]
    elif isinstance(word_counts, pd.DataFrame):
        rows = [(str(w), int(n)) for w, n in zip(word_counts.iloc[:, 0], word_counts.iloc[:, 1])]
    else:
        rows = [(str(w), int(n)) for w, n in word_counts]
    # Deterministic word order (tie-breaks never consult it, but index sets
    # iterate during re-counts — sort so behavior is reproducible anyway).
    rows.sort()
    syms: list[list[str]] = [list(w) for w, _ in rows]
    freqs: list[int] = [n for _, n in rows]
    counts, index = _pair_counts_index(syms, freqs)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not counts:
            break
        # max count, then lexicographically smallest pair — deterministic.
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        merged = a + b
        affected = index.pop(best, set())
        counts.pop(best, None)
        for wid in sorted(affected):
            old = syms[wid]
            f = freqs[wid]
            # retract this word's old pair contributions
            for i in range(len(old) - 1):
                p = (old[i], old[i + 1])
                if p == best:
                    continue  # already retired globally
                c = counts.get(p)
                if c is not None:
                    c -= f
                    if c <= 0:
                        counts.pop(p, None)
                        ix = index.get(p)
                        if ix is not None:
                            ix.discard(wid)
                            if not ix:
                                index.pop(p, None)
                    else:
                        counts[p] = c
                ix = index.get(p)
                if ix is not None:
                    ix.discard(wid)
                    if not ix:
                        index.pop(p, None)
            new = _merge_word(old, a, b, merged)
            syms[wid] = new
            # add the new contributions
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                counts[p] = counts.get(p, 0) + f
                index.setdefault(p, set()).add(wid)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode: repeatedly apply the lowest-rank merge present.

    The canonical decode-time algorithm (GPT-2's bpe()): training order is
    replayed exactly, so a word from the training corpus re-segments into
    the same subwords training left it with.
    """
    s = list(word)
    while len(s) > 1:
        best_rank, best_i = None, -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # merge EVERY occurrence of that pair (left-to-right, non-overlap)
        a, b = s[best_i], s[best_i + 1]
        s = _merge_word(s, a, b, a + b)
    return s


_APPLY_SCHEMA = StructType(
    [
        StructField("bpe_tokens", ArrayType(StringType()), False),
        StructField("n_bpe_subwords", IntegerType(), False),
    ]
)


def apply_bpe(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    count_col: str = "n_bpe_subwords",
) -> DataFrame:
    """Encode ``text_col`` under a learned merge list.

    JVM side pre-tokenizes (``regexp_extract_all`` with the single-sourced
    ``BPE_TOKEN_RE`` — Python never re-implements the regex); the pandas
    UDF only applies merges per pre-token, with a per-batch cache keyed by
    word (Zipf makes the hit rate ≈1 after the first few thousand rows).
    Stateless projection: no shuffle, streaming-safe, partition-invariant
    (encoding depends only on the row's own text). NULL text encodes to
    an empty token array with count 0.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(_APPLY_SCHEMA)
    def _encode(words: pd.Series) -> pd.DataFrame:
        cache: dict[str, list[str]] = {}
        toks_out: list[list[str]] = []
        counts: list[int] = []
        for arr in words:
            row: list[str] = []
            if arr is not None:
                for w in arr:
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    row.extend(enc)
            toks_out.append(row)
            counts.append(len(row))
        return pd.DataFrame({"bpe_tokens": toks_out, "n_bpe_subwords": counts})

    pre = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(BPE_TOKEN_RE), 0
    )
    # one struct column, then field projections — guarantees the UDF is
    # planned (and the Arrow transfer paid) exactly once per row
    return (
        df.withColumn("__bpe", _encode(pre))
        .withColumn(out_col, F.col("__bpe.bpe_tokens"))
        .withColumn(count_col, F.col("__bpe.n_bpe_subwords"))
        .drop("__bpe")
    )


def merges_to_df(spark, merges: Sequence[tuple[str, str]]) -> DataFrame:
    """Materialize a merge list as (rank, left, right, merged) — the
    portable artifact form (write it, ship it, diff it between epochs)."""
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    schema = StructType(
        [
            StructField("rank", IntegerType(), False),
            StructField("left", StringType(), False),
            StructField("right", StringType(), False),
            StructField("merged", StringType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def bpe_subword_count_col(
    merges: Sequence[tuple[str, str]], text_col: str = "text"
):
    """Column: subword count under a learned merge list — the decisions-path
    variant of :func:`apply_bpe` that returns ONLY the count (long), so the
    Arrow return leg carries 8 bytes/row instead of the token array. Same
    JVM pre-tokenization, same per-batch word cache (caching the LENGTH of
    the encoding, not the tokens). NULL text counts 0."""
    from pyspark.sql.types import LongType

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(LongType())
    def _count(words: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
        out = []
        for arr in words:
            n = 0
            if arr is not None:
                for w in arr:
                    c = cache.get(w)
                    if c is None:
                        c = len(encode_word(w, ranks))
                        cache[w] = c
                    n += c
            out.append(n)
        return pd.Series(out, dtype="int64")

    return _count(
        F.regexp_extract_all(
            F.coalesce(F.col(text_col), F.lit("")), F.lit(BPE_TOKEN_RE), 0
        )
    )


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Read a :func:`merges_to_df` artifact back into the ordered merge
    list (rank order restored — the artifact's row order is not trusted)."""
    rows = spark.read.parquet(path).select("rank", "left", "right").collect()
    return [(r.left, r.right) for r in sorted(rows, key=lambda r: r.rank)]


# ---------------------------------------------------------------------------
# Vocabulary + id encoding — the artifact training actually consumes
# ---------------------------------------------------------------------------

UNK_ID = 0


def base_symbols(word_counts: DataFrame) -> list[str]:
    """Sorted distinct characters of the training words — the base
    alphabet. One extra tiny aggregation over the (already bounded)
    word-count table: explode each word's characters, distinct, sort.
    Driver transfer is the alphabet (hundreds of rows, not the corpus)."""
    rows = (
        word_counts.select(
        # (?s): without DOTALL, Java's '.' excludes line terminators
        # (\n, \u2028, \u2029, \u0085), so the split missed the
        # boundary BEFORE them and a punctuation token like '!\u2028'
        # yielded a corrupt 2-char 'base symbol' (review finding) —
        # its real char never entered the alphabet and encode_ids
        # emitted UNK for a character present in training
            F.explode(F.split(F.col("word"), "(?s)(?!^)(?=.)")).alias("c")
        )
        .where(F.length("c") > 0)
        .distinct()
        .collect()
    )
    return sorted(r.c for r in rows)


def bpe_vocab(
    merges: Sequence[tuple[str, str]], alphabet: Sequence[str]
) -> dict[str, int]:
    """token → id table: id 0 is reserved for <unk> (a character outside
    the training alphabet), ids 1..|A| are the sorted base alphabet, and
    merged tokens follow in merge-rank order — the id space is a pure
    function of (alphabet, merges), so two jobs with the same artifact
    agree without coordination. Merged tokens are multi-char and base
    symbols single-char, so the ranges cannot collide; a merge whose
    string already appeared (two merge paths producing one token) keeps
    its FIRST id."""
    vocab: dict[str, int] = {}
    nid = 1
    for c in sorted(set(alphabet)):
        vocab[c] = nid
        nid += 1
    for a, b in merges:
        t = a + b
        if t not in vocab:
            vocab[t] = nid
            nid += 1
    return vocab


def encode_ids(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    alphabet: Sequence[str],
    text_col: str = "text",
    out_col: str = "bpe_ids",
) -> DataFrame:
    """Encode ``text_col`` to an ``array<int>`` of vocabulary ids.

    Same shape as :func:`apply_bpe` (JVM pre-tokenize → Arrow crossing,
    per-batch word cache), but the cached value is the id list. Every
    multi-char subword the encoder emits corresponds to a replayed merge
    and is therefore in the vocab; single known chars are in the base
    alphabet; so the only out-of-vocab subwords are single
    out-of-alphabet characters (they can never participate in a merge),
    and each encodes as one ``UNK_ID`` (char-level BPE's unknown
    contract — byte-fallback needs a byte pre-map, which this engine's
    tokenizer deliberately does not do; documented rather than silently
    dropped). Stateless projection — shuffle-free, streaming-safe,
    partition-invariant."""
    from pyspark.sql.types import ArrayType, IntegerType

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    vocab = bpe_vocab(merges, alphabet)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _ids(words: pd.Series) -> pd.Series:
        cache: dict[str, list[int]] = {}
        out = []
        for arr in words:
            row: list[int] = []
            if arr is not None:
                for w in arr:
                    enc = cache.get(w)
                    if enc is None:
                        enc = [
                            vocab.get(t, UNK_ID) for t in encode_word(w, ranks)
                        ]
                        cache[w] = enc
                    row.extend(enc)
            out.append(row)
        return pd.Series(out)

    pre = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(BPE_TOKEN_RE), 0
    )
    return df.withColumn(out_col, _ids(pre))


def vocab_to_df(spark, vocab: dict[str, int]) -> DataFrame:
    """Materialize a vocab as (token, id) — the shippable twin of
    :func:`merges_to_df` (write both next to each other; together they
    freeze the tokenizer completely)."""
    schema = StructType(
        [
            StructField("token", StringType(), False),
            StructField("id", IntegerType(), False),
        ]
    )
    return spark.createDataFrame(
        sorted(vocab.items(), key=lambda kv: kv[1]), schema
    )
