"""Deduplication operators for large text corpora.

Four families, all expressed as declarative DataFrame plans (no RDDs, no
Python UDFs — every hash is the portable md5-based ``md5_60bit`` so results
are reproducible across engines and the DuckDB oracle can verify them):

* **exact**        — fingerprint (normalized-text md5) hash-groupBy.
* **n-gram Jaccard** — shingle-join pair generation + exact Jaccard.
* **MinHash + LSH** — per-doc signatures via salted-md5 "permutations",
  banded bucket join for candidate pairs, exact Jaccard verify.
* **SimHash**      — bitwise majority over token hashes, Hamming-bucket dup
  candidates.

Scale notes (the 100 TB story):
* exact dedup is one shuffle on a 16-byte key — optimal.
* the naive shingle self-join explodes on common shingles; it exists as the
  *oracle-verifiable* small-scale variant. The scale path is MinHash/LSH:
  signature build is a single groupBy(doc) over exploded shingles (one
  shuffle), banding re-keys docs to ``n_bands`` short keys, and the bucket
  self-join only materializes pairs that agree on a full band — with
  ``spark.sql.adaptive.enabled`` the residual mega-bucket skew (boilerplate
  text) is split at runtime. ``max_bucket_size`` hard-caps degenerate
  buckets (drop-and-count, never OOM), mirroring what every production
  near-dup pipeline does with stop-shingles.
* SimHash signatures are one aggregation; candidate generation rotates
  bands of the 60-bit signature so pairs within Hamming distance ≤ k
  collide on ≥ 1 band (probabilistic, like the reference-free designs in
  the public literature).

Reference analogue: PipeRider's duplicate detection surface is
``non_duplicates`` (GROUP BY value HAVING count=1,
/root/reference/piperider_cli/profiler/profiler.py:1731-1758) and
table-level ``duplicate_rows`` (profiler.py:499-543) — exact only; the
near-dup families are the training-data extension the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from piperider_spark.functions.text import fingerprint, md5_60bit, word_shingles


def _ensure_parallel(df: DataFrame, width: int | None = None) -> DataFrame:
    """Re-split narrow inputs (e.g. one parquet row group) so string-heavy
    shingle/token stages run at cluster parallelism. No-op when the scan is
    already parallel — at 100 TB the input has thousands of row groups and
    this adds nothing; on a small single-file table it is the difference
    between 1 task and ``width`` tasks doing the regex work.

    ``width`` defaults to full cluster parallelism — right for the
    shingle+hash stages, whose per-row regex cost dominates task overhead
    (measured at sf0.1: widths 1/8/32 → 5.7/1.5/1.2 s for signatures).
    Lighter per-row stages (simhash's whitespace tokens) pass a smaller
    width: there task-scheduling overhead dominates and a quarter-width
    re-split measured 2.5× faster than full width on the same input."""
    from piperider_spark.session import plan_width

    target = df.sparkSession.sparkContext.defaultParallelism
    width = width or target
    if plan_width(df) < max(width // 2, 2):
        return df.repartition(width)
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def with_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    return df.withColumn(out, fingerprint(text_col))


def exact_dup_flags(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc: fingerprint, group size, and keep flag (first doc_id in each
    fingerprint group survives).

    Skew-safe: group size and canonical id come from a partial-aggregable
    groupBy + broadcast-eligible join rather than windows over the
    fingerprint — a window would ship a whole duplicate group (the
    empty-document fingerprint at corpus scale) to one task."""
    fped = with_fingerprint(df, text_col).select(
        id_col, "fp", F.coalesce(F.col("fp"), F.lit("\x00__null__")).alias("__k")
    )
    # null-coalesced internal key: an equi-join drops NULL keys, but
    # NULL-text docs must group together like the window plan's NULL
    # partition did
    stats = fped.groupBy("__k").agg(
        F.count(F.lit(1)).alias("group_size"), F.min(id_col).alias("__canon")
    )
    return fped.join(stats, "__k").select(
        id_col,
        "fp",
        "group_size",
        (F.col(id_col) == F.col("__canon")).alias("is_canonical"),
    )


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fingerprint groups with >1 member: (fp, n_docs, min_doc_id)."""
    return (
        with_fingerprint(df, text_col)
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("min_doc_id"))
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# Bloom-filter incremental dedup gate (exact dedup's zero-shuffle companion)
# ---------------------------------------------------------------------------
#
# exact_dup_flags dedups ONE corpus with one shuffle on a 16-byte key —
# optimal for a batch. The Bloom gate covers the other production shape:
# continuously ingesting NEW batches against a corpus of already-seen
# fingerprints (the Dolma/BFF pattern). Re-shuffling 10^12 historical
# fingerprints per daily batch is absurd; instead the history is compacted
# ONCE into a Bloom bitset (1.2 GB per 10^9 docs at fpp=1%), broadcast, and
# every new batch is gated MAP-SIDE — zero shuffle, no join against history.
#
# Design notes (scale):
# * bit positions come from JVM-side xxhash64(seed_j, fingerprint) — the
#   python probe never re-implements the hash, so build and probe agree by
#   construction and the python stage is pure numpy bit lookups.
# * the OR-reduction of per-partition bitsets is CHUNKED: partitions emit
#   fixed-size bitset chunks keyed by chunk_id and a groupBy(chunk_id) ORs
#   them, so the driver collects exactly m/8 bytes — NOT n_partitions×m/8
#   (32 partitions × a 1.2 GB bitset would be a 38 GB collect).
# * beyond broadcastable m (~2-4 GB): shard by a fingerprint prefix into S
#   independent blooms built/probed with the same functions — or keep the
#   streaming first-seen keyed state (streaming/filter_stream.py), which is
#   the exact (non-probabilistic) variant of the same gate.
# * contract: maybe_seen=False is definite (Blooms have no false negatives
#   — pinned in tests); maybe_seen=True is wrong with prob ≤ fpp, i.e. the
#   incremental dedup DROPS ~fpp of genuinely-new docs. Pick fpp for the
#   recall you can afford; use the exact paths where loss is unacceptable.

_BLOOM_SEED = 0x51_B1_00  # arbitrary fixed salt base, disjoint per hash j
_BLOOM_CHUNK_BYTES = 4 << 20


def bloom_params(expected: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: m = -n·ln p/(ln 2)², k = (m/n)·ln 2 (≥1), with m
    rounded up to a whole byte."""
    import math

    n = max(int(expected), 1)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _bloom_positions(text_col: Column | str, m_bits: int, k: int) -> list[Column]:
    """k bit positions per row, JVM-computed from the row's fingerprint.

    NULL text coalesces to the same sentinel exact_dup_flags uses, so NULL
    docs gate against each other exactly like the shuffle path groups them."""
    fp = F.coalesce(fingerprint(text_col), F.lit("\x00__null__"))
    return [
        F.pmod(F.xxhash64(F.lit(_BLOOM_SEED + j), fp), F.lit(m_bits)).alias(f"__bp{j}")
        for j in range(k)
    ]


def build_fingerprint_bloom(
    df: DataFrame,
    text_col: str = "text",
    expected: int | None = None,
    fpp: float = 0.01,
    layout: tuple[int, int] | None = None,
) -> dict:
    """Compact a corpus' text fingerprints into a Bloom bitset.

    EAGER (documented contract, like percentile_disc_multi): runs a count
    when ``expected`` is not given, then the build job itself. Returns
    ``{"bits": bytes, "m_bits": int, "k": int, "fpp": float, "expected": int}``
    — persist with :func:`save_bloom`/:func:`load_bloom`; OR two epochs'
    filters with :func:`bloom_or`. ``layout`` forces ``(m_bits, k)`` —
    required when the result must union into an existing filter (epoch
    snapshots share the first epoch's layout)."""
    if expected is None:
        # layout forced (epoch snapshots inherit epoch 1's): the count
        # would only stamp metadata at the cost of a full corpus pass —
        # stamp -1 ("unknown") instead
        expected = -1 if layout is not None else df.count()
    m_bits, k = _bloom_layout(expected, fpp, layout)
    pos = df.select(*_bloom_positions(text_col, m_bits, k))
    return _or_reduce_bloom(pos, m_bits, k, fpp, expected)


def _bloom_layout(
    expected: int, fpp: float, layout: tuple[int, int] | None
) -> tuple[int, int]:
    if layout is not None:
        m_bits, k = layout
        if m_bits % 8:
            raise ValueError(f"layout m_bits must be a byte multiple, got {m_bits}")
        return m_bits, k
    return bloom_params(expected, fpp)


def _or_reduce_bloom(
    pos: DataFrame, m_bits: int, k: int, fpp: float, expected: int
) -> dict:
    """Chunked OR-reduction of a position frame (any number of int64
    bit-position columns) into one bitset dict — the shared engine behind
    the fingerprint- and window-grain builders. The driver collects exactly
    m/8 bytes (non-zero chunks only), never partitions x m/8."""
    import numpy as np

    m_bytes = m_bits // 8
    chunk = min(_BLOOM_CHUNK_BYTES, m_bytes)
    n_chunks = (m_bytes + chunk - 1) // chunk

    def _partition_chunks(pdf_iter):
        import pandas as pd

        bits = np.zeros(m_bytes, dtype=np.uint8)
        for pdf in pdf_iter:
            for c in pdf.columns:
                p = pdf[c].to_numpy(dtype=np.int64)
                np.bitwise_or.at(bits, p >> 3, (1 << (p & 7)).astype(np.uint8))
        out = [
            (i, bits[i * chunk : (i + 1) * chunk].tobytes())
            for i in range(n_chunks)
            # all-zero chunks carry nothing — skip them (most chunks, for a
            # small partition of a large bitset)
            if bits[i * chunk : (i + 1) * chunk].any()
        ]
        yield pd.DataFrame(
            {
                "chunk_id": pd.array([o[0] for o in out], dtype="int32"),
                "bits": pd.array([o[1] for o in out], dtype="object"),
            }
        )

    chunks = pos.mapInPandas(_partition_chunks, schema="chunk_id int, bits binary")

    def _or_chunks(key, pdf):
        import pandas as pd

        acc = None
        for raw in pdf["bits"]:
            a = np.frombuffer(raw, dtype=np.uint8)
            acc = a.copy() if acc is None else np.bitwise_or(acc, a)
        return pd.DataFrame({"chunk_id": [key[0]], "bits": [acc.tobytes()]})

    merged = chunks.groupBy("chunk_id").applyInPandas(
        _or_chunks, schema="chunk_id int, bits binary"
    )
    bits = np.zeros(m_bytes, dtype=np.uint8)
    for row in merged.collect():
        start = row["chunk_id"] * chunk
        arr = np.frombuffer(row["bits"], dtype=np.uint8)
        bits[start : start + len(arr)] = arr
    return {
        "bits": bits.tobytes(),
        "m_bits": m_bits,
        "k": k,
        "fpp": fpp,
        "expected": int(expected),
    }


def save_bloom(bloom: dict, path: str) -> None:
    """Persist a filter as one JSON file (bits base64) — the epoch-snapshot
    artifact `pipeline --bloom-out` writes and `--bloom-history` loads.
    Atomic (write-then-rename), so a crashed writer never leaves a torn
    artifact for the next epoch."""
    import base64
    import json
    import os

    payload = {**bloom, "bits": base64.b64encode(bloom["bits"]).decode("ascii")}
    tmp = f"{path}.tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, path)


def load_bloom(path: str) -> dict:
    import base64
    import json

    with open(path) as fh:
        data = json.load(fh)
    data["bits"] = base64.b64decode(data["bits"])
    if len(data["bits"]) * 8 != data["m_bits"]:
        raise ValueError(
            f"corrupt bloom artifact {path}: {len(data['bits'])} bytes vs m_bits={data['m_bits']}"
        )
    return data


def bloom_or(a: dict, b: dict) -> dict:
    """Union of two filters over the SAME (m_bits, k) — e.g. merging epoch
    snapshots. fpp degrades with total insertions; re-size when the union's
    expected count outgrows the original sizing."""
    import numpy as np

    if (a["m_bits"], a["k"]) != (b["m_bits"], b["k"]):
        raise ValueError(
            f"bloom_or needs identical layouts, got (m={a['m_bits']},k={a['k']}) "
            f"vs (m={b['m_bits']},k={b['k']}) — rebuild at a common sizing"
        )
    ga, gb = a.get("grain", "fingerprint"), b.get("grain", "fingerprint")
    if ga != gb or a.get("k_tokens") != b.get("k_tokens"):
        raise ValueError(
            f"bloom_or across grains: {ga}/k_tokens={a.get('k_tokens')} vs "
            f"{gb}/k_tokens={b.get('k_tokens')} — these filters index different keys"
        )
    bits = np.bitwise_or(
        np.frombuffer(a["bits"], dtype=np.uint8), np.frombuffer(b["bits"], dtype=np.uint8)
    )
    exp = (
        -1
        if a["expected"] < 0 or b["expected"] < 0
        else a["expected"] + b["expected"]
    )
    return {**a, "bits": bits.tobytes(), "expected": exp}


def bloom_seen_flags(
    df: DataFrame, bloom: dict, text_col: str = "text", out: str = "maybe_seen"
) -> DataFrame:
    """Map-side membership test of each row's fingerprint against a built
    filter: zero shuffle, bitset shipped once per executor via broadcast,
    python stage is vectorized numpy bit lookups over JVM-computed
    positions."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    # a window-grain snapshot holds k-token WINDOW hashes, not document
    # fingerprints — probing fingerprints against it yields zero true hits
    # plus ~fpp false drops (review finding: the pipeline accepted a
    # swapped --bloom-history artifact silently); legacy snapshots without
    # the key are fingerprint-grain by construction
    if bloom.get("grain", "fingerprint") != "fingerprint":
        raise ValueError(
            f"not a fingerprint-grain filter: grain={bloom.get('grain')!r} "
            "(a window-grain snapshot probes via window_seen_stats)"
        )
    m_bits, k = bloom["m_bits"], bloom["k"]
    bc = df.sparkSession.sparkContext.broadcast(bloom["bits"])

    # no type hints: pyspark's hint inference rejects *args signatures —
    # the legacy (hint-free) pandas_udf path supports them
    @pandas_udf(BooleanType())
    def _probe(*pos_cols):
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        acc = None
        for s in pos_cols:
            p = s.to_numpy(dtype=np.int64)
            hit = (bits[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
            acc = hit if acc is None else (acc & hit)
        return pd.Series(acc)

    return df.withColumn(out, _probe(*_bloom_positions(text_col, m_bits, k)))


def bloom_incremental_dedup(df: DataFrame, bloom: dict, text_col: str = "text") -> DataFrame:
    """Rows whose fingerprint is DEFINITELY absent from the filter (see the
    recall contract in the section header: ~fpp of genuinely-new rows are
    dropped). Does NOT dedup rows against each other within ``df`` — chain
    exact_dup_flags for intra-batch dedup, then fold the survivors into the
    next epoch's filter."""
    flagged = bloom_seen_flags(df, bloom, text_col, out="__seen")
    return flagged.where(~F.col("__seen")).drop("__seen")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise over shingle-sharing pairs)
# ---------------------------------------------------------------------------


def shingle_pairs_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle.

    Plan: explode distinct shingles → self-join on shingle (id_a < id_b)
    → count shared → jaccard = shared / (|A| + |B| - shared).
    Oracle-verifiable; at corpus scale use :func:`minhash_lsh_pairs`.
    """
    # word_shingles already emits distinct shingles per doc — no extra
    # distinct shuffle needed
    sh = _ensure_parallel(df).select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, k)).alias("s")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    # No broadcast hint on `sizes`: it has one row per document — unbounded
    # at corpus scale. AQE broadcasts it at runtime when it is actually
    # small; at scale a shuffle join on `id` keyed by few candidate rows is
    # cheap. (This function is the small-scale oracle twin anyway.)
    return (
        pairs.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _perm_hash(shingle: Column, j: int, hash_fn: str = "md5") -> Column:
    """The j-th MinHash "permutation".

    ``md5`` (default): 60-bit salted md5 — portable bit-for-bit to the
    DuckDB oracle (the only hash both engines share). ``xxhash64``: the
    engine fast path — JVM-native, no string md5 hex + conv() math in the
    per-shingle hot loop (~3-4× cheaper signature build); same LSH
    collision statistics, no cross-engine twin (rows-only verification).
    """
    if hash_fn == "xxhash64":
        # salt via the seed column; abs() keeps min() semantics aligned with
        # the non-negative md5 path (not required for correctness of LSH)
        return F.abs(F.xxhash64(F.lit(j), shingle))
    return md5_60bit(F.concat(F.lit(f"{j}:"), shingle))


def minhash_band_keys(
    text_col: Column | str = "text",
    n_hashes: int = 8,
    n_bands: int = 4,
    k: int = 3,
    hash_fn: str = "xxhash64",
) -> Column:
    """ROW-LOCAL banded MinHash keys: an ``array<string>`` of ``n_bands``
    bucket keys computed entirely from the row's own text — no explode, no
    aggregation. This is the streaming-safe signature shape (a stream can
    evaluate it as a plain projection and keep ONE stateful operator for
    the bucket state, streaming/filter_stream.stream_near_dup_candidates).

    Batch jobs should keep using :func:`minhash_signatures` (the
    explode+groupBy form is ~2.4× faster there — higher-order functions
    fall out of whole-stage codegen and recompute the shingle array per
    signature); the two produce identical band keys for the same
    (n_hashes, n_bands, k, hash_fn) — pinned in tests. Docs with no
    shingles (empty text) yield NULL keys — filter them out, they have no
    similarity identity."""
    if n_hashes % n_bands:
        raise ValueError(f"n_hashes={n_hashes} must divide into n_bands={n_bands}")
    sh = word_shingles(text_col, k)
    rows_per = n_hashes // n_bands

    def _sig(j: int) -> Column:
        # NB: a single-arg lambda — a 2-arg one makes F.transform bind the
        # second parameter to the ARRAY INDEX, silently clobbering the salt
        return F.array_min(F.transform(sh, lambda s: _perm_hash(s, j, hash_fn)))

    sigs = [_sig(j) for j in range(n_hashes)]
    keys = [
        F.when(
            F.size(sh) > 0,
            F.concat_ws(
                "-",
                F.lit(str(b)),
                *[sigs[b * rows_per + r] for r in range(rows_per)],
            ),
        )
        for b in range(n_bands)
    ]
    return F.array(*keys)


def minhash_signatures(
    df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    k: int = 3,
    hash_fn: str = "md5",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature: (id, sig_0..sig_{n-1}). ``shingles``
    (an exploded (id, s) frame) overrides the internal shingling so
    callers that already materialized shingles reuse them — keeping the
    hash aggregation defined in exactly one place.

    Plan: explode shingles → n scalar hash expressions per shingle row
    (each computed exactly once, fully codegen'd) → groupBy(doc) with
    map-side partial min, so the shuffle carries one partial row per doc.
    A per-row ``array_min(transform(...))`` projection would avoid even
    that shuffle, but higher-order functions fall out of whole-stage
    codegen and the shingle array gets recomputed per signature —
    measured 2.4× SLOWER; don't "optimize" back to it.

    Narrow inputs (a single parquet row group) are re-split first so the
    string-heavy shingle/hash stage runs at cluster parallelism; when the
    scan is already parallel (the 100 TB case — thousands of row groups)
    the repartition is skipped, leaving the partial-agg shuffle as the
    plan's only exchange. Docs with no shingles (empty text) are excluded
    — they have no similarity identity.
    """
    if shingles is None:
        df = _ensure_parallel(df)
        shingles = df.select(
            F.col(id_col).alias("id"), F.explode(word_shingles(text_col, k)).alias("s")
        )
    aggs = [F.min(_perm_hash(F.col("s"), j, hash_fn)).alias(f"sig_{j}") for j in range(n_hashes)]
    return shingles.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    n_bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
    hash_fn: str = "md5",
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH, verified with exact Jaccard.

    ``n_hashes`` must divide into ``n_bands`` equal rows-per-band. A pair is
    a candidate iff some band's concatenated signature matches; candidates
    are then exactly verified. ``max_bucket_size`` drops degenerate buckets
    (boilerplate shingles) instead of quadratic blowup.

    Materializing operator: the result is computed eagerly (localCheckpoint)
    so the internal shingle cache can be released before returning — a lazy
    return would leak the persisted shingle frame into the caller's session
    (each pair-mining sweep accreting cached partitions until storage
    eviction). The returned DataFrame reads the checkpointed pair blocks;
    candidate pairs are tiny relative to the corpus, so holding them
    materialized is the cheap side of the trade.
    """
    if n_hashes % n_bands:
        raise ValueError(
            f"n_hashes={n_hashes} must divide into n_bands={n_bands} equal "
            "rows per band (trailing hashes would be silently ignored and "
            "the band keys would no longer match minhash_band_keys)"
        )
    rows_per_band = n_hashes // n_bands
    df = _ensure_parallel(df)
    # ONE shingle materialization, persisted across its four consumers
    # (signature aggregation, both verify joins, set sizes): tokenizing +
    # shingling is the CPU-dominant step, and the previous plan ran it
    # twice over the full corpus. word_shingles already emits distinct
    # shingles per doc, so no extra distinct shuffle is needed either.
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, k)).alias("s")
    ).persist()
    sigs = minhash_signatures(
        n_hashes=n_hashes, hash_fn=hash_fn, shingles=sh
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "-", *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("key"),
        )
        for b in range(n_bands)
    ]
    banded = sigs.select("id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # Cap degenerate buckets WITHOUT materializing them on one task: a
    # count-over-window on (band, key) would ship every row of the
    # mega-bucket (exactly the boilerplate skew the cap exists for) to a
    # single partition before dropping it. groupBy keeps the count partial
    # (map-side combine), and the oversized keys — few by construction —
    # broadcast into an anti-join, so no executor ever holds a full bucket.
    oversized = (
        banded.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .where(F.col("bsz") > max_bucket_size)
        .select("band", "key")
    )
    banded = banded.join(F.broadcast(oversized), ["band", "key"], "left_anti")
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Exact verify on the candidate set only — reuses the persisted
    # shingles. `sizes` carries NO broadcast hint: it has one row per
    # document with ≥1 shingle — O(corpus) rows, a guaranteed OOM if
    # force-broadcast at 10^12-doc scale. AQE broadcasts it at runtime
    # when it is actually small and keeps a shuffle join (cheap — the
    # probe side `shared` holds only candidate pairs) when it is not.
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    shared = (
        cand.join(sh.alias("sa"), F.col("id_a") == F.col("sa.id"))
        .join(sh.alias("sb"), (F.col("id_b") == F.col("sb.id")) & (F.col("sa.s") == F.col("sb.s")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    # ONE action materializes the whole pipeline (every stage above is lazy
    # until this localCheckpoint), then the shingle cache is released —
    # the caller gets a DataFrame backed by the checkpointed pair blocks.
    out = (
        shared.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .localCheckpoint(eager=True)
    )
    sh.unpersist()
    return out


# ---------------------------------------------------------------------------
# near-dup clustering (connected components over candidate pairs)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster ids for every vertex of the near-dup pair graph:
    (id, cluster_id) with cluster_id = min id reachable — the step after
    pair mining that turns pairwise matches into dedup groups.

    Iterative min-label propagation: each round joins labels across edges
    and takes the elementwise min, driver-checked for convergence
    (label-sum is monotonically decreasing, so equality ⇒ fixpoint).
    Rounds needed = graph diameter; duplicate clusters are
    near-cliques (diameter ~2-3), so this converges in a handful of
    rounds even at corpus scale. For adversarial long-path graphs the
    large-star/small-star O(log n) variant is the upgrade path — not
    needed for dedup-shaped graphs. Each round is one shuffle join + one
    partial-agg groupBy.

    Iteration hygiene: every round's labels are localCheckpoint'ed —
    persist alone does NOT truncate the logical plan, and a
    self-referencing join per round doubles the plan until analysis
    itself OOMs (measured at ~10 rounds). Checkpointing resets lineage
    to the materialized blocks, keeping plan size O(1) in rounds.
    """
    # materialize the pair relation ONCE before the symmetric union — the
    # union references it twice, and without this the entire upstream
    # mining DAG (e.g. the full LSH pipeline) executes twice inside one
    # action (measured 2× the mining cost)
    p = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).localCheckpoint(
        eager=True
    )
    edges = (
        p.unionByName(p.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for it in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # carry the previous label so convergence is an exact changed-row
        # count — works for ANY orderable id type (a sum-based check casts
        # string ids to NULL and "converges" instantly, and can alias via
        # 64-bit wraparound on hash-sized numeric ids)
        upd = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.col("label").alias("__old"),
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = upd.where(F.col("label") != F.col("__old")).count()
        labels = upd.select("id", "label")
        if changed == 0:  # min-labels are monotone ⇒ fixpoint
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter — raise it or use the "
            "large-star/small-star variant)"
        )
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def near_dup_retention(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep flags after near-dup clustering: in each cluster keep the doc
    with the LONGEST text (tie → smallest id — the fullest copy usually
    subsumes its near-duplicates); docs outside any cluster keep. The step
    that turns cluster labels into a dedup decision — the near-dup twin of
    :func:`exact_dup_flags`.

    Skew-safe: the per-cluster argmax is a partial-aggregable
    ``max(struct(len, -id))`` + equi-join, never a window over a cluster
    (a boilerplate mega-cluster would otherwise land on one task). Requires
    a numeric id (the -id min-tiebreak); string-id corpora map ids first.
    """
    lens = df.select(
        F.col(id_col), F.coalesce(F.length(text_col), F.lit(0)).alias("_len")
    )
    labeled = clusters.withColumnRenamed("id", id_col).join(lens, id_col)
    best = (
        labeled.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col("_len").alias("l"), (-F.col(id_col)).alias("nid")
                )
            ).alias("b")
        )
        .select("cluster_id", (-F.col("b.nid")).alias("_keeper"))
    )
    return (
        df.select(id_col)
        .join(labeled.select(id_col, "cluster_id"), id_col, "left")
        .join(best, "cluster_id", "left")
        .select(
            F.col(id_col),
            "cluster_id",
            (
                F.col("cluster_id").isNull()
                | (F.col(id_col) == F.col("_keeper"))
            ).alias("keep"),
        )
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (the two-phase MapReduce algorithm from the public literature — Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC 2014):
    O(log² n) rounds on ANY graph, vs diameter rounds for the plain
    min-label propagation in :func:`connected_components`. Same contract:
    (id, cluster_id = min id in the component), any orderable id type.

    This is the adversarial-diameter escape hatch (a 10^6-node path graph
    converges in ~10 rounds here and 10^6 rounds there); dedup graphs are
    near-cliques where plain propagation needs 2-3 rounds and less work per
    round, so that stays the default.

    large-star(u): attach every neighbor v > u to m = min(Γ(u) ∪ {u});
    small-star(u, over edges directed high→low): attach every smaller
    neighbor and u itself to the group min. Both are one groupBy + one
    join per round; every round localCheckpoints (same plan-growth hygiene
    as the label-propagation loop).
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
        return (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        d = e.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        mins = d.groupBy("u").agg(F.min("v").alias("m"))
        moved = (
            d.join(mins, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        return (
            moved.unionByName(mins.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    for _ in range(max_iter):
        new_edges = small_star(large_star(edges)).localCheckpoint(eager=True)
        # fixpoint ⇔ identical edge sets (both are distinct by construction)
        same_count = new_edges.count() == edges.count()
        if same_count and new_edges.subtract(edges).limit(1).count() == 0:
            edges = new_edges
            break
        edges = new_edges
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # at the fixpoint every edge points a node at its component min; roots
    # (the mins themselves) appear only on the v side
    roots = edges.select(F.col("v").alias("id")).distinct().join(
        edges.select(F.col("u").alias("id")).distinct(), "id", "left_anti"
    )
    return edges.select(F.col("u").alias("id"), F.col("v").alias("cluster_id")).unionByName(
        roots.select("id", F.col("id").alias("cluster_id"))
    )


# ---------------------------------------------------------------------------
# decontamination (n-gram overlap vs an eval/benchmark set)
# ---------------------------------------------------------------------------


def contamination_flags(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Flag training documents sharing ≥ ``min_shared`` k-gram shingles with
    ANY eval/benchmark document — the standard decontamination sweep.

    Plan: the eval side is tiny by nature (benchmarks are thousands of
    docs, not billions), so its distinct shingle set BROADCASTS and the
    sweep over the training corpus is one broadcast semi-join-shaped
    aggregation — no shuffle of the training side at all when
    ``min_shared == 1`` would admit a true semi-join; with a threshold we
    count matches per doc, which shuffles only the matching (rare) rows.

    Returns (id, n_shared_shingles) for contaminated docs only.
    """
    tr = _ensure_parallel(train).select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, k)).alias("s")
    )
    ev = (
        eval_df.select(F.explode(word_shingles(text_col, k)).alias("s"))
        .distinct()
    )
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .where(F.col("n_shared_shingles") >= min_shared)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = SIMHASH_BITS
) -> DataFrame:
    """Per-doc SimHash: bitwise majority vote over token md5-hashes.

    Plan: explode tokens → project the 60-bit md5 ONCE per token (a
    separate projection, not inlined into the aggregates — an expression
    referenced by ``bits`` aggregate buffers is re-evaluated per buffer,
    which measured 2.5× slower with the md5 inside) → one groupBy(doc)
    computing, for every bit b, the set-bit count ``sum((h>>b)&1)`` plus
    the token count — ``bits``+1 fused aggregate expressions in a single
    shuffle (the same fused-agg trick as the profiler). The majority vote
    ``sum(±1) > 0`` is equivalent to ``2·cnt_b > n``, so the plain bit-sum
    (no CASE branch in the hot loop) preserves the frozen semantics and the
    DuckDB oracle bit-for-bit. Result ``simhash`` is a non-negative bigint
    of ``bits`` bits.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    toks = _ensure_parallel(df, width=max(target // 4, 2)).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
        ).alias("t"),
    ).where(F.length("t") > 0)
    hashed = toks.select("id", md5_60bit(F.col("t")).alias("h"))
    counts = [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"c_{b}")
        for b in range(bits)
    ]
    agg = hashed.groupBy("id").agg(*counts, F.count(F.lit(1)).alias("n"))
    sim = None
    for b in range(bits):
        bit = F.when(
            F.col(f"c_{b}") * 2 > F.col("n"), F.lit(2**b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim + bit
    return agg.select("id", sim.alias("simhash"))


def simhash_candidates(
    sigs: DataFrame, n_bands: int = 4, bits: int = SIMHASH_BITS
) -> DataFrame:
    """Near-dup candidate pairs: split the signature into ``n_bands`` bit
    bands; pairs agreeing on ≥1 band collide (catches Hamming distance
    < n_bands by pigeonhole). Returns (id_a, id_b, hamming)."""
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    bands = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", "bk.band", "bk.key")
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).select("id_a", "id_b", "hamming")


# ---------------------------------------------------------------------------
# Corpus-wide line dedup (CCNet/RefinedWeb-style paragraph removal)
# ---------------------------------------------------------------------------


def corpus_line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Remove lines that recur across >= ``min_docs`` distinct documents
    (boilerplate headers, navigation chrome, license blocks), rebuilding
    each document's text in original line order.

    Frozen semantics (DuckDB twin in queries.py mirrors them exactly):
      * lines = '\\n'-splits of the raw text; the dedup key is trim(line);
        whitespace-only keys are structure, never removed.
      * a line is dropped iff its key occurs in >= min_docs DISTINCT docs
        (all its occurrences drop, including the first — CCNet paragraph
        dedup, not first-seen-wins).
      * output text = kept lines joined with '\\n' ('' if all removed,
        NULL if the input text was NULL).

    Scale shape — four bounded stages, no windows over corpus-size groups:
      1. distinct(key, doc) + groupBy(key) count  -> ``common`` (1 row per
         recurring key; both aggs partial-aggregate map-side)
      2. lines LEFT JOIN common on key — the big side is never aggregated
         by key, so mega-keys (empty-ish boilerplate) hash-join without a
         hot reducer; AQE splits residual skew
      3. groupBy(doc) rebuild — state bounded by max document length.
    """
    text = F.col(text_col)
    wide = _ensure_parallel(df)
    keyed = (
        wide.where(text.isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(F.split(text, "\n")).alias("pos", "line"),
        )
        .withColumn("key", F.trim(F.col("line")))
    )
    common = (
        keyed.where(F.col("key") != "")
        .select("key", id_col)
        .distinct()
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("key", F.lit(True).alias("__common"))
    )
    marked = keyed.join(common, "key", "left")
    kept_struct = F.when(
        F.col("__common").isNull(), F.struct(F.col("pos"), F.col("line"))
    )  # collect_list skips NULLs -> kept lines only
    rebuilt = marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s.line
            ),
            "\n",
        ).alias("__text"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("__common").isNotNull().cast("long")).alias("n_removed"),
    )
    spine = df.select(id_col, text.isNull().alias("__was_null"))
    return spine.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.when(~F.col("__was_null"), F.coalesce(F.col("__text"), F.lit(""))).alias(
            text_col
        ),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        F.coalesce(F.col("n_removed"), F.lit(0)).alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# conversation-grain dedup (transcripts: one logical document per conv_id)
# ---------------------------------------------------------------------------


def conversation_text(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_idx_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
    max_turns: int | None = None,
) -> DataFrame:
    """Roll a turn-grain transcripts table up to one row per conversation:
    ``(conv_col, conv_text, n_turns)`` with turn texts concatenated in
    stable ``turn_idx`` order — the same ordering invariant the scrub
    contract relies on.

    Dedup at the *conversation* grain is what a training pipeline wants for
    multi-turn data: re-posted/forked conversations duplicate whole
    transcripts, while turn-grain fingerprints can't see that (every short
    "hello" turn collides; whole-conversation texts don't).

    Scale shape: ONE shuffle on ``conv_col``. collect_list partial-aggregates
    map-side, so each task ships ~one partial row per conversation; turn
    order is restored inside the reduce slot by ``array_sort`` over
    ``(turn_idx, text)`` structs — no window, no secondary-sort exchange.
    ``max_turns`` truncates pathological conversations AFTER the sort (the
    dedup signal saturates long before 10^4 turns; the cap bounds row width
    the same way ``max_bucket_size`` bounds LSH buckets). NULL turn texts
    concatenate as empty strings so a NULL never erases its neighbours'
    separator positions.
    """
    struct_col = F.struct(
        F.col(turn_idx_col).alias("i"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    ordered = F.array_sort(F.collect_list(struct_col))
    if max_turns is not None:
        ordered = F.slice(ordered, 1, max_turns)
    return df.groupBy(F.col(conv_col)).agg(
        F.array_join(F.transform(ordered, lambda s: s["t"]), sep).alias("conv_text"),
        F.count(F.lit(1)).alias("n_turns"),
    )


def conversation_exact_dup_groups(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Exactly-duplicated conversations: fingerprint groups with >1 member
    over the stable-order concatenated transcript —
    ``(fp, n_convs, min_conv_id)``. Composition: :func:`conversation_text`
    → :func:`exact_dup_groups`; two shuffles total (the conv rollup, then
    the 16-byte fingerprint groupBy).

    Turns are joined with ``\\x1e`` (record separator), not whitespace:
    ``fingerprint`` collapses whitespace runs, so a newline separator would
    make ["a", "b"] collide with the one-turn conversation "a b" — \\x1e
    survives the normalization and keeps turn boundaries in the key."""
    convs = conversation_text(df, conv_col, turn_idx_col, text_col, sep="\x1e")
    return (
        exact_dup_groups(convs, id_col=conv_col, text_col="conv_text")
        .withColumnsRenamed({"n_docs": "n_convs", "min_doc_id": "min_conv_id"})
    )


def conversation_near_dup_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_idx_col: str = "turn_idx",
    text_col: str = "text",
    n_hashes: int = 8,
    n_bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
    max_turns: int | None = 512,
) -> DataFrame:
    """Near-duplicate conversation pairs: MinHash+LSH over whole-transcript
    text in stable turn order, delegating to :func:`minhash_lsh_pairs` —
    mining, bucket caps, and the exact-Jaccard verify are identical, and
    the eager-materialization contract is inherited (the result is computed
    when this returns; the internal shingle cache is already released).
    Output ids (``id_a``/``id_b``) are conv_ids, ordered lexically."""
    convs = conversation_text(
        df, conv_col, turn_idx_col, text_col, max_turns=max_turns
    )
    return minhash_lsh_pairs(
        convs,
        id_col=conv_col,
        text_col="conv_text",
        n_hashes=n_hashes,
        n_bands=n_bands,
        k=k,
        threshold=threshold,
        max_bucket_size=max_bucket_size,
    )


# ---------------------------------------------------------------------------
# exact-substring duplication (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the suffix-array family, re-expressed as a
# distributed rolling k-token-window plan)
# ---------------------------------------------------------------------------


def _window_hash(win: Column, hash_fn: str = "md5") -> Column:
    """Hash of one k-token window string (matching is case-insensitive —
    the window is lowercased before hashing). ``md5``: 60-bit portable
    (DuckDB twin bit-for-bit). ``xxhash64``: JVM-native engine fast path."""
    low = F.lower(win)
    if hash_fn == "xxhash64":
        return F.xxhash64(low)
    return md5_60bit(low)


def _window_hashes_from_tokens(toks: Column, k: int, hash_fn: str) -> Column:
    """Window-hash array over an ALREADY-PROJECTED token array column.

    The token array must be a bound column (projected via ``withColumn`` /
    ``select``), not an inline ``tokens(text)`` expression: an inline
    expression is re-evaluated inside the transform lambda for every
    window, turning the O(n·k) window pass into O(n²) regex splits per doc
    (measured 7× on the bench corpus). This helper is the single source of
    window-hash semantics — batch explode, Bloom build and stream probe all
    evaluate it, so they agree bit-for-bit."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: _window_hash(
                F.array_join(F.slice(toks, i + F.lit(1), F.lit(k)), " "),
                hash_fn,
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def window_hash_array(
    text_col: Column | str = "text", k: int = 8, hash_fn: str = "md5"
) -> Column:
    """ROW-LOCAL ``array<bigint>`` of k-token-window hashes, in window
    order (element i hashes the lowercased window starting at token i).
    Empty array for NULL/short texts.

    Convenience form for one-off use — it inlines the tokenizer into the
    window lambda, which re-splits the text per window. Hot paths must
    project the token array first and use the internal helper (what every
    operator in this module does)."""
    from piperider_spark.functions.text import tokens

    return _window_hashes_from_tokens(tokens(text_col), k, hash_fn)


def substring_dup_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_fn: str = "md5",
) -> DataFrame:
    """One row per k-token window: ``(id, pos, h)`` where ``pos`` is the
    0-based token index the window starts at and ``h`` hashes the
    lowercased space-joined window. Tokens are whitespace splits of the
    trimmed RAW text (case preserved for reconstruction; matching is
    case-insensitive via the hash). Docs with < k tokens emit nothing.

    Row-local projection — the window stream is O(corpus tokens) rows but
    zero shuffles; everything downstream partial-aggregates before any
    exchange."""
    from piperider_spark.functions.text import tokens

    return (
        _ensure_parallel(df)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        # short docs are dropped HERE, on the cheap per-row token count —
        # NOT via where(size(_wh) > 0) after the hash projection: predicate
        # pushdown inlines a post-projection filter's whole expression tree
        # below the projections, re-splitting the text per WINDOW inside the
        # pushed copy (measured 10x on the bench corpus). posexplode already
        # emits nothing for the empty arrays this guard creates, so the
        # filter is a pure plan-shape protection, not a semantics change.
        .where(F.size("_toks") >= k)
        .select(
            F.col(id_col),
            _window_hashes_from_tokens(F.col("_toks"), k, hash_fn).alias("_wh"),
        )
        .select(F.col(id_col), F.posexplode("_wh").alias("pos", "h"))
    )


def duplicate_substring_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document exact-substring duplication profile: which spans of a
    doc also occur elsewhere in the corpus (or again in the same doc), at
    k-token granularity.

    Frozen semantics (DuckDB twin in queries.py mirrors them exactly):
      * a window is *duplicated* iff its (lowercased) k-token string occurs
        >= ``min_count`` times in the whole corpus — within-doc repeats
        count, matching the suffix-array definition (any repeated
        substring), not just cross-doc.
      * per doc: ``dup_windows`` = duplicated window starts;
        ``dup_spans`` = maximal runs after merging overlapping/adjacent
        windows (gap > k starts a new span); ``dup_token_cov`` = tokens
        covered by the union of duplicated windows (first window of a span
        contributes k, each subsequent one ``min(k, pos - prev)``);
        ``dup_frac`` = coverage / n_tokens (0.0 for empty docs).

    Scale shape — the distributed stand-in for a 100 TB suffix array:
      1. window stream: row-local, no shuffle (O(corpus tokens) rows).
      2. groupBy(h) count — ONE shuffle on a 64-bit key, map-side partial
         agg collapses each partition's repeats first; boilerplate
         mega-windows arrive as counts, never row lists.
      3. windows JOIN dup-hash set on h — build side has exactly one row
         per duplicated hash (no skew amplification; AQE picks the
         strategy and splits residual probe-side skew).
      4. per-doc lag window + groupBy — partitioned by doc, state bounded
         by the longest document, never by the corpus.

    The window stream is deliberately computed TWICE (once under the count
    agg, once as the probe side — see the two scans in PLANS.md). The
    minhash-style persist-and-release alternative would cache an
    O(corpus-tokens) intermediate (~2-3x the text bytes cluster-wide);
    re-running a scan-bound tokenize+hash projection is the cheaper side of
    that trade at 100 TB, the same map-side-probe philosophy as the Bloom
    gate. Only the duplicated-hash SET is ever materialized (AQE broadcasts
    it when small, falls back to a shuffle join when a boilerplate-heavy
    corpus grows it past broadcast size).
    """
    from piperider_spark.functions.text import tokens

    wins = substring_dup_windows(df, id_col, text_col, k, hash_fn)
    dup_hashes = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("h")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    per_doc = (
        wins.join(dup_hashes, "h")
        .withColumn("_prev", F.lag("pos").over(w))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("dup_windows"),
            F.sum(
                F.when(
                    F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > k),
                    1,
                ).otherwise(0)
            ).alias("dup_spans"),
            F.sum(
                F.when(F.col("_prev").isNull(), k).otherwise(
                    F.least(F.lit(k), F.col("pos") - F.col("_prev"))
                )
            ).alias("dup_token_cov"),
        )
    )
    spine = df.select(F.col(id_col), F.size(tokens(F.col(text_col))).alias("_n"))
    cov = F.coalesce(F.col("dup_token_cov"), F.lit(0)).cast("long")
    return spine.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.col("_n").cast("long").alias("n_tokens"),
        F.coalesce(F.col("dup_windows"), F.lit(0)).cast("long").alias("dup_windows"),
        F.coalesce(F.col("dup_spans"), F.lit(0)).cast("long").alias("dup_spans"),
        cov.alias("dup_token_cov"),
        F.when(F.col("_n") == 0, F.lit(0.0))
        .otherwise(cov / F.col("_n").cast("double"))
        .alias("dup_frac"),
    )


def remove_duplicate_substrings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    hash_fn: str = "xxhash64",
    out_col: str = "text_dedup",
) -> DataFrame:
    """Drop every token covered by a duplicated k-token window and rebuild
    the text (Lee et al.'s ExactSubstr removal, token-granular).

    Output contract: ``out_col`` is the kept tokens joined by single
    spaces — whitespace runs are NOT preserved (token-granular surgery;
    original case IS preserved because tokens come from the raw text and
    only the match key is lowercased). NULL text stays NULL; a fully
    duplicated doc becomes ''. ``n_removed_tokens`` counts the dropped
    tokens.

    Scale: stages 1-3 as :func:`duplicate_substring_stats`; the rebuild
    collects *merged spans* per doc (bounded by doc length / k, in practice
    a handful) and filters the token array with one higher-order
    expression — O(n_tokens x n_spans) per doc, never corpus-sized."""
    from piperider_spark.functions.text import tokens

    wins = substring_dup_windows(df, id_col, text_col, k, hash_fn)
    dup_hashes = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("h")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    spans = (
        wins.join(dup_hashes, "h")
        .withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_new",
            (F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > k)).cast(
                "long"
            ),
        )
        .withColumn("_span", F.sum("_new").over(w))
        .groupBy(id_col, "_span")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + F.lit(k - 1)).alias("e"),
        )
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("s", "e")).alias("_spans"))
    )
    toks = tokens(F.col(text_col))
    in_span = lambda i: F.exists(  # noqa: E731
        F.col("_spans"), lambda sp: (sp.s <= i) & (i <= sp.e)
    )
    kept = F.filter(toks, lambda t, i: ~in_span(i))
    return df.join(spans, id_col, "left").select(
        *[c for c in df.columns],
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .when(F.col("_spans").isNull(), F.array_join(toks, " "))
        .otherwise(F.array_join(kept, " "))
        .alias(out_col),
        F.when(F.col(text_col).isNull() | F.col("_spans").isNull(), F.lit(0))
        .otherwise(F.size(toks) - F.size(kept))
        .cast("long")
        .alias("n_removed_tokens"),
    )


def build_window_bloom(
    df: DataFrame,
    text_col: str = "text",
    k_tokens: int = 8,
    dup_only: bool = False,
    min_count: int = 2,
    expected: int | None = None,
    fpp: float = 0.01,
    layout: tuple[int, int] | None = None,
) -> dict:
    """Compact a corpus' k-token-window hashes into a Bloom bitset — the
    window-grain epoch snapshot for cross-run / streaming substring dedup
    (the :func:`build_fingerprint_bloom` pattern one level finer).

    ``dup_only=False`` (default): every window of the corpus goes in; a
    probe hit means "this substring occurred in history" — the incremental
    semantics of :func:`bloom_seen_flags`. ``dup_only=True``: only windows
    occurring >= ``min_count`` times go in (one extra partial-agg shuffle
    at build time); a probe hit means "this substring was already
    *duplicated*", and the filter is 10-100x smaller — at 10^12 history
    tokens the all-windows filter stops fitting in a broadcast (~1.2 TB at
    1% fpp), while the duplicated-window set tracks the boilerplate mass,
    which is exactly what a quality pipeline wants to flag. Beyond either
    bound: shard by hash prefix, like the fingerprint filter documents.

    EAGER (documented contract): runs a count when ``expected`` is not
    given, then the build job. Window hashes are JVM xxhash64 end-to-end
    (``window_hash_array(..., 'xxhash64')``) and bit positions are JVM
    ``xxhash64(seed_j, h)`` — python never re-implements a hash, the same
    rule the fingerprint filter pins. Returns the same dict shape, with
    ``grain='window'`` and ``k_tokens`` added so :func:`window_seen_stats`
    can reject a mismatched probe; :func:`bloom_or` merges epochs."""
    from piperider_spark.functions.text import tokens

    wins = (
        _ensure_parallel(df)
        .select(tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.explode(
                _window_hashes_from_tokens(F.col("_toks"), k_tokens, "xxhash64")
            ).alias("h")
        )
    )
    if dup_only:
        wins = (
            wins.groupBy("h")
            .agg(F.count(F.lit(1)).alias("_c"))
            .where(F.col("_c") >= min_count)
            .select("h")
        )
    if expected is None:
        # same layout-forced shortcut as build_fingerprint_bloom — at the
        # window grain the skipped pass is O(corpus tokens), the single
        # most expensive stage of the build
        expected = -1 if layout is not None else wins.count()
    m_bits, k = _bloom_layout(expected, fpp, layout)
    pos = wins.select(
        *[
            F.pmod(F.xxhash64(F.lit(_BLOOM_SEED + j), F.col("h")), F.lit(m_bits)).alias(
                f"__bp{j}"
            )
            for j in range(k)
        ]
    )
    bloom = _or_reduce_bloom(pos, m_bits, k, fpp, expected)
    bloom["grain"] = "window"
    bloom["k_tokens"] = int(k_tokens)
    return bloom


def window_seen_stats(
    df: DataFrame,
    bloom: dict,
    text_col: str = "text",
    k_tokens: int = 8,
    bits_bc=None,
) -> DataFrame:
    """Per-row substring-overlap profile against a window-grain Bloom:
    ``seen_windows`` (windows whose hash probes positive), ``seen_token_cov``
    (tokens covered by the union of those windows — same merged-span
    arithmetic as :func:`duplicate_substring_stats`) and ``seen_frac``.

    ZERO shuffle and stateless — a pure projection (JVM window hashes +
    positions, one vectorized Arrow crossing for the bit lookups), so it
    drops into a readStream unchanged and gates a new batch against 10^12
    history tokens map-side, the window-grain twin of
    :func:`bloom_seen_flags`. Bloom guarantee: no false negatives — every
    substring genuinely in history is flagged; ~fpp of fresh windows probe
    positive, slightly inflating coverage (never deflating)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType, StructField, StructType

    # a filter without the key is a legacy fingerprint-grain snapshot —
    # probing windows against document fingerprints is always a mistake
    if bloom.get("grain", "fingerprint") != "window":
        raise ValueError(f"not a window-grain filter: grain={bloom.get('grain')!r}")
    if int(bloom.get("k_tokens", k_tokens)) != k_tokens:
        raise ValueError(
            f"filter was built at k_tokens={bloom.get('k_tokens')}, probe asked {k_tokens}"
        )
    m_bits, k = bloom["m_bits"], bloom["k"]
    # bits_bc: callers probing many frames against ONE snapshot (the
    # pipeline probes every wave) pass a prebuilt broadcast so the bitset
    # ships once, not once per call (review finding: per-wave re-broadcast
    # of a GB-scale bitset)
    bc = bits_bc if bits_bc is not None else df.sparkSession.sparkContext.broadcast(bloom["bits"])
    kt = k_tokens

    from piperider_spark.functions.text import tokens

    # stage tokens and window hashes as bound columns (see
    # _window_hashes_from_tokens: inlining re-splits the text per window)
    staged = df.withColumn("__toks", tokens(F.col(text_col))).withColumn(
        "__wh", _window_hashes_from_tokens(F.col("__toks"), k_tokens, "xxhash64")
    )
    flat = F.flatten(
        F.transform(
            F.col("__wh"),
            lambda h: F.array(
                *[
                    F.pmod(F.xxhash64(F.lit(_BLOOM_SEED + j), h), F.lit(m_bits))
                    for j in range(k)
                ]
            ),
        )
    )

    out_type = StructType(
        [
            StructField("seen_windows", LongType()),
            StructField("seen_token_cov", LongType()),
        ]
    )

    # hint-free signature: dedup.py stringifies annotations (__future__
    # annotations) and pandas is function-local, so the type-hint inference
    # path can't resolve them — the legacy (returnType-only) path is the
    # same one bloom_seen_flags uses
    @pandas_udf(out_type)
    def _probe(flat_pos):
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        n_rows = len(flat_pos)
        counts = np.fromiter((len(v) for v in flat_pos), dtype=np.int64, count=n_rows) // k
        total = int(counts.sum())
        if total == 0:
            z = np.zeros(n_rows, dtype=np.int64)
            return pd.DataFrame({"seen_windows": z, "seen_token_cov": z})
        allp = np.concatenate([np.asarray(v, dtype=np.int64) for v in flat_pos if len(v)])
        hit = (bits[allp >> 3] & (1 << (allp & 7)).astype(np.uint8)) != 0
        win_seen = hit.reshape(-1, k).all(axis=1)
        row_ids = np.repeat(np.arange(n_rows), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        win_idx = np.arange(total) - starts[row_ids]
        r = row_ids[win_seen]
        p = win_idx[win_seen]
        seen_windows = np.bincount(r, minlength=n_rows).astype(np.int64)
        if len(r):
            first = np.ones(len(r), dtype=bool)
            first[1:] = r[1:] != r[:-1]
            gap = np.empty(len(p), dtype=np.int64)
            gap[0] = kt
            gap[1:] = p[1:] - p[:-1]
            contrib = np.where(first, kt, np.minimum(kt, gap))
            cov = np.bincount(r, weights=contrib, minlength=n_rows).astype(np.int64)
        else:
            cov = np.zeros(n_rows, dtype=np.int64)
        return pd.DataFrame({"seen_windows": seen_windows, "seen_token_cov": cov})

    n_tok = F.size(F.col("__toks"))
    probed = staged.withColumn("__ws", _probe(flat))
    return probed.select(
        *[c for c in df.columns],
        n_tok.cast("long").alias("n_tokens"),
        F.col("__ws.seen_windows").alias("seen_windows"),
        F.col("__ws.seen_token_cov").alias("seen_token_cov"),
        F.when(n_tok == 0, F.lit(0.0))
        .otherwise(F.col("__ws.seen_token_cov") / n_tok.cast("double"))
        .alias("seen_frac"),
    )
