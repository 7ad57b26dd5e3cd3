"""Product quantization (PQ / IVF-PQ) — compressed-domain ANN search as
DataFrame ops (Jégou, Douze, Schmid 2011, "Product Quantization for
Nearest Neighbor Search", TPAMI; the FAISS ``IndexIVFPQ`` recipe).

This completes the ANN ladder (brute cosine → hyperplane-LSH → IVF →
IVF-PQ): at 10^12 vectors the raw embedding column IS the storage cost —
a 768-dim float32 vector is 3 KB/row, while an ``m=16, ksub=256`` PQ code
is 16 *bytes* (192× smaller), so the searchable at-rest layout holds only
``(id, cell, pq_code)`` and a query never touches a raw vector.

Shapes (all scale-bounded):

* **train** — per-subspace plain-L2 k-means on a bounded driver sample
  (FAISS's default train-on-sample), ``m`` independent codebooks of
  ``ksub`` centroids over ``dim/m``-wide slices. Optional full-corpus
  refinement (:func:`pq_refine`) runs Lloyd rounds for ALL ``m``
  subspaces in ONE partial-agg shuffle per round, bounded by the
  codebook size (``m×ksub×dsub`` rows) at any corpus size — the
  decimal-exact contract shared with ``operators/kmeans.py``.
* **encode** (:func:`pq_encode`) — a zero-shuffle, streaming-safe
  projection: per subspace, argmin-L2 centroid id computed as
  ``argmax(x_m·c − ‖c‖²/2)`` with the shared struct-max walk
  (``similarity.ivf_cell``'s tie rule: ties to the LARGER id). The
  codebooks are plan literals in the one-time form and ride a broadcast
  one-row table inside the refine loop (plan source round-invariant).
* **search** (:func:`pq_topk` / :func:`ivf_pq_topk_partitioned`) —
  asymmetric distance computation: the query builds an ``m×ksub``
  inner-product lookup table driver-side (tiny), shipped as literals;
  each row's score is ``m`` array lookups and adds — no per-row dot
  against raw vectors. Inner product decomposes EXACTLY across
  subspaces (``q·x̂ = Σ_m q_m·c_{m,code_m}``), so ADC-IP over
  L2-normalized corpora ranks by approximate cosine. Top-k is
  TakeOrderedAndProject.

Also here: **SQ8 scalar quantization** (FAISS ``ScalarQuantizer``
QT_8bit) — the 4× rung of the compression ladder under PQ's ~50×: one code
per DIMENSION on a uniform 8-bit grid between per-dim train bounds, so
reconstruction error is per-coordinate bounded (span/510) and no codebook
training is needed; and the batched/refine consumers ``pq_knn_join`` /
``pq_topk_rerank``.

Reference anchor: the reference profiles per-column distributions
(piperider_cli/profiler/profiler.py topk/histogram); the PQ code column is
the compressed distribution sketch of an embedding column, and the
``(cell, pq_code)`` layout is its searchable at-rest form.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from piperider_spark.operators.similarity import (
    arr_lit,
    dot,
    ivf_cell,
    probe_cells,
    _ivf_centroids,
)

__all__ = [
    "train_pq_codebooks",
    "train_pq_from_df",
    "pq_code_expr",
    "pq_encode",
    "pq_update_agg",
    "pq_refine",
    "adc_lut",
    "pq_adc_score_expr",
    "pq_topk",
    "pq_topk_rerank",
    "pq_knn_join",
    "pq_write_partitioned",
    "ivf_pq_topk_partitioned",
    "codebooks_to_df",
    "codebooks_from_df",
    "sq8_bounds",
    "sq8_encode",
    "sq8_topk",
    "sq8_write_partitioned",
    "sq8_topk_partitioned",
]

# decimal type shared with the classifier/DSIR/kmeans exact-sum contract
_DEC = "decimal(38,15)"


def _lloyd_l2(X: np.ndarray, k: int, seed_tag: str, iters: int) -> np.ndarray:
    """Deterministic plain-L2 k-means over a driver-side sample: md5-seeded
    k-means++ init, Lloyd rounds with argmin-L2 assignment (ties to the
    LARGER id — the engine's struct-max rule), empty cells keep their
    previous centroid. Unlike ``similarity.train_ivf_centroids`` this is
    NOT spherical: PQ subvectors are not unit-norm and the ADC geometry
    needs true L2 cells."""
    n = len(X)
    if n == 0:
        raise ValueError("_lloyd_l2: empty sample")
    k = min(k, n)
    h = int.from_bytes(hashlib.md5(seed_tag.encode()).digest()[:8], "big")
    rng = np.random.default_rng(h)
    C = np.empty((k, X.shape[1]))
    C[0] = X[rng.integers(n)]
    d2 = np.full(n, np.inf)
    for j in range(1, k):
        d2 = np.minimum(d2, ((X - C[j - 1]) ** 2).sum(axis=1))
        tot = d2.sum()
        C[j] = X[rng.choice(n, p=d2 / tot)] if tot > 0 else X[rng.integers(n)]
    for _ in range(iters):
        # argmin L2 == argmax (x·c − ‖c‖²/2); ties → larger id via the
        # reversed-argmax trick (matches the engine's struct max).
        scores = X @ C.T - 0.5 * (C**2).sum(axis=1)
        assign = C.shape[0] - 1 - np.argmax(scores[:, ::-1], axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def train_pq_codebooks(
    sample: np.ndarray, m: int = 8, ksub: int = 16, seed: int = 11, iters: int = 12
) -> np.ndarray:
    """Train ``m`` independent per-subspace codebooks over a bounded sample
    (driver-side numpy — FAISS's train-on-sample default). Returns an
    ``(m, ksub, dsub)`` array; ``dim`` must divide evenly into ``m``
    subspaces. Determinism: md5-seeded per subspace, so identical
    codebooks every run for the same sample."""
    X = np.asarray(sample, dtype=np.float64)
    if X.ndim != 2 or X.shape[0] == 0:
        raise ValueError("train_pq_codebooks: sample must be a non-empty 2-D array")
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"train_pq_codebooks: dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = [
        _lloyd_l2(X[:, i * dsub : (i + 1) * dsub], ksub, f"pq:{seed}:{i}", iters)
        for i in range(m)
    ]
    if any(b.shape[0] < ksub for b in books):
        # degenerate tiny samples: pad with md5-seeded random sub-centroids
        # so the code space always has ksub entries (the IVF fallback rule)
        books = [
            np.vstack([b, _ivf_centroids(dsub, ksub - b.shape[0], seed + i)])
            if b.shape[0] < ksub
            else b
            for i, b in enumerate(books)
        ]
    return np.stack(books)


def train_pq_from_df(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    sample_rows: int = 100_000,
    seed: int = 11,
    iters: int = 12,
) -> np.ndarray:
    """Bounded-sample trainer over a DataFrame (``limit`` collect — driver
    transfer capped by ``sample_rows``, the kmeans_fit convention)."""
    sample = [
        r[0]
        for r in df.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .limit(sample_rows)
        .collect()
    ]
    if not sample:
        raise ValueError(f"train_pq_from_df: no non-null vectors in column {vec_col!r}")
    return train_pq_codebooks(np.asarray(sample, dtype=np.float64), m, ksub, seed, iters)


def _sub_code_expr(sub: Column, cents: Column, biases: Column) -> Column:
    """argmin-L2 centroid id for one subvector over COLUMN operands:
    struct-max of (x·c − bias_j, j) — ties to the larger id, the shared
    ``ivf_cell`` rule. ``cents`` is array<array<double>> (ksub×dsub),
    ``biases`` is array<double> of precomputed ‖c‖²/2."""
    structs = F.transform(
        cents,
        lambda c, j: F.struct(
            (dot(sub, c) - F.element_at(biases, j + 1)).alias("s"),
            j.cast("int").alias("j"),
        ),
    )
    return F.array_max(structs)["j"]


def pq_code_expr_cols(vec: Column, books: Column, biases: Column, dsub: int, m: int) -> Column:
    """``array<int>`` of per-subspace argmin-L2 codes over COLUMN operands
    (``books``: array<array<array<double>>> m×ksub×dsub, ``biases``:
    array<array<double>> m×ksub) — ONE ``transform`` over
    ``sequence(0, m−1)`` holding ONE nested struct-max walk, so the
    expression tree (and Catalyst's planning time) is constant in ``m``.
    The first cut built ``m`` separate walk expressions; at m=8 that made
    the optimizer itself the bottleneck — 1.4 s driver-side planning per
    query vs ~0.15 s for this shape, identical results."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: _sub_code_expr(
            F.slice(vec, i * dsub + 1, F.lit(dsub)),
            F.element_at(books, i + 1),
            F.element_at(biases, i + 1),
        ),
    )


def _book_literals(B: np.ndarray) -> tuple[Column, Column]:
    """The (books, biases) literal pair for the one-time scorer form
    (streaming-safe; the refine loop ships the same values as a broadcast
    one-row table instead so the plan source is round-invariant)."""
    m, ksub, dsub = B.shape
    books = arr_lit(B)
    biases = arr_lit([[0.5 * (B[i, j] ** 2).sum() for j in range(ksub)] for i in range(m)])
    return books, biases


def pq_code_expr(vec: Column, codebooks: np.ndarray) -> Column:
    """``array<int>`` of length ``m``: per-subspace argmin-L2 code over
    codebook LITERALS (one-time plan, zero-shuffle, streaming-safe — the
    scorer form)."""
    B = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    books, biases = _book_literals(B)
    return pq_code_expr_cols(vec, books, biases, dsub, m)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Zero-shuffle encode projection. Rows whose ``vec_col`` is NULL or
    has the wrong dimension get a NULL code EXPLICITLY (the raw argmax
    walk would otherwise fall through to the largest id on a NULL vector —
    the cluster_balanced_sample lesson)."""
    B = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == m * dsub)
    return df.withColumn(
        out_col, F.when(ok, pq_code_expr(F.col(vec_col), B))
    )


def pq_update_agg(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    quant_dp: int = 9,
) -> DataFrame:
    """One PQ Lloyd-round update for ALL ``m`` subspaces as a lazy plan
    (the :func:`kmeans_update_agg` twin): broadcast-table assignment
    (round-invariant plan source) → ``posexplode`` the full vector →
    ``groupBy(subspace, cell, sub-dim)`` with map-side partial
    aggregation, so the shuffle moves ≤ tasks×m×ksub×dsub rows and the
    output is ≤ m×ksub×dsub rows regardless of corpus size. Split out of
    :func:`pq_refine` so plan dumps can inspect the per-round shuffle
    shape without running the eager loop."""
    B = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    dim = m * dsub
    base = df.select(F.col(vec_col).alias("_v")).where(
        F.col("_v").isNotNull() & (F.size("_v") == dim)
    )
    cdf = df.sparkSession.createDataFrame(
        [
            (
                [[[float(v) for v in B[i, j]] for j in range(ksub)] for i in range(m)],
                [[float(0.5 * (B[i, j] ** 2).sum()) for j in range(ksub)] for i in range(m)],
            )
        ],
        "_books array<array<array<double>>>, _biases array<array<double>>",
    )
    # NOTE: codes assigned in their own projection, away from the
    # generator (the ExtractGenerator alias-stripping gotcha).
    assigned = base.crossJoin(F.broadcast(cdf)).select(
        pq_code_expr_cols(
            F.col("_v"), F.col("_books"), F.col("_biases"), dsub, m
        ).alias("_codes"),
        "_v",
    )
    return (
        assigned.select("_codes", F.posexplode("_v").alias("_d", "_x"))
        .select(
            (F.col("_d") / dsub).cast("int").alias("_m"),
            F.element_at("_codes", (F.col("_d") / dsub).cast("int") + 1).alias("_c"),
            (F.col("_d") % dsub).alias("_sd"),
            F.col("_x"),
        )
        .groupBy("_m", "_c", "_sd")
        .agg(
            F.sum(F.round(F.col("_x").cast("double"), quant_dp).cast(_DEC)).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
    )


def pq_refine(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    iters: int = 1,
    quant_dp: int = 9,
) -> np.ndarray:
    """Full-corpus Lloyd refinement of ALL ``m`` codebooks — one scan and
    ONE partial-agg shuffle per round, output bounded by the codebook
    size (``m×ksub×dsub`` rows) at any corpus size.

    EAGER (runs a job per round). Assignment rides the codebooks +
    biases as a BROADCAST one-row table so the plan source is
    round-invariant (codegen compiles once — the kmeans_update_agg
    lesson); the update sums ``quant_dp``-quantized coordinates as
    DECIMAL(38,15), so refined codebooks are BYTE-IDENTICAL across
    partitionings and input orders (the repo's training-determinism
    contract). Empty cells keep their previous centroid."""
    B = np.asarray(codebooks, dtype=np.float64).copy()
    if B.ndim != 3 or B.shape[0] == 0:
        raise ValueError("pq_refine: codebooks must be a non-empty (m,ksub,dsub) array")
    m, ksub, dsub = B.shape
    for _ in range(iters):
        rows = pq_update_agg(df, B, vec_col=vec_col, quant_dp=quant_dp).collect()
        nxt = B.copy()
        sums = np.zeros_like(B)
        counts = np.zeros((m, ksub), dtype=np.int64)
        for r in rows:
            sums[r["_m"], r["_c"], r["_sd"]] = float(r["_s"])
            counts[r["_m"], r["_c"]] = r["_n"]
        nonempty = counts > 0
        nxt[nonempty] = sums[nonempty] / counts[nonempty][:, None]
        B = nxt
    return B


def adc_lut(query_vec, codebooks: np.ndarray) -> np.ndarray:
    """The query's ``(m, ksub)`` inner-product lookup table — driver-side
    numpy, ``m×ksub`` doubles (a few KB at production sizes; broadcast as
    literals). ``LUT[i][j] = q_i · c_{i,j}``; inner product decomposes
    exactly across subspaces, so ``Σ_m LUT[m][code_m] = q · x̂``."""
    B = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    q = np.asarray(query_vec, dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError(
            f"adc_lut: query dim {q.shape[0]} != codebook dim {m * dsub}"
        )
    return np.stack([B[i] @ q[i * dsub : (i + 1) * dsub] for i in range(m)])


def pq_adc_score_expr_cols(code: Column, lut: Column) -> Column:
    """ADC fold over COLUMN operands: ``m`` array lookups summed
    left-to-right in subspace order (deterministic) — no raw vector ever
    read. One ``zip_with``+``aggregate`` pair so the code column is
    referenced ONCE and the tree is constant in ``m``. Single source of
    the fold — the literal form (:func:`pq_adc_score_expr`) and the
    per-query-LUT join (:func:`pq_knn_join`) both delegate here."""
    return F.aggregate(
        F.zip_with(code, lut, lambda c, lrow: F.element_at(lrow, c + 1)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_adc_score_expr(code: Column, lut: np.ndarray) -> Column:
    """:func:`pq_adc_score_expr_cols` against a driver-built LUT literal —
    the single-query scorer. Zero-shuffle projection."""
    return pq_adc_score_expr_cols(code, arr_lit(np.asarray(lut, dtype=np.float64)))


def pq_topk(
    df: DataFrame,
    codebooks: np.ndarray,
    query_vec,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 10,
) -> DataFrame:
    """Encode-on-the-fly ADC top-k (the checkable form; at corpus scale
    the code column is precomputed at ingest — see
    :func:`pq_write_partitioned`). Score = approximate inner product
    ``q·x̂`` (≈ cosine over L2-normalized corpora), rounded to 6 dp;
    deterministic ties on ``id_col``; TakeOrderedAndProject.

    The score is ONE encode walk (constant-size tree — see
    :func:`pq_code_expr_cols`) feeding ONE ``zip_with``+``aggregate`` LUT
    fold; the codes array is built and consumed inside a single
    expression, never re-referenced (re-referencing an encode column from
    per-subspace score terms let CollapseProject inline the whole m-walk
    expression once per lookup — measured 2.3 s vs this shape's 0.5 s
    warm on the 16-cell bench entry)."""
    B = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    lut = adc_lut(query_vec, B)
    score = pq_adc_score_expr(pq_code_expr(F.col(vec_col), B), lut)
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == m * dsub)
    return (
        df.where(ok)
        .select(F.col(id_col), F.round(score, 6).alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.asc(id_col))
        .limit(topk)
    )


def pq_write_partitioned(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """The compressed at-rest layout: ``(id, pq_code)`` partitioned by IVF
    ``cell`` — the 10^12-vector storage shape (``m`` ints per row instead
    of ``dim`` floats; 3 KB → 16 B at 768-dim/m=16 production sizes).
    Probes prune at the partition level AND never read a raw vector.
    Raises a descriptive error on an empty/NULL-first corpus (the
    ann/ivf_write_partitioned guard)."""
    first = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if first is None or first[0] is None:
        raise ValueError(
            f"pq_write_partitioned: no non-null vectors in column {vec_col!r}; "
            "cannot infer vector dim for the layout"
        )
    B = np.asarray(codebooks, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)
    m, ksub, dsub = B.shape
    if len(first[0]) != m * dsub:
        raise ValueError(
            f"pq_write_partitioned: vector dim {len(first[0])} != codebook dim {m * dsub}"
        )
    out = (
        pq_encode(df, B, vec_col=vec_col, out_col="pq_code")
        .where(F.col("pq_code").isNotNull())
        .select(
            F.col(id_col),
            ivf_cell(F.col(vec_col), C).alias("cell"),
            "pq_code",
        )
    )
    out.write.mode("overwrite").partitionBy("cell").parquet(path)


def ivf_pq_topk_partitioned(
    spark,
    path: str,
    query_vec,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    nprobe: int = 4,
    topk: int = 10,
) -> DataFrame:
    """Probe a :func:`pq_write_partitioned` layout: the cell predicate is a
    PARTITION filter (reads nprobe/n_cells of the files), scoring is pure
    ADC over stored codes — the query touches codes only, never raw
    vectors. Non-residual IVF-PQ (FAISS ``by_residual=False``): one LUT
    serves every probed cell. Pass the SAME ``centroids``/``codebooks``
    the layout was written with."""
    probe = probe_cells(centroids, query_vec, nprobe)
    lut = adc_lut(query_vec, codebooks)
    return (
        spark.read.parquet(path)
        .where(F.col("cell").isin(probe))
        .select(
            F.col(id_col),
            F.round(pq_adc_score_expr(F.col("pq_code"), lut), 6).alias("adc_score"),
        )
        .orderBy(F.desc("adc_score"), F.asc(id_col))
        .limit(topk)
    )


def codebooks_to_df(spark, codebooks: np.ndarray) -> DataFrame:
    """Artifact twin ``(m, cell, centroid)`` — the model-sidecar shape
    shared with classifier/DSIR/kmeans artifacts."""
    B = np.asarray(codebooks, dtype=np.float64)
    return spark.createDataFrame(
        [
            (i, j, [float(v) for v in B[i, j]])
            for i in range(B.shape[0])
            for j in range(B.shape[1])
        ],
        "m int, cell int, centroid array<double>",
    )


def codebooks_from_df(df: DataFrame) -> np.ndarray:
    """Round-trip of :func:`codebooks_to_df` (bounded collect — the
    artifact is m×ksub rows by construction)."""
    rows = df.select("m", "cell", "centroid").collect()
    if not rows:
        raise ValueError("codebooks_from_df: empty artifact")
    m = max(r["m"] for r in rows) + 1
    ksub = max(r["cell"] for r in rows) + 1
    dsub = len(rows[0]["centroid"])
    B = np.zeros((m, ksub, dsub))
    for r in rows:
        B[r["m"], r["cell"]] = r["centroid"]
    return B


def pq_topk_rerank(
    candidates: DataFrame,
    raw_df: DataFrame,
    query_vec,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 10,
) -> DataFrame:
    """The FAISS "refine" stage: exact cosine re-rank of an ADC candidate
    list against the raw vectors. Feed it an over-fetched ADC result
    (``topk * 4`` is the usual R) from :func:`pq_topk` /
    :func:`ivf_pq_topk_partitioned`; the candidate ids are a tiny frame,
    so the raw-vector fetch is a BROADCAST semi-join into the corpus scan
    (never a corpus shuffle), then exact cosine + TakeOrderedAndProject.
    At rest the raw vectors live in a separate (cold) table from the hot
    ``(id, cell, pq_code)`` search layout — this is the only stage that
    touches them, for |candidates| rows per query."""
    from piperider_spark.operators.similarity import cosine

    ids = candidates.select(F.col(id_col))
    fetched = raw_df.join(F.broadcast(ids), id_col, "left_semi")
    q = arr_lit(query_vec)
    return (
        fetched.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(topk)
    )


def pq_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str | None = None,
    topk: int = 5,
) -> DataFrame:
    """Batched compressed-domain k-NN join — the ADC twin of
    :func:`similarity.knn_join_topk` and the production shape for "find
    the near-neighbours of this query batch in the corpus" (near-dup
    checks, decontamination against a reference set, retrieval eval).

    The per-query LUT is not built driver-side (that would serialize
    Q×m×ksub doubles through the plan): ``lut[i][j] = q_i · c_{i,j}`` is
    itself an inner product against the codebook literal, so each query
    row computes its own LUT ROW-LOCALLY on the broadcast side via one
    nested transform. The corpus side contributes only
    its code column (encoded on the fly when ``code_col`` is None, or a
    stored code from the at-rest layout); the join is
    ``broadcast(queries) × corpus`` scored by ``m`` LUT lookups per pair
    — the corpus is scanned ONCE for the whole batch. The per-query
    top-k is TWO-PHASE: a first rank partitioned by (q_id,
    input-partition id) keeps ≤ topk rows per query per scan partition
    (each group ≈ |corpus|/partitions rows — a query's pairs never land
    on one task), then the global per-query rank runs over ≤
    Q×partitions×topk survivors. The score-row shuffle volume is the
    unavoidable Q×|corpus| pairs once, but no partition is ever
    corpus-sized."""
    from pyspark.sql import Window

    B = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    books = arr_lit(B)
    # row-local per-query LUT: lut[i][j] = dot(q_sub_i, c_ij)
    qlut = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.transform(
            F.element_at(books, i + 1),
            lambda c: dot(F.slice(F.col("q_vec"), i * dsub + 1, F.lit(dsub)), c),
        ),
    )
    qside = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        ).withColumn("q_lut", qlut)
    )
    if code_col is None:
        cside = pq_encode(corpus, B, vec_col=vec_col, out_col="_code").where(
            F.col("_code").isNotNull()
        )
        cside = cside.select(F.col(id_col).alias("c_id"), F.col("_code").alias("_code"))
    else:
        cside = corpus.select(
            F.col(id_col).alias("c_id"), F.col(code_col).alias("_code")
        ).where(F.col("_code").isNotNull())
    score = pq_adc_score_expr_cols(F.col("_code"), F.col("q_lut"))
    pairs = (
        qside.crossJoin(cside)
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(score, 6).alias("adc_score"),
            F.spark_partition_id().alias("_p"),
        )
    )
    w_local = Window.partitionBy("q_id", "_p").orderBy(
        F.desc("adc_score"), F.asc("c_id")
    )
    survivors = (
        pairs.withColumn("_r", F.row_number().over(w_local))
        .where(F.col("_r") <= topk)
        .drop("_r", "_p")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("adc_score"), F.asc("c_id"))
    return survivors.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= topk
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (FAISS ScalarQuantizer QT_8bit) — the 4× rung of
# the compression ladder (raw float32 → SQ8 → PQ). Unlike PQ, SQ8 keeps one
# code PER DIMENSION (uniform 8-bit grid between per-dim train bounds), so
# reconstruction error is per-coordinate-bounded and no codebook training
# loop is needed — just per-dim min/max.
# ---------------------------------------------------------------------------


def sq8_bounds(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) train bounds — ONE ``posexplode`` +
    ``groupBy(dim)`` partial-agg shuffle whose output is ``dim`` rows at
    any corpus size (exact, order-free: min/max are associative). EAGER
    (collects ``dim`` rows). Rows whose vector is NULL or not ``dim``-long
    are EXCLUDED from the bounds (review finding: inferring dim from the
    max observed position let one stray longer vector inflate the bounds
    and NULL-out every normal row downstream); ``dim`` defaults to the
    first non-null vector's length."""
    if dim is None:
        first = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
        if first is None or first[0] is None:
            raise ValueError(f"sq8_bounds: no non-null vectors in column {vec_col!r}")
        dim = len(first[0])
    rows = (
        df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .select(F.posexplode(vec_col).alias("_d", "_x"))
        .groupBy("_d")
        .agg(F.min(F.col("_x").cast("double")).alias("_lo"),
             F.max(F.col("_x").cast("double")).alias("_hi"))
        .collect()
    )
    if not rows:
        raise ValueError(f"sq8_bounds: no vectors of dim {dim} in column {vec_col!r}")
    lo, hi = np.zeros(dim), np.zeros(dim)
    for r in rows:
        lo[r["_d"]], hi[r["_d"]] = r["_lo"], r["_hi"]
    return lo, hi


def sq8_encode(
    df: DataFrame,
    lo: np.ndarray,
    hi: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "sq8_code",
) -> DataFrame:
    """Zero-shuffle, streaming-safe encode: per dimension,
    ``code_d = round(255 · clip((x_d − lo_d)/(hi_d − lo_d), 0, 1))`` as a
    small int (bit-packed by parquet at rest — ~1 B/dim vs 4 B raw).
    Degenerate dims (lo == hi) code to 0 and decode back to lo exactly.
    NULL / wrong-dim vectors code to NULL explicitly."""
    L = np.asarray(lo, dtype=np.float64)
    H = np.asarray(hi, dtype=np.float64)
    dim = L.shape[0]
    lo_lit, span_lit = arr_lit(L), arr_lit(np.maximum(H - L, 0.0))
    code = F.zip_with(
        F.col(vec_col),
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda x, d: F.round(
            255.0
            * F.least(
                F.lit(1.0),
                F.greatest(
                    F.lit(0.0),
                    F.when(F.element_at(span_lit, d + 1) > 0,
                           (x.cast("double") - F.element_at(lo_lit, d + 1))
                           / F.element_at(span_lit, d + 1)).otherwise(F.lit(0.0)),
                ),
            )
        ).cast("smallint"),
    )
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    return df.withColumn(out_col, F.when(ok, code))


def sq8_topk(
    df: DataFrame,
    lo: np.ndarray,
    hi: np.ndarray,
    query_vec,
    id_col: str = "vec_id",
    vec_col: str | None = "embedding",
    code_col: str | None = None,
    topk: int = 10,
) -> DataFrame:
    """Approximate inner-product top-k over SQ8 codes:
    ``q·x̂ = Σ q_d·lo_d + Σ (q_d·span_d/255)·code_d`` — the constant and
    the per-dim weights fold driver-side, so scoring a stored code is one
    ``zip_with`` multiply-add per row, zero-shuffle, never touching raw
    vectors. Pass ``code_col`` to score the at-rest code column, or leave
    it None to encode ``vec_col`` on the fly (the checkable form)."""
    L = np.asarray(lo, dtype=np.float64)
    H = np.asarray(hi, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    if q.shape[0] != L.shape[0]:
        raise ValueError(f"sq8_topk: query dim {q.shape[0]} != bounds dim {L.shape[0]}")
    span = np.maximum(H - L, 0.0)
    const = float(q @ L)
    w = q * span / 255.0
    w_lit = arr_lit(w)
    if code_col is None:
        coded = sq8_encode(df, L, H, vec_col=vec_col, out_col="_sq") \
            .where(F.col("_sq").isNotNull())
        code = F.col("_sq")
    else:
        coded = df.where(F.col(code_col).isNotNull())
        code = F.col(code_col)
    score = F.lit(const) + F.aggregate(
        F.zip_with(code, w_lit, lambda c, wv: c.cast("double") * wv),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        coded.select(F.col(id_col), F.round(score, 6).alias("sq8_score"))
        .orderBy(F.desc("sq8_score"), F.asc(id_col))
        .limit(topk)
    )


def sq8_write_partitioned(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """The SQ8 at-rest layout: ``(id, sq8_code)`` partitioned by IVF
    ``cell`` — the 4× rung's answer to :func:`pq_write_partitioned`
    (dim bytes/row instead of dim floats; probes prune at the partition
    level and score stored codes only). Raises the shared descriptive
    error on an empty/NULL-first corpus."""
    first = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if first is None or first[0] is None:
        raise ValueError(
            f"sq8_write_partitioned: no non-null vectors in column {vec_col!r}; "
            "cannot infer vector dim for the layout"
        )
    L = np.asarray(lo, dtype=np.float64)
    if len(first[0]) != L.shape[0]:
        raise ValueError(
            f"sq8_write_partitioned: vector dim {len(first[0])} != bounds dim {L.shape[0]}"
        )
    C = np.asarray(centroids, dtype=np.float64)
    out = (
        sq8_encode(df, L, np.asarray(hi, dtype=np.float64), vec_col=vec_col, out_col="sq8_code")
        .where(F.col("sq8_code").isNotNull())
        .select(F.col(id_col), ivf_cell(F.col(vec_col), C).alias("cell"), "sq8_code")
    )
    out.write.mode("overwrite").partitionBy("cell").parquet(path)


def sq8_topk_partitioned(
    spark,
    path: str,
    query_vec,
    centroids: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    id_col: str = "vec_id",
    nprobe: int = 4,
    topk: int = 10,
) -> DataFrame:
    """Probe an :func:`sq8_write_partitioned` layout: PartitionFilter on
    the probed cells (the shared :func:`similarity.probe_cells` tie rule),
    then the const + w·code fold over stored codes — no raw vector read.
    Pass the SAME ``centroids``/``lo``/``hi`` the layout was written
    with."""
    probe = probe_cells(centroids, query_vec, nprobe)
    return sq8_topk(
        spark.read.parquet(path).where(F.col("cell").isin(probe)),
        lo,
        hi,
        query_vec,
        id_col=id_col,
        vec_col=None,
        code_col="sq8_code",
        topk=topk,
    )
