"""Distributed spherical k-means over an embedding column — the
full-corpus upgrade of the sample-only IVF coarse-quantizer trainer
(:func:`piperider_spark.operators.similarity.train_ivf_centroids`).

FAISS-style IVF trains on a bounded driver-side sample, which is the right
default — but at 10^12 vectors a sample prefix can miss whole modes of the
distribution, and production curation pipelines (SemDeDup / data-mixing
cluster balancing, Abbas et al. 2023; Tirumala et al. 2023 D4) refine the
quantizer over the FULL corpus. This module runs Lloyd iterations as plain
DataFrame aggregations so the per-iteration cost is one corpus scan and one
tiny shuffle, never a driver-sized collect:

  * **assign** — row-local argmax dot against the centroid matrix (the
    exact ``similarity.ivf_cell`` walk: shared transform lambda,
    struct-max tie-break to the larger cell id). Inside the Lloyd loop
    the matrix rides a BROADCAST one-row table (plan source identical
    across rounds → codegen compiles once; nothing scales with k×dim in
    the serialized plan); the one-time consumers (``kmeans_assign``)
    keep the literal form, which is zero-shuffle and streaming-safe.
  * **update** — ``posexplode`` the vector, ``groupBy(cell, dim)`` and sum.
    Map-side partial aggregation collapses every task to ≤ k×dim rows, so
    the shuffle moves ≤ tasks×k×dim tiny rows and the driver collects
    exactly k×dim — bounded by the model, not the data, at any corpus size.
  * **exact, order-free sums** — per-row coordinates are quantized to
    ``quant_dp`` dp and summed as DECIMAL(38,15) (associative-exact), the
    repo's training-determinism contract (see operators/classifier.py):
    the refined centroids are BYTE-IDENTICAL across partitionings, input
    orders, and cluster widths.
  * empty cells keep their previous centroid (deterministic, matches the
    driver-side trainer's rule).

``kmeans_fit`` composes the production recipe: k-means++ init on a bounded
sample (cheap, driver-side) → a few full-corpus Lloyd rounds (each one
scan). ``kmeans_assign`` / ``kmeans_stats`` are the zero-shuffle /
one-shuffle consumers for cluster-balanced sampling and corpus maps.

Reference anchor: the reference profiles distributions per column
(piperider_cli/profiler/profiler.py topk/histogram); a centroid table with
per-cell counts is the analogous "distribution profile" for an embedding
column, and feeds the gated IVF/SemDeDup operators.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from piperider_spark.operators.similarity import (
    arr_lit,
    ivf_cell,
    ivf_cell_expr,
    train_ivf_centroids,
)

__all__ = [
    "kmeans_update_agg",
    "kmeans_refine",
    "kmeans_fit",
    "kmeans_assign",
    "kmeans_stats",
    "cluster_balanced_sample",
    "centroids_to_df",
]

# decimal type shared with the classifier/dsir exact-sum contract
_DEC = "decimal(38,15)"


def kmeans_update_agg(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    quant_dp: int = 9,
    spherical: bool = True,
) -> DataFrame:
    """One Lloyd-round update as a lazy plan: broadcast-table assignment
    (round-invariant plan source) → ``posexplode`` → ``groupBy(cell, dim)`` with map-side
    partial aggregation, so the shuffle moves ≤ tasks×k×dim rows and the
    output is ≤ k×dim rows regardless of corpus size. Split out of
    :func:`kmeans_refine` so plan dumps can inspect the per-iteration
    shuffle shape without running the eager loop."""
    C = np.asarray(centroids, dtype=np.float64)
    base = (
        df.select(F.col(vec_col).alias("_v"))
        .where(F.col("_v").isNotNull() & (F.size("_v") == C.shape[1]))
    )
    # Centroids ride a BROADCAST one-row table, not a literal: the plan
    # source is then identical across Lloyd rounds (codegen compiles once,
    # not per round), and nothing scales with k×dim inside the serialized
    # plan — at a production 65536×768 quantizer a literal would embed
    # ~400 MB into every task's plan per round. ivf_cell_expr walks the
    # column exactly as ivf_cell walks the literal — byte-identical
    # assignments (pinned by the numpy-mirror + invariance tests).
    # Non-spherical Lloyd needs true nearest-centroid: argmax raw dot is
    # only argmin-L2 for EQUAL-NORM centroids (the spherical case, where
    # every centroid is unit-norm). With plain means, score = v·c − ‖c‖²/2
    # (review finding: raw dot collapsed clusters toward the largest-norm
    # mean). The biases ride the same broadcast one-row table.
    biases = [float(0.5 * (C[j] ** 2).sum()) for j in range(C.shape[0])]
    cdf = df.sparkSession.createDataFrame(
        [([[float(v) for v in C[j]] for j in range(C.shape[0])], biases)],
        "_cents array<array<double>>, _biases array<double>",
    )
    # NOTE: the cell must be assigned in its own projection — putting the
    # transform-lambda struct in the same select as a generator makes
    # ExtractGenerator strip the lambda's field aliases (col1/col2) and
    # the `["j"]` extraction fails to resolve.
    if spherical:
        cell = ivf_cell_expr(F.col("_v"), F.col("_cents"))
    else:
        from piperider_spark.operators.similarity import dot as _dot

        structs = F.transform(
            F.col("_cents"),
            lambda c, j: F.struct(
                (_dot(F.col("_v"), c) - F.element_at(F.col("_biases"), j + 1)).alias("s"),
                j.cast("int").alias("j"),
            ),
        )
        cell = F.array_max(structs)["j"]
    assigned = base.crossJoin(F.broadcast(cdf)).select(cell.alias("_c"), "_v")
    return (
        assigned.select("_c", F.posexplode("_v").alias("_d", "_x"))
        .groupBy("_c", "_d")
        .agg(
            F.sum(F.round(F.col("_x").cast("double"), quant_dp).cast(_DEC)).alias(
                "_s"
            ),
            F.count(F.lit(1)).alias("_n"),
        )
    )


def kmeans_refine(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    iters: int = 2,
    quant_dp: int = 9,
    spherical: bool = True,
) -> np.ndarray:
    """Run ``iters`` full-corpus Lloyd rounds from ``centroids``.

    EAGER: each round executes one Spark job (scan + one k×dim-bounded
    partial-agg shuffle + a k×dim-row collect). The update is the exact
    mean of ``quant_dp``-quantized coordinates summed as DECIMAL(38,15),
    so the result is byte-identical across partitionings; with
    ``spherical=True`` (the IVF query-path geometry) means are
    L2-normalized after every round.
    """
    C = np.asarray(centroids, dtype=np.float64)
    if C.ndim != 2 or C.shape[0] == 0:
        raise ValueError("kmeans_refine: centroids must be a non-empty 2-D array")
    for _ in range(iters):
        rows = kmeans_update_agg(
            df, C, vec_col=vec_col, quant_dp=quant_dp, spherical=spherical
        ).collect()
        nxt = C.copy()
        counts = np.zeros(C.shape[0], dtype=np.int64)
        sums = np.zeros_like(C)
        for r in rows:
            sums[r["_c"], r["_d"]] = float(r["_s"])
            counts[r["_c"]] = r["_n"]
        nonempty = counts > 0
        nxt[nonempty] = sums[nonempty] / counts[nonempty, None]
        if spherical:
            nxt = nxt / np.maximum(np.linalg.norm(nxt, axis=1, keepdims=True), 1e-12)
        C = nxt
    return C


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 11,
    sample_rows: int = 100_000,
    sample_iters: int = 12,
    full_iters: int = 2,
    quant_dp: int = 9,
) -> np.ndarray:
    """Production recipe: deterministic k-means++ init on a bounded sample
    (``limit`` collect — driver transfer capped by ``sample_rows``), then
    ``full_iters`` distributed Lloyd rounds over the whole corpus. Returns
    the L2-normalized centroid matrix (k × dim)."""
    rows = [
        r[0]
        for r in df.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .limit(sample_rows)
        .collect()
    ]
    if not rows:
        raise ValueError(f"kmeans_fit: no non-null vectors in column {vec_col!r}")
    # drop ragged vectors (np.asarray would raise on an inhomogeneous
    # shape); the refine/stats passes filter size(vec)==dim the same way.
    # NOTE: an unordered limit() sample is partition-layout-dependent, so
    # the INIT (and with few full_iters the refined centroids) can differ
    # across layouts — kmeans_refine itself stays byte-identical GIVEN an
    # init; callers needing a layout-independent fit should pass a stable
    # pre-sampled init to kmeans_refine directly.
    dim0 = len(rows[0])
    sample = [v for v in rows if len(v) == dim0]
    init = train_ivf_centroids(np.asarray(sample, dtype=np.float64), k, seed=seed,
                               iters=sample_iters)
    return kmeans_refine(
        df, init, vec_col=vec_col, iters=full_iters, quant_dp=quant_dp
    )


def kmeans_assign(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Row-local cluster assignment (broadcast centroid literal, zero
    shuffle, streaming-safe) — the consumer shape for cluster-balanced
    sampling / SemDeDup cell routing."""
    return df.withColumn(out_col, ivf_cell(F.col(vec_col), np.asarray(centroids)))


def kmeans_stats(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Per-cell corpus map: size and mean cosine to the assigned centroid
    (ONE partial-agg shuffle, ≤ k output rows). ``mean_sim`` is the
    spherical-k-means inertia analogue — higher is tighter."""
    C = np.asarray(centroids, dtype=np.float64)
    cents = arr_lit(C)
    from piperider_spark.operators.similarity import cosine

    assigned = (
        df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) == C.shape[1]))
        .withColumn("cell", ivf_cell(F.col(vec_col), C))
        .withColumn("_sim", cosine(F.col(vec_col), F.element_at(cents, F.col("cell") + 1)))
    )
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("_sim"), 6).alias("mean_sim"),
        )
        .orderBy("cell")
    )


def cluster_balanced_sample(
    df: DataFrame,
    centroids: np.ndarray,
    quota: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """At most ``quota`` rows per k-means cell — the D4 / SemDeDup
    "diversify" recipe (Tirumala et al. 2023 §3: cluster the corpus,
    then cap each cluster so dense modes can't dominate the training
    mix). Composition of two existing scale-audited shapes: the
    zero-shuffle literal-centroid assignment (:func:`kmeans_assign`)
    feeding the skew-safe two-phase hash-quota sampler
    (:func:`piperider_spark.operators.sampling.quota_sample` — a
    dominant cell prefilters at the scan, it never ships a mega-cell to
    one rank task). Deterministic and engine-independent: the kept set
    is the ``quota`` smallest md5 hashes per assigned cell, stable
    across runs and partitionings. Rows whose ``vec_col`` is NULL get a
    NULL cell and are sampled as their own stratum (quota_sample's NULL
    convention) — masked EXPLICITLY here, because the raw argmax walk
    scores every centroid NULL on a NULL vector and the struct-max then
    falls through to the largest cell id (a NULL embedding would
    otherwise silently land in cell k−1). The ``cell_col`` column rides
    along in the output for downstream per-cell accounting."""
    assigned = kmeans_assign(df, centroids, vec_col=vec_col, out_col=cell_col)
    dim = int(np.asarray(centroids).shape[1])
    # NULL *or wrong-dimension* vectors: both make every centroid score
    # NULL and fall through the struct-max to cell k−1 (review finding —
    # the original mask covered NULLs only, so a ragged vector silently
    # consumed the last cell's quota)
    assigned = assigned.withColumn(
        cell_col,
        F.when(
            F.col(vec_col).isNotNull() & (F.size(vec_col) == dim), F.col(cell_col)
        ),
    )
    from piperider_spark.operators.sampling import quota_sample

    return quota_sample(assigned, cell_col, id_col, quota)


def centroids_to_df(spark, centroids: np.ndarray) -> DataFrame:
    """Artifact twin (cell, centroid) — same persistence shape as the
    classifier/DSIR model sidecars."""
    C = np.asarray(centroids, dtype=np.float64)
    return spark.createDataFrame(
        [(j, [float(v) for v in C[j]]) for j in range(C.shape[0])],
        "cell int, centroid array<double>",
    )
