"""Learned quality classifier — fastText-style hashed-n-gram logistic
regression, trained distributed, scored as a zero-shuffle projection.

The heuristic gates (rules/spec.py, operators/quality.py) give every turn
a cheap keep/drop label; production pipelines then DISTILL those labels
(or a small human-labeled set) into a learned classifier whose score
generalizes past the hand-written thresholds — the fastText-classifier
stage of CCNet/LLaMA-style curation. This module is that stage, built on
the same single-sourced featurizer DSIR uses (`dsir.ngram_buckets`:
hashed uni+bigram occurrence buckets, md5 oracle twin / xxhash64 engine
twin).

Distributed shape — one partial-agg shuffle per epoch, scoring shuffle-free:

  * Full-batch gradient descent on B-bounded features. Each epoch:
    margin per row is computed ROW-LOCAL from the current weights riding
    the plan as a BROADCAST one-row table (`crossJoin(broadcast(w))` +
    the same `F.aggregate` fold the literal-based `dsir_score_col`
    uses); the residual ``sigmoid(margin) - y`` multiplies each bucket
    occurrence; explode → groupBy(bucket) → sum — ONE shuffle whose
    output is ≤ n_buckets+1 rows (the bias gradient rides the same
    shuffle as a sentinel bucket −1).
  * **Weights travel as data, not literals, during training**: an
    ``F.lit(w)`` array changes the plan every epoch, so every epoch pays
    Janino codegen of the surrounding stages (measured 1.7 s/epoch at
    B=1024 — and at a production-fastText B of 10^6 the literal would
    embed megabytes into every task's serialized plan per epoch). The
    broadcast one-row table keeps the generated source epoch-invariant
    (codegen cache hits after epoch 1) and ships the weights once per
    epoch via torrent broadcast. The fold arithmetic is unchanged —
    ``element_at`` over the broadcast column visits the same values in
    the same order — so fitted weights are byte-identical to the
    literal formulation (pinned). Scoring keeps the literal form: a
    one-time plan that must stay stateless/streaming-safe.
  * **Exact, order-free gradient sums**: per-row residuals are quantized
    to 12 dp and summed as DECIMAL(38,15) — decimal addition is
    associative-exact, so the fitted weights are BYTE-IDENTICAL across
    partitionings and input orders (a float64 sum would drift by ulps
    with partition count; the repo's determinism contract extends to
    training).
  * The (label, buckets) projection is persisted across epochs —
    featurize once, not epochs×; the persisted columns are the hashed
    bucket array + one double, ~2× the text bytes. At 10^12 turns,
    either persist to disk-backed storage or accept epochs× re-featurize
    (scan-bound, the substring family's documented two-scan trade).
  * Scoring (`classifier_score_col`) is a stateless row-local projection
    — no shuffle, streaming-safe, the 10^12-turn deployment shape.

Reference anchor: PipeRider's assertion engine turns profile metrics into
pass/fail rules (reference piperider_cli/assertion_engine) — this is the
learned generalization of that rule layer for text quality.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

from piperider_spark.operators.dsir import ngram_buckets
from piperider_spark.operators.similarity import arr_lit

__all__ = [
    "fit_quality_classifier",
    "classifier_score_col",
    "model_to_df",
    "model_from_df",
]

_BIAS_BUCKET = -1
# residual quantization: kills libm ulp jitter before the exact decimal
# sum; 12 dp on values in (-1, 1) keeps ~40 bits of the residual
_RESID_DP = 12
_DEC = "decimal(38,15)"


def _margin_col(text: Column | str, w: Sequence[float], bias: float, hash_fn: str) -> Column:
    """Row-local margin w·x + b via one array-literal fold (the
    dsir_score_col shape — no explode, no join)."""
    # arr_lit, not F.lit: py4j element-wise literal construction costs
    # ~0.5 s at B=1024 PER SCORER BUILD; the SQL-text parse is ~5 ms with
    # identical double values (similarity.arr_lit, pinned in tests)
    lit_arr = arr_lit(list(w))
    bks = ngram_buckets(text, n_buckets=len(w), hash_fn=hash_fn)
    return (
        F.aggregate(
            bks,
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(lit_arr, b.cast("int") + 1),
        )
        + F.lit(float(bias))
    )


def fit_quality_classifier(
    df: DataFrame,
    label_col: str = "keep",
    text_col: str = "text",
    n_buckets: int = 4096,
    epochs: int = 8,
    lr: float = 0.5,
    l2: float = 1e-6,
    hash_fn: str = "xxhash64",
) -> dict:
    """Train the logistic model; returns
    ``{"weights": list[float], "bias": float, "n_buckets", "hash_fn"}``.

    EAGER: runs ``epochs`` Spark jobs at call time (one bounded-output
    shuffle each) plus one count. ``label_col`` is coerced to double
    (booleans welcome). Rows with NULL text featurize to the empty bucket
    array and contribute only to the bias — same convention as scoring.
    Deterministic by construction: quantized-decimal gradient sums are
    order-free and the driver update is plain float64 — two fits on any
    partitioning of the same rows return byte-identical weights.
    """
    from piperider_spark.operators.dedup import _ensure_parallel

    y = F.col(label_col).cast("double")
    # single-file inputs arrive as ONE partition — featurize would run
    # single-task (measured 4.6 s vs 0.6 s at sf0.1); same guard as the
    # dedup/dsir families
    feats = _ensure_parallel(df).select(
        y.alias("_y"),
        ngram_buckets(text_col, n_buckets, hash_fn).alias("_bks"),
    ).persist()
    try:
        # one agg: row count AND the NULL-label census. A NULL label makes
        # resid NULL, which F.sum silently drops from every gradient while
        # the row still inflates the n_rows divisor — at 50% NULL labels
        # every gradient is halved with no error (review finding; the
        # sibling fit_langid_model already raises on NULL labels).
        crow = feats.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("_y").isNull()).alias("nn"),
        ).collect()[0]
        n_rows, n_null = crow["n"], crow["nn"]
        if n_rows == 0:
            raise ValueError("fit_quality_classifier: empty training input")
        if n_null:
            raise ValueError(
                f"fit_quality_classifier: {n_null} rows have a NULL "
                f"{label_col!r} label — drop or impute them first (NULL "
                "residuals silently vanish from the gradient sums while "
                "still counting in the divisor)"
            )
        spark = df.sparkSession
        w = [0.0] * n_buckets
        bias = 0.0
        for ep in range(epochs):
            if ep == 0:
                # zero init: the fold over w≡0 is identically 0.0 — skip
                # the fold (and the weights broadcast) for the first epoch
                base = feats
                margin = F.lit(0.0) + F.lit(bias)
            else:
                # weights as DATA (broadcast one-row table), not a literal:
                # the plan source is epoch-invariant, so codegen compiles
                # once; the fold visits the same values in the same order
                # as the literal form — byte-identical weights (pinned)
                wdf = spark.createDataFrame(
                    [([float(x) for x in w], float(bias))],
                    "_warr array<double>, _wb double",
                )
                base = feats.crossJoin(F.broadcast(wdf))
                margin = (
                    F.aggregate(
                        F.col("_bks"),
                        F.lit(0.0),
                        lambda acc, b: acc
                        + F.element_at(F.col("_warr"), b.cast("int") + 1),
                    )
                    + F.col("_wb")
                )
            resid = F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)) - F.col("_y"), _RESID_DP
            ).cast(_DEC)
            grad = (
                base.select(
                    resid.alias("_r"),
                    F.concat(
                        F.col("_bks"), F.array(F.lit(_BIAS_BUCKET).cast("long"))
                    ).alias("_b"),
                )
                .select("_r", F.explode("_b").alias("bucket"))
                .groupBy("bucket")
                .agg(F.sum("_r").alias("g"))
                .collect()
            )
            for r in grad:
                g = float(r["g"]) / n_rows
                b = int(r["bucket"])
                if b == _BIAS_BUCKET:
                    bias -= lr * g
                else:
                    w[b] -= lr * (g + l2 * w[b])
        return {
            "weights": w,
            "bias": bias,
            "n_buckets": n_buckets,
            "hash_fn": hash_fn,
        }
    finally:
        feats.unpersist()


def classifier_score_col(text: Column | str, model: dict) -> Column:
    """Keep-probability under a fitted model: ``sigmoid(w·x + b)`` as one
    row-local array-literal fold — no shuffle, stateless (apply to a
    readStream directly), rounded to 9 dp. ``model["hash_fn"]`` must match
    the featurizer the weights were trained with (enforced here by reading
    it from the model, never from a caller argument)."""
    m = _margin_col(text, model["weights"], model["bias"], model["hash_fn"])
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-m)), 9)


_MODEL_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("weight", DoubleType(), False),
    ]
)


def model_to_df(spark, model: dict) -> DataFrame:
    """Shippable artifact: (bucket, weight) with the bias at bucket −1.
    hash_fn/n_buckets travel in the row shape (n_buckets = row count − 1)
    plus a convention: xxhash64 unless the artifact path says otherwise —
    callers that need the md5 twin should store the model dict's JSON
    next to it. Round-trips through :func:`model_from_df`."""
    rows = [(_BIAS_BUCKET, float(model["bias"]))] + [
        (i, float(x)) for i, x in enumerate(model["weights"])
    ]
    return spark.createDataFrame(rows, _MODEL_SCHEMA)


def model_from_df(df: DataFrame, hash_fn: str = "xxhash64") -> dict:
    """Inverse of :func:`model_to_df` (bounded collect: n_buckets+1 rows)."""
    rows = {int(r["bucket"]): float(r["weight"]) for r in df.collect()}
    bias = rows.pop(_BIAS_BUCKET, 0.0)
    n = max(rows) + 1 if rows else 0
    w = [0.0] * n
    for b, x in rows.items():
        w[b] = x
    return {"weights": w, "bias": bias, "n_buckets": n, "hash_fn": hash_fn}
