"""fastText-style learned language ID — hashed char-n-gram multiclass
softmax, trained distributed, scored as a zero-shuffle projection.

The north rule names fastText language ID as the pipeline's langid stage;
the deployed scorer (signals/core.py `detect_lang_batch`) is the frozen
stopword heuristic with a documented swap seam. This module is the seam's
learned occupant: fastText's linear text classifier (Joulin et al. 2016,
arXiv:1607.01759 "Bag of Tricks for Efficient Text Classification"; the
langid flavor is arXiv:1612.03651) reduced to its published core — a bag
of hashed character n-grams feeding a linear multiclass softmax. Trained
by DISTILLATION from the frozen heuristic (the same pattern as
operators/classifier.py distilling the rule layer), so the learned model
needs no external labels and its agreement with the teacher is testable.

Reference anchor: the reference (piperider) has no learned model — this
belongs to the training-data operator family the repo adds beyond the
reference (reference piperider_cli/profiler/profiler.py profiles columns;
it never classifies text).

Distributed shape — the 10^12-turn story:

  * Featurize (`char_ngram_buckets`) is row-local over a LENGTH-BOUNDED
    prefix (`max_chars`, default 256 — fastText langid reads a prefix
    too): lowercase → truncate → all char n-grams for n in ``ns`` →
    ``xxhash64 mod B`` (md5 twin for portability). ≤ ~500 grams per row
    whatever the document length, so featurize cost is O(rows), not
    O(corpus bytes). IMPORTANT staging contract: the prefix argument must
    be an ALREADY-PROJECTED column (see `langid_prefix`) — an inline
    compound expression would be re-evaluated per gram inside the
    transform lambda (the repo's documented HOF re-evaluation pathology,
    see operators/dedup.py `_window_hashes_from_tokens`).
  * Training (`fit_langid_model`) is full-batch gradient descent with ONE
    bounded-output shuffle per epoch: margins for all K classes come from
    a SINGLE fold over the gram array (``element_at(W, b+1)`` yields
    the bucket's K-vector; ``zip_with`` accumulates — one pass regardless
    of K). The epoch's weights ride the plan as a BROADCAST one-row
    table, not a (B×K) literal — the plan source is epoch-invariant so
    codegen compiles once, and nothing scales with B inside the
    serialized plan (see fit_quality_classifier; arithmetic identical to
    the literal fold, pinned byte-identical). Softmax residuals are
    computed row-local, quantized to 12 dp
    and summed as DECIMAL(38,15) — exact, order-free, so fitted weights
    are BYTE-IDENTICAL across partitionings (the repo's training
    determinism contract, same as fit_quality_classifier). Shuffle output
    is ≤ (n_buckets+1) rows × K decimal sums.
  * Scoring (`langid_scored`) is a stateless row-local projection — the
    staged prefix select, the single margins fold, then argmax — no
    shuffle, streaming-safe (apply to a readStream directly).

At 10^12 turns the per-epoch featurize re-run is avoided the same way the
quality classifier does it: the (label, buckets) projection is persisted
across epochs (~2× the prefix bytes); beyond memory, persist to disk or
accept epochs× scans (the substring family's documented two-scan trade).

Why there is no driver-gated registry entry: the synthetic testdata has no
learnable language signal — ``documents.lang`` is independent of the text
by construction (every language shares one token vocabulary), and the
frozen heuristic's labels over that text reduce to "any stopword present"
(en vs unknown), an OR that a mean-normalizing linear bag model needs
thousands of full-batch epochs to fit (measured: converged numpy GD
reaches 1.0 after ~3000 iterations; 8 epochs — the budget a bench entry
can afford — stay at the class prior, and NBSVM-style binarized features
and naive-Bayes log-ratio initialization both stay at the prior too).
On a genuinely multilingual corpus the model separates perfectly — the
pytest fixture (stopword-dominated 4-language text labeled BY the frozen
teacher) reaches held-out agreement 1.0 in 4 epochs. The family is
therefore pytest-pinned (mirror parity at 1e-9, byte-identical partition
invariance, streaming==batch scorer) and occupies the pipeline's langid
seam via a pre-fitted artifact rather than an in-bench fit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from piperider_spark.functions.text import md5_60bit
from piperider_spark.operators.similarity import arr_lit

__all__ = [
    "langid_prefix",
    "char_ngram_buckets",
    "fit_langid_model",
    "langid_scored",
    "langid_model_to_df",
    "langid_model_from_df",
]

_BIAS_BUCKET = -1
# residual quantization before the exact decimal sum — same contract as
# operators/classifier.py: softmax outputs live in (-1, 1), 12 dp keeps
# ~40 bits and kills JVM-libm ulp jitter below the summed scale
_RESID_DP = 12
_DEC = "decimal(38,15)"
_DEFAULT_NS = (2, 3)
_DEFAULT_MAX_CHARS = 256


def langid_prefix(text: Column | str, max_chars: int = _DEFAULT_MAX_CHARS) -> Column:
    """The bounded, lowercased prefix the featurizer reads. Project this
    ONCE (``.withColumn``/``.select``) and pass the resulting column to
    :func:`char_ngram_buckets` — inlining it would re-evaluate the
    lower+substring per gram inside the transform lambda. NULL text
    becomes the empty prefix (featurizes to zero grams, scores on bias —
    the class prior), matching the classifier's NULL convention."""
    t = F.lower(text if isinstance(text, Column) else F.col(text))
    return F.coalesce(F.substring(t, 1, max_chars), F.lit(""))


def char_ngram_buckets(
    prefix: Column | str,
    n_buckets: int = 2048,
    hash_fn: str = "xxhash64",
    ns: Sequence[int] = _DEFAULT_NS,
    include_words: bool = True,
) -> Column:
    """Hashed gram bucket ids (``array<long>``, one entry per gram
    occurrence) over an already-staged prefix column: char n-grams for
    each n in ``ns`` plus (``include_words``) whitespace-token word
    unigrams prefixed ``"word:"`` — a prefix longer than any char n-gram
    (max(ns) < 5 is enforced), so the two namespaces are string-disjoint
    BY LENGTH, not merely by convention — fastText langid's feature set is exactly char n-grams +
    word n-grams (arXiv:1612.03651 §2). Substring positions are
    codepoint-based (matches python slicing in the test mirrors).

    ``hash_fn``: ``xxhash64`` is the JVM-native engine path; ``md5`` is
    the portable twin (bit-identical in DuckDB / python hashlib) — the
    same twin pattern as dsir.ngram_buckets."""
    p = prefix if isinstance(prefix, Column) else F.col(prefix)
    ln = F.length(p)
    parts = []
    for n in ns:
        n = int(n)
        parts.append(
            F.when(
                ln >= n,
                F.transform(
                    F.sequence(F.lit(1), ln - F.lit(n - 1)),
                    lambda i, n=n: p.substr(i, F.lit(n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )
    if include_words:
        # split on whitespace runs; filter the empty leading/trailing
        # fragments split() emits, then namespace with "word:" — a prefix
        # LONGER than any char n-gram (max(ns) < 5), so no word-feature
        # string can ever EQUAL a char-gram string (review finding: the
        # old "w " prefix made the word feature for "a" the same string
        # as the char trigram "w a", a systematic cross-namespace alias
        # polluting the high-signal single-letter word features)
        if max(ns) >= 5:
            raise ValueError(
                f"ns={tuple(ns)}: char n-grams of length >= 5 could equal a "
                "'word:'-prefixed word feature — keep max(ns) < 5 (the "
                "namespace-disjointness invariant)"
            )
        words = F.filter(F.split(p, r"\s+"), lambda w: w != F.lit(""))
        parts.append(F.transform(words, lambda w: F.concat(F.lit("word:"), w)))
    grams = parts[0] if len(parts) == 1 else F.concat(*parts)
    if hash_fn == "xxhash64":
        return F.transform(grams, lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets)))
    return F.transform(grams, lambda g: F.pmod(md5_60bit(g), F.lit(n_buckets)))


def _margins_fold_expr(bks: Column, warr: Column, barr: Column, k: int) -> Column:
    """K-class margins from ONE pass over the gram-bucket array:
    ``element_at(warr, b+1)`` is the bucket's K-vector, ``zip_with``
    accumulates; the sum is MEAN-normalized by the gram count (fastText
    averages the bag vectors — margins are text-length invariant and the
    full-batch gradient is well conditioned) and the bias vector is added
    once at the end. ``warr``/``barr`` may be literals (the scorer) or
    broadcast one-row-table columns (the trainer) — same arithmetic
    either way. Evaluate over a STAGED bucket-array column and stage
    the result before fanning out (softmax reads it K+2 times)."""
    folded = F.aggregate(
        bks,
        F.array_repeat(F.lit(0.0), k),
        lambda acc, b: F.zip_with(
            acc,
            F.element_at(warr, b.cast("int") + 1),
            lambda a, w: a + w,
        ),
    )
    inv_n = F.lit(1.0) / F.greatest(F.size(bks).cast("double"), F.lit(1.0))
    return F.zip_with(folded, barr, lambda m, b: m * inv_n + b)


def _margins_fold(bks: Column, W: list[list[float]], bias: list[float]) -> Column:
    """Literal-weights form of :func:`_margins_fold_expr` — the SCORER
    path (one-time plan, stateless, streaming-safe)."""
    # the literal is indexed by BUCKET: entry b is that bucket's K-vector
    # (W itself is class-major: K lists of n_buckets)
    n_b = len(W[0])
    # arr_lit, not F.lit: the bucket-major weight literal is n_b×K doubles
    # (8192 at B=2048, K=4) — py4j element-wise construction costs seconds
    # per scorer build; the SQL-text parse is ~10 ms, identical values
    lit_w = arr_lit([[float(W[j][b]) for j in range(len(W))] for b in range(n_b)])
    return _margins_fold_expr(bks, lit_w, arr_lit(list(bias)), len(bias))


def fit_langid_model(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n_buckets: int = 2048,
    epochs: int = 12,
    lr: float = 2.0,
    momentum: float = 0.9,
    l2: float = 1e-6,
    hash_fn: str = "xxhash64",
    ns: Sequence[int] = _DEFAULT_NS,
    max_chars: int = _DEFAULT_MAX_CHARS,
    include_words: bool = True,
) -> dict:
    """Train the multiclass softmax; returns ``{"classes": [K labels,
    sorted], "weights": K lists of n_buckets floats, "bias": [K],
    "n_buckets", "hash_fn", "ns", "max_chars", "include_words"}``.

    EAGER: one classes-collect, one count, then ``epochs`` Spark jobs
    (one bounded shuffle each). Labels must be non-NULL (the teacher
    heuristic never emits NULL; a NULL label raises). Deterministic by
    construction: quantized-decimal gradient sums are order-free, driver
    updates are plain float64 — two fits on any partitioning of the same
    rows return byte-identical weights."""
    from piperider_spark.operators.dedup import _ensure_parallel

    lbl = F.col(label_col).cast("string")
    classes = sorted(
        r[0] for r in df.select(lbl.alias("_l")).distinct().collect() if r[0] is not None
    )
    if not classes:
        raise ValueError("fit_langid_model: empty training input")
    k = len(classes)
    # 0-based class index; array_position(arr, NULL) is NULL, so a NULL
    # label coalesces to -1 and trips the guard below
    y_idx = F.coalesce(F.array_position(F.lit(classes), lbl) - 1, F.lit(-1))
    feats = (
        _ensure_parallel(df)
        .select(
            y_idx.cast("int").alias("_y"),
            langid_prefix(text_col, max_chars).alias("_pfx"),
        )
        .select(
            "_y",
            char_ngram_buckets("_pfx", n_buckets, hash_fn, ns, include_words).alias(
                "_bks"
            ),
        )
        .persist()
    )
    try:
        n_rows = feats.count()
        if feats.where(F.col("_y") < 0).limit(1).count():
            raise ValueError("fit_langid_model: NULL training label")
        W = [[0.0] * n_buckets for _ in range(k)]
        bias = [0.0] * k
        # heavy-ball momentum lives entirely on the driver — plain float64,
        # deterministic; it buys ~1/(1-mu) effective step size, which
        # full-batch GD needs (fastText's per-example SGD makes epochs×n
        # updates; we make epochs)
        vW = [[0.0] * n_buckets for _ in range(k)]
        vb = [0.0] * k
        spark = df.sparkSession
        for ep in range(epochs):
            if ep == 0:
                # zero init: the fold over W≡0 is identically the bias
                # vector — skip the fold (and the weights broadcast)
                base = feats
                margins = F.lit([float(b) for b in bias])
            else:
                # weights as DATA (broadcast one-row table, bucket-major
                # K-vectors), not a (B×K) literal: the plan source is
                # epoch-invariant so codegen compiles once, and nothing
                # scales with B inside the serialized plan — same
                # rationale as fit_quality_classifier, same arithmetic
                # as the literal fold (byte-identical weights, pinned)
                n_b = len(W[0])
                wdf = spark.createDataFrame(
                    [
                        (
                            [[float(W[j][b]) for j in range(k)] for b in range(n_b)],
                            [float(b) for b in bias],
                        )
                    ],
                    "_warr array<array<double>>, _barr array<double>",
                )
                base = feats.crossJoin(F.broadcast(wdf))
                margins = _margins_fold_expr(
                    F.col("_bks"), F.col("_warr"), F.col("_barr"), k
                )
            staged = base.select("_y", "_bks", margins.alias("_m"))
            mx = F.array_max("_m")
            z = F.aggregate(
                F.transform("_m", lambda m: F.exp(m - mx)),
                F.lit(0.0),
                lambda a, e: a + e,
            )
            # per-class residual p_j − y_j; ∂margin/∂w[b] is count_b/n
            # (the mean normalization), so the per-GRAM contribution is
            # resid/n while the bias (input 1) keeps the raw resid. Both
            # are quantized to 12 dp AFTER their scaling, cast to exact
            # decimal, and ride ONE shuffle as struct fields.
            inv_n = F.lit(1.0) / F.greatest(
                F.size("_bks").cast("double"), F.lit(1.0)
            )
            raw = [
                (
                    F.exp(F.element_at("_m", j + 1) - mx) / z
                    - (F.col("_y") == j).cast("double")
                ).alias(f"_raw{j}")
                for j in range(k)
            ]
            staged = staged.select("_bks", inv_n.alias("_invn"), *raw)
            staged = staged.select(
                "_bks",
                *[
                    F.round(F.col(f"_raw{j}") * F.col("_invn"), _RESID_DP)
                    .cast(_DEC)
                    .alias(f"_rg{j}")
                    for j in range(k)
                ],
                *[
                    F.round(F.col(f"_raw{j}"), _RESID_DP).cast(_DEC).alias(f"_rb{j}")
                    for j in range(k)
                ],
            )
            gram_structs = F.transform(
                F.col("_bks"),
                lambda b: F.struct(
                    b.cast("long").alias("bucket"),
                    *[F.col(f"_rg{j}").alias(f"r{j}") for j in range(k)],
                ),
            )
            bias_struct = F.struct(
                F.lit(_BIAS_BUCKET).cast("long").alias("bucket"),
                *[F.col(f"_rb{j}").alias(f"r{j}") for j in range(k)],
            )
            grad = (
                staged.select(
                    F.explode(
                        F.concat(gram_structs, F.array(bias_struct))
                    ).alias("e")
                )
                .groupBy(F.col("e.bucket").alias("bucket"))
                .agg(*[F.sum(f"e.r{j}").alias(f"g{j}") for j in range(k)])
                .collect()
            )
            for r in grad:
                b = int(r["bucket"])
                for j in range(k):
                    g = float(r[f"g{j}"]) / n_rows
                    if b == _BIAS_BUCKET:
                        vb[j] = momentum * vb[j] + g
                        bias[j] -= lr * vb[j]
                    else:
                        vW[j][b] = momentum * vW[j][b] + g + l2 * W[j][b]
                        W[j][b] -= lr * vW[j][b]
        return {
            "classes": classes,
            "weights": W,
            "bias": bias,
            "n_buckets": n_buckets,
            "hash_fn": hash_fn,
            "ns": tuple(int(n) for n in ns),
            "max_chars": max_chars,
            "include_words": bool(include_words),
        }
    finally:
        feats.unpersist()


def langid_scored(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_lang: str = "ft_lang",
    out_prob: str = "ft_lang_prob",
) -> DataFrame:
    """Attach the model's prediction as two columns. Three chained
    row-local projections (prefix → gram buckets → margins, each staged
    so no HOF re-evaluates its input) — no shuffle, stateless,
    streaming-safe. Columns beyond the two outputs pass through."""
    pfx = langid_prefix(text_col, model["max_chars"])
    bks = char_ngram_buckets(
        "__pfx",
        model["n_buckets"],
        model["hash_fn"],
        model["ns"],
        model.get("include_words", True),
    )
    staged = df.withColumn("__pfx", pfx).withColumn("__bks", bks)
    m = _margins_fold(F.col("__bks"), model["weights"], model["bias"])
    staged = staged.withColumn("__m", m)
    mx = F.array_max("__m")
    z = F.aggregate(
        F.transform("__m", lambda x: F.exp(x - mx)), F.lit(0.0), lambda a, e: a + e
    )
    lang = F.element_at(
        F.lit(model["classes"]), F.array_position(F.col("__m"), mx).cast("int")
    )
    return (
        staged.withColumn(out_lang, lang)
        .withColumn(out_prob, F.round(F.lit(1.0) / z, 9))
        .drop("__pfx", "__bks", "__m")
    )


_MODEL_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("class", StringType(), False),
        StructField("weight", DoubleType(), False),
    ]
)


def langid_model_to_df(spark, model: dict) -> DataFrame:
    """Shippable artifact in long form: (bucket, class, weight) with the
    bias at bucket −1; the class set and order are recoverable from the
    rows (classes are stored sorted). Featurizer settings (hash_fn, ns,
    max_chars) travel out-of-band — the pipeline stores them in the
    sidecar meta JSON, the same convention as the quality classifier's
    hash_fn. Round-trips through :func:`langid_model_from_df`."""
    rows = []
    for j, c in enumerate(model["classes"]):
        rows.append((_BIAS_BUCKET, c, float(model["bias"][j])))
        rows.extend((i, c, float(x)) for i, x in enumerate(model["weights"][j]))
    return spark.createDataFrame(rows, _MODEL_SCHEMA)


def langid_model_from_df(
    df: DataFrame,
    hash_fn: str = "xxhash64",
    ns: Sequence[int] = _DEFAULT_NS,
    max_chars: int = _DEFAULT_MAX_CHARS,
    include_words: bool = True,
) -> dict:
    """Inverse of :func:`langid_model_to_df` (bounded collect:
    K×(n_buckets+1) rows)."""
    by_class: dict[str, dict[int, float]] = {}
    for r in df.collect():
        by_class.setdefault(r["class"], {})[int(r["bucket"])] = float(r["weight"])
    classes = sorted(by_class)
    if not classes:
        raise ValueError("langid_model_from_df: empty artifact")
    n = max(b for m in by_class.values() for b in m) + 1
    W, bias = [], []
    for c in classes:
        m = by_class[c]
        bias.append(m.pop(_BIAS_BUCKET, 0.0))
        w = [0.0] * n
        for b, x in m.items():
            w[b] = x
        W.append(w)
    return {
        "classes": classes,
        "weights": W,
        "bias": bias,
        "n_buckets": n,
        "hash_fn": hash_fn,
        "ns": tuple(int(x) for x in ns),
        "max_chars": max_chars,
        "include_words": bool(include_words),
    }
