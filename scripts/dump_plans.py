"""Dump formatted physical plans for key queries → PLANS.md.

Run after plan-affecting changes: python scripts/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from piperider_spark import queries as qmod  # noqa: E402
from piperider_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

PLAN_QUERIES = [
    (
        "profile_numeric_orders",
        "fused scalar aggregates + value-counts quantiles cross-joined — no "
        "five-buffer percentile_disc double exchange",
    ),
    ("q1_pricing_summary", "partial (map-side) aggregation before the tiny shuffle"),
    ("revenue_by_nation", "BroadcastHashJoin on both dims — no fact shuffle for the join"),
    ("supplier_nation_revenue", "chain of broadcast joins over the fact scan"),
    ("filter_pushdown_orders", "PushedFilters reach the parquet scan; 2-column ReadSchema"),
    ("topk_event_type", "TakeOrderedAndProject — no global sort for top-k"),
    ("quantiles_lineitem", "one value-counts shuffle; cumsum window PARTITIONED by domain bucket (no single-task global-order stage)"),
    ("cosine_topk_embeddings", "codegen'd zip_with/aggregate dot product, TakeOrdered"),
    ("minhash_documents", "explode + ONE partial-aggregated groupBy(doc) + row-local band keys"),
    (
        "minhash_lsh_pairs_fast",
        "bucket cap = partial HashAggregate + BroadcastHashJoin LeftAnti of "
        "oversized keys (no count-over-window — a mega-bucket never lands on "
        "one task)",
    ),
    ("profile_array_embeddings", "array flatten: explode over a pruned single-column scan"),
    (
        "canonical_documents",
        "quality-canonical retention: all partial-aggregable (max/min + joins), "
        "no per-group window — a mega duplicate-group never lands on one task",
    ),
    (
        "quota_sample_documents",
        "quota sampling: broadcast per-stratum hash thresholds prune dominant "
        "strata before the exact rank window",
    ),
    (
        "contamination_flags_documents",
        "decontamination: eval shingles broadcast; the corpus side never "
        "shuffles non-matching rows",
    ),
    (
        "gopher_quality_documents",
        "Gopher non-repetition quality rules: ZERO exchanges — a pure "
        "projection over the scan (whole-stage codegen)",
    ),
    (
        "c4_filter_documents",
        "C4 line/document filters: zero exchanges, kept-lines text rebuilt "
        "row-locally",
    ),
    (
        "source_quality_documents",
        "per-source rollup: partial-aggregated groupBy(source); the "
        "distinct-fingerprint count is the only two-stage aggregate",
    ),
    (
        "retention_documents",
        "per-cluster argmax via partial-agg max(struct) + equi-join — no "
        "window over a mega-cluster",
    ),
    (
        "dsir_documents",
        "DSIR: row-local hashed-ngram featurize; B-bounded fit aggs; "
        "log-ratio table broadcast-joined into the scoring pass; "
        "Gumbel-top-k as TakeOrderedAndProject (no global sort)",
    ),
    (
        "embedding_near_dup_pairs",
        "semdedup leg: broadcast centroid literal (row-local cell + "
        "centroid_sim), ONE shuffle on cell for the bounded self-join, "
        "partial-agg witness max",
    ),
    (
        "bloom_incremental_documents",
        "Bloom gate probe: ZERO exchanges — JVM xxhash64 positions + "
        "broadcast-bitset ArrowEvalPython over the scan (the history "
        "compaction ran eagerly, once; this is the per-batch plan)",
    ),
    (
        "window_seen_documents",
        "window-grain Bloom probe: ZERO exchanges — row-local JVM window "
        "hashes + positions, broadcast-bitset ArrowEvalPython (the "
        "dup-only history compaction ran eagerly, once; this is the "
        "per-batch / per-micro-batch plan)",
    ),
    (
        "dup_substring_fast",
        "exact-substring duplication: row-local window stream, ONE "
        "partial-agg shuffle on the window hash, dup-hash set joined back "
        "(one row per hash — no skew amplification), per-doc lag Window "
        "PARTITIONED by doc_id",
    ),
    (
        "bpe_word_counts",
        "BPE word counts (the only corpus-sized stage of bpe_train_documents "
        "— the merge loop runs driver-side on this collected Heaps'-bounded "
        "table): explode over a pruned single-column scan + ONE partial "
        "HashAggregate shuffle, TakeOrderedAndProject top-words cap",
    ),
    (
        "classifier_gradient_epoch",
        "one training epoch of the learned quality classifier: weights ride "
        "a BROADCAST one-row table (BroadcastNestedLoopJoin against the "
        "corpus — plan source identical every epoch, codegen compiles once, "
        "nothing scales with B inside the serialized plan), margin = fold "
        "over the broadcast weight column (row-local), residual times "
        "exploded bucket occurrences, ONE partial HashAggregate shuffle "
        "whose output is <= n_buckets+1 rows (bias gradient rides as "
        "sentinel bucket -1); decimal sums keep it order-free",
    ),
    (
        "kmeans_assign",
        "full-corpus k-means assignment: centroid matrix rides as ONE "
        "broadcast array literal, ZERO exchanges — a pure projection, "
        "stateless, streaming-safe",
    ),
    (
        "kmeans_update_round",
        "one Lloyd-round update: centroids ride a BROADCAST one-row table "
        "(round-invariant plan source — codegen once, plan size independent "
        "of k*dim), row-local assignment -> posexplode -> "
        "ONE partial HashAggregate shuffle on (cell, dim) whose output is "
        "<= k*dim rows at any corpus size; decimal coordinate sums keep "
        "the refined centroids byte-identical across partitionings",
    ),
    (
        "langid_scorer",
        "learned-langid scoring (the pipeline --langid-model projection): "
        "staged prefix -> staged gram buckets -> ONE margins fold yielding "
        "all K class scores (element_at(lit(W), b+1) is the bucket's "
        "K-vector) -> argmax — ZERO exchanges, stateless, streaming-safe",
    ),
    (
        "pq_adc_search",
        "IVF-PQ compressed-domain search: IVF cell filter (partition "
        "filter on the at-rest layout) + ONE constant-size encode walk "
        "(transform over sequence(0,m-1) — tree independent of m) feeding "
        "the zip_with+aggregate ADC LUT fold, TakeOrderedAndProject — "
        "ZERO exchanges besides the top-k; no raw vector read when codes "
        "are stored",
    ),
    (
        "pq_refine_round",
        "one PQ Lloyd round over ALL m subspaces: codebooks+biases ride a "
        "BROADCAST one-row table (round-invariant plan source), row-local "
        "codes -> posexplode -> ONE partial HashAggregate shuffle on "
        "(subspace, cell, sub-dim) whose output is <= m*ksub*dsub rows at "
        "any corpus size; decimal coordinate sums keep refined codebooks "
        "byte-identical across partitionings",
    ),
]

# plans built directly (not a registry entry, or the registry entry
# materializes eagerly and returns a driver-local table)
def _bpe_word_counts_plan(spark):
    from piperider_spark.operators.bpe import bpe_word_counts

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return bpe_word_counts(docs, min_count=2, top_words=20000)


def _classifier_epoch_plan(spark):
    from pyspark.sql import functions as F

    from piperider_spark.operators.dsir import ngram_buckets

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feats = docs.select(
        F.lit(1.0).alias("_y"),
        ngram_buckets("text", 1024, "xxhash64").alias("_bks"),
    )
    w = [0.01] * 1024
    wdf = spark.createDataFrame(
        [(w, 0.0)], "_warr array<double>, _wb double"
    )
    base = feats.crossJoin(F.broadcast(wdf))
    margin = (
        F.aggregate(
            F.col("_bks"),
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(F.col("_warr"), b.cast("int") + 1),
        )
        + F.col("_wb")
    )
    resid = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)) - F.col("_y"), 12
    ).cast("decimal(38,15)")
    return (
        base.select(
            resid.alias("_r"),
            F.concat(F.col("_bks"), F.array(F.lit(-1).cast("long"))).alias("_b"),
        )
        .select("_r", F.explode("_b").alias("bucket"))
        .groupBy("bucket")
        .agg(F.sum("_r").alias("g"))
    )


def _langid_scorer_plan(spark):
    from piperider_spark.operators.langid_model import langid_scored

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    model = {
        "classes": ["de", "en", "fr"],
        "weights": [[0.01] * 512 for _ in range(3)],
        "bias": [0.0, 0.1, 0.0],
        "n_buckets": 512,
        "hash_fn": "xxhash64",
        "ns": (2, 3),
        "max_chars": 256,
        "include_words": True,
    }
    return langid_scored(docs.select("doc_id", "text"), model, "text")


def _kmeans_assign_plan(spark):
    from piperider_spark.operators.kmeans import kmeans_assign
    from piperider_spark.operators.similarity import _ivf_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return kmeans_assign(emb, _ivf_centroids(64, 16))


def _kmeans_update_plan(spark):
    from piperider_spark.operators.kmeans import kmeans_update_agg
    from piperider_spark.operators.similarity import _ivf_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return kmeans_update_agg(emb, _ivf_centroids(64, 16))


def _pq_adc_search_plan(spark):
    from piperider_spark.operators import pq
    from piperider_spark.operators.similarity import _ivf_centroids, ivf_cell, probe_cells
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = emb.where("vec_id = 0").select("embedding").first()[0]
    books = pq.train_pq_from_df(emb, m=8, ksub=16, iters=4)
    cents = _ivf_centroids(64, 16)
    probe = probe_cells(cents, qvec, 4)
    cell = ivf_cell(F.col("embedding"), cents)
    return pq.pq_topk(emb.where(cell.isin(probe)), books, list(qvec), topk=10)


def _pq_refine_round_plan(spark):
    from piperider_spark.operators import pq

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq.train_pq_from_df(emb, m=8, ksub=16, iters=2)
    return pq.pq_update_agg(emb, books)


DIRECT_PLANS = {
    "kmeans_assign": _kmeans_assign_plan,
    "kmeans_update_round": _kmeans_update_plan,
    "pq_adc_search": _pq_adc_search_plan,
    "pq_refine_round": _pq_refine_round_plan,
    "bpe_word_counts": _bpe_word_counts_plan,
    "classifier_gradient_epoch": _classifier_epoch_plan,
    "langid_scorer": _langid_scorer_plan,
}


def pipeline_pruning_section(spark) -> list[str]:
    """Show the pipeline wave scan pruning to its bucket directories."""
    import tempfile

    from pyspark.sql import functions as F

    from piperider_spark.datagen import write_transcripts_parquet
    from piperider_spark.pipeline import run_pipeline

    d = tempfile.mkdtemp()
    write_transcripts_parquet(f"{d}/in.parquet", n_turns=2000, seed=5)
    run_pipeline(spark, f"{d}/in.parquet", f"{d}/out", n_buckets=8, wave_buckets=4)
    plan = (
        spark.read.parquet(f"{d}/out/staged")
        .where(F.col("bucket").isin([0, 1]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    scan = next(
        (line.strip() for line in plan.splitlines() if "FileScan" in line), ""
    )
    return [
        "## pipeline wave scan (staged bucketed input)",
        "",
        "*a wave's bucket predicate prunes to its directories at the scan — "
        "resume and every wave read only their own bytes*",
        "",
        "```",
        scan.split("Batched")[0].strip(),
        m.group(0) if m else "PartitionFilters: (not found)",
        "```",
        "",
    ]


def main() -> None:
    spark = get_spark("plans", cores=8, shuffle_partitions=16)
    # Plan-inspection mode: several operators are MATERIALIZING (they
    # localCheckpoint their result so internal caches can be released —
    # minhash_lsh_pairs, quota_sample, concat_chunk_pack). explain() on
    # their returned frame would show only a checkpoint scan; no-op'ing
    # localCheckpoint here surfaces the real executed plan. Dump-only
    # monkeypatch, never active in production code paths.
    import pyspark.sql.classic.dataframe as _classic

    _classic.DataFrame.localCheckpoint = lambda self, eager=True: self

    out = [
        "# PLANS — physical-plan evidence for headline queries",
        "",
        "Generated by `scripts/dump_plans.py` (`.explain('formatted')` at sf0.01;",
        "materializing operators' internal localCheckpoints are no-op'd during",
        "the dump so their full plans are visible instead of a checkpoint scan).",
        "What to look for per plan is noted above each block; the pipeline's plan",
        "is discussed in BASELINE.md (scaling notes) and pipeline.py docstrings.",
        "",
    ]
    fns = qmod.queries()
    for name, note in PLAN_QUERIES:
        df = DIRECT_PLANS[name](spark) if name in DIRECT_PLANS else fns[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        # keep the operator tree + scan details; drop the long per-node column dumps
        lines = plan.splitlines()
        tree_end = next(
            (i for i, line in enumerate(lines) if line.startswith("(1)")), len(lines)
        )
        tree = lines[:tree_end]
        scan_bits = [
            line
            for line in lines[tree_end:]
            if line.startswith(("(", "PushedFilters", "ReadSchema", "Batched", "Arguments: "))
            and not line.startswith("Arguments: [")
        ]
        out += [f"## {name}", "", f"*{note}*", "", "```"]
        out += [line for line in tree if line.strip()]
        out += [line for line in scan_bits if "PushedFilters" in line or "ReadSchema" in line]
        out += ["```", ""]
    out += pipeline_pruning_section(spark)
    Path("PLANS.md").write_text("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
