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
# Working-dir base: default the shared virtio disk; the scaling
# protocol can point this at /dev/shm (tmpfs) to model per-node disk
# bandwidth, which on a real N- vs 4N-node cluster scales with nodes
# but on this single box is ONE device shared by both legs.
BENCH_BASE = os.environ.get("MYAKU_BENCH_DIR", "/tmp/myaku_bench")
CORPUS_DIR = f"{BENCH_BASE}/pages_{BENCH_PAGES}"
QUERY_REPEATS = 5


def _ray_init(num_cpus: int) -> None:
    import ray

    # Ray Data passes each actor pool's MapTransformer through the object
    # store, so the DRIVER's core_worker logs a restart-safety ERROR for
    # every actor-pool stage (ray#53727) — unconditional in this Ray
    # version, nothing user code can change (verified with a trivial
    # map_batches(C, concurrency=2)).  glog level must be set before init.
    os.environ.setdefault("RAY_BACKEND_LOG_LEVEL", "fatal")
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
    index_dir = f"{BENCH_BASE}/index_{num_cpus}"
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


def bench_queries(index_dir: str, corpus_dir: str | None = None) -> dict:
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
    out = {
        "query_p50_ms": round(statistics.median(lats), 2),
        "query_p95_ms": round(lats[int(len(lats) * 0.95)], 2),
        "query_cold_p50_ms": round(statistics.median(cold), 2),
        "query_cold_p95_ms": round(cold[int(len(cold) * 0.95)], 2),
        "n_queries": len(lats),
    }
    if corpus_dir is not None:
        # fuzzy did-you-mean serving: first call pays the lazy SymSpell
        # map build over the vocab (cold), later calls are map lookups
        from myaku_ray.oracle import suggest_query_set

        sqs = suggest_query_set(corpus_dir)
        t0 = time.time()
        s.suggest(sqs[0], 5)
        map_build_ms = (time.time() - t0) * 1000
        warm = []
        for _ in range(QUERY_REPEATS):
            for q in sqs:
                t0 = time.time()
                s.suggest(q, 5)
                warm.append((time.time() - t0) * 1000)
        out.update(
            {
                "suggest_map_build_ms": round(map_build_ms, 1),
                "suggest_p50_ms": round(statistics.median(warm), 3),
                "suggest_n_queries": len(sqs),
            }
        )
    # PRF expansion + significant-terms serving cost: both pay one
    # plain query + fb-doc hydration + tokenize; PRF adds the second
    # (|q|+E)-term disjunctive pass (first-pass memo warm by now)
    prf_ms, sig_ms = [], []
    for q in qs:
        t0 = time.time()
        s.topk_prf(q, 10)
        prf_ms.append((time.time() - t0) * 1000)
        t0 = time.time()
        s.significant_terms(q)
        sig_ms.append((time.time() - t0) * 1000)
    out["prf_p50_ms"] = round(statistics.median(prf_ms), 2)
    out["significant_terms_p50_ms"] = round(statistics.median(sig_ms), 2)
    # impact-pruned serving tier: derivation wall, kept fraction, and
    # the cold-query latency it buys (fresh Searcher, no memo)
    from myaku_ray.pipelines.prune import prune_index

    pruned_dir = index_dir.rstrip("/") + "_pruned"
    shutil.rmtree(pruned_dir, ignore_errors=True)
    t0 = time.time()
    info = prune_index(index_dir, pruned_dir)
    out["prune_wall_s"] = round(time.time() - t0, 3)
    out["pruned_kept_frac"] = round(
        info["postings_kept"] / max(info["postings_in"], 1), 4
    )
    sp = Searcher(pruned_dir)
    pcold = []
    for q in qs:
        t0 = time.time()
        sp.topk(q, 10)
        pcold.append((time.time() - t0) * 1000)
    pcold.sort()
    out["pruned_cold_p50_ms"] = round(statistics.median(pcold), 2)
    out["pruned_cold_p95_ms"] = round(pcold[int(len(pcold) * 0.95)], 2)
    return out


def bench_search_qps(index_dir: str, num_cpus: int, n_q: int = 3000) -> dict:
    """Distributed serving throughput: a fixed stream of DISTINCT queries
    (so per-actor memo caches cannot answer them) through an actor pool
    of Searchers — each actor loads the term dictionaries / first-page
    cache once in __init__, the serving-tier scale-out path.  2/3
    single-term (first-page/table served), 1/3 two-term WAND."""
    import random

    import ray.data as _rd

    from myaku_ray.lexicon import build_lexicon

    lex = [e.base_form for e in build_lexicon()]
    rng = random.Random(7)
    qs = []
    for i in range(n_q):
        if i % 3 == 2:
            qs.append(rng.choice(lex) + "の" + rng.choice(lex))
        else:
            qs.append(rng.choice(lex))
    pool = max(num_cpus - 2, 1)
    ds = _rd.from_items(
        [{"q": q} for q in qs], override_num_blocks=pool * 4
    )
    idx = index_dir

    class SearchStage:
        def __init__(self):
            from myaku_ray.index.searcher import Searcher

            self.s = Searcher(idx)

        def __call__(self, batch):
            import pyarrow as _pa

            t0 = time.time()
            n_hits = sum(
                len(self.s.topk(q, 10)) for q in batch["q"].to_pylist()
            )
            return _pa.table(
                {
                    "n_hits": _pa.array([n_hits], _pa.int64()),
                    "n_q": _pa.array([len(batch)], _pa.int64()),
                    "t0": _pa.array([t0], _pa.float64()),
                    "t1": _pa.array([time.time()], _pa.float64()),
                }
            )

    t0 = time.time()
    per_batch = (
        ds.map_batches(
            SearchStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=pool,
            num_cpus=1,
        )
        .to_pandas()
    )
    wall = time.time() - t0
    # Steady-state QPS: batches whose start falls in the LAST HALF of the
    # batch timeline — excludes actor-pool ramp (Searcher init + first
    # faults), which a long-lived serving tier pays once, not per window.
    mid = per_batch["t0"].min() + (per_batch["t0"].max() - per_batch["t0"].min()) / 2
    tail = per_batch[per_batch["t0"] >= mid]
    tail_wall = max(tail["t1"].max() - tail["t0"].min(), 1e-9)
    return {
        "search_qps": round(n_q / wall, 1),
        "search_qps_steady": round(float(tail["n_q"].sum()) / tail_wall, 1),
        "search_qps_wall_s": round(wall, 3),
        "search_qps_n": n_q,
        "search_qps_hits": int(per_batch["n_hits"].sum()),
    }


def _title_sidecar_info(index_dir: str) -> dict | None:
    """Build-time title-sidecar provenance for the bench record: row
    count, build wall, and which scale path wrote it."""
    from myaku_ray.index.title_sidecar import load_title_meta

    m = load_title_meta(index_dir)
    if m is None:
        return None
    return {
        "rows": m.get("n_rows"),
        "build_wall_s": m.get("wall_s"),
        "distributed": m.get("distributed"),
    }


def bench_phrase_serving(
    corpus_dir: str, pos_index: str, num_cpus: int, n_q: int = 1500,
    plain_index: str | None = None,
) -> dict:
    """Phrase/proximity serving numbers over an existing positional
    index: distributed phrase QPS (distinct corpus-derived phrases — no
    memo hits — through a Searcher actor pool) plus in-process cold/warm
    latency on the oracle query sets.  Shared by the standard bench
    (run_once) and the positional A/B mode (run_positions).  With
    plain_index, also A/Bs the hydrate (doc read + preview) stage:
    the positional path point-reads matched offsets from pos_blob while
    the plain path re-tokenizes every result doc (byte-identical output,
    pytest-asserted) — the ratio is the preview-stage speedup."""
    import statistics as _st

    import ray.data as _rd

    pqs = _gen_phrase_stream(corpus_dir, n_q)
    pool = max(num_cpus - 2, 1)
    ds = _rd.from_items([{"q": q} for q in pqs], override_num_blocks=pool * 4)

    class PhraseStage:
        def __init__(self):
            from myaku_ray.index.searcher import Searcher

            self.s = Searcher(pos_index)

        def __call__(self, batch):
            import pyarrow as _pa

            t0 = time.time()
            n_hits = sum(
                len(self.s.phrase_topk(q, 10))
                for q in batch["q"].to_pylist()
            )
            return _pa.table(
                {
                    "n_hits": _pa.array([n_hits], _pa.int64()),
                    "n_q": _pa.array([len(batch)], _pa.int64()),
                    "t0": _pa.array([t0], _pa.float64()),
                    "t1": _pa.array([time.time()], _pa.float64()),
                }
            )

    t0 = time.time()
    per_batch = ds.map_batches(
        PhraseStage, batch_format="pyarrow", batch_size=64,
        concurrency=pool, num_cpus=1,
    ).to_pandas()
    phrase_qps_wall = time.time() - t0
    hits = per_batch["n_hits"].sum()
    # capacity = pool / mean in-actor service time per query: independent
    # of ramp and end-of-stream stragglers (few batches per actor make a
    # timeline-tail estimate unstable here)
    busy = float((per_batch["t1"] - per_batch["t0"]).sum())
    phrase_qps_capacity = pool * float(per_batch["n_q"].sum()) / max(busy, 1e-9)

    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import near_query_set, phrase_query_set

    s = Searcher(pos_index)
    phrases = phrase_query_set(corpus_dir)
    nears = near_query_set(corpus_dir)
    cold_ph, cold_nr = [], []
    for q in phrases:
        t0 = time.time()
        s.phrase_topk(q, 10)
        cold_ph.append((time.time() - t0) * 1000)
    for q, w in nears:
        t0 = time.time()
        s.near_topk(q, w, 10)
        cold_nr.append((time.time() - t0) * 1000)
    warm_ph = []
    for _ in range(QUERY_REPEATS):
        for q in phrases:
            t0 = time.time()
            s.phrase_topk(q, 10)
            warm_ph.append((time.time() - t0) * 1000)
    # boolean AND/NOT serving latency (query-memoized, so warm = memo)
    from myaku_ray.oracle import boolean_query_set

    bools = boolean_query_set(corpus_dir)
    cold_bl, warm_bl = [], []
    for q in bools:
        t0 = time.time()
        s.boolean_topk(q, 10)
        cold_bl.append((time.time() - t0) * 1000)
    for _ in range(QUERY_REPEATS):
        for q in bools:
            t0 = time.time()
            s.boolean_topk(q, 10)
            warm_bl.append((time.time() - t0) * 1000)
    # date-filtered serving latency (filter inside the ranked scan; warm
    # = the range-keyed query memo)
    from myaku_ray.oracle import date_range_query_set

    dated = date_range_query_set(corpus_dir)
    cold_dt, warm_dt = [], []
    for q, lo, hi in dated:
        t0 = time.time()
        s.topk_in_range(q, lo, hi, 10)
        cold_dt.append((time.time() - t0) * 1000)
    for _ in range(QUERY_REPEATS):
        for q, lo, hi in dated:
            t0 = time.time()
            s.topk_in_range(q, lo, hi, 10)
            warm_dt.append((time.time() - t0) * 1000)
    # facet latency: first call pays the doc_id->source sidecar build
    from myaku_ray.oracle import reference_query_set as _rqs

    fqs = _rqs()
    t0 = time.time()
    s.facets(fqs[0])
    facet_build_ms = (time.time() - t0) * 1000
    warm_fc = []
    for _ in range(QUERY_REPEATS):
        for q in fqs:
            t0 = time.time()
            s.facets(q)
            warm_fc.append((time.time() - t0) * 1000)
    # wildcard / prefix expansion latency: the first wildcard pays the
    # df-vocabulary load; neither path is query-memoized, so warm still
    # measures the per-query vocabulary scan + group ranking
    from myaku_ray.oracle import prefix_query_set, wildcard_query_set

    wqs = [p for p in wildcard_query_set(corpus_dir) if "*" in p]
    pfx = prefix_query_set(corpus_dir)
    t0 = time.time()
    s.wildcard_topk(wqs[0], 10)
    wc_vocab_build_ms = (time.time() - t0) * 1000
    cold_wc = []
    for p in wqs[1:]:
        t0 = time.time()
        s.wildcard_topk(p, 10)
        cold_wc.append((time.time() - t0) * 1000)
    warm_wc, warm_px = [], []
    for _ in range(QUERY_REPEATS):
        for p in wqs:
            t0 = time.time()
            s.wildcard_topk(p, 10)
            warm_wc.append((time.time() - t0) * 1000)
        for p in pfx:
            t0 = time.time()
            s.prefix_topk(p, 10)
            warm_px.append((time.time() - t0) * 1000)
    # fielded title-boost latency: the title-term map is a BUILD-time
    # hive sidecar since round 5 (index/title_sidecar.py), so the first
    # query pays one per-term bucket point read, not an O(docs) scan;
    # warm = query memo
    t0 = time.time()
    s.topk_title_boost(fqs[0], 10)
    tb_first_query_ms = (time.time() - t0) * 1000
    cold_tb = []
    for q in fqs[1:]:
        t0 = time.time()
        s.topk_title_boost(q, 10)
        cold_tb.append((time.time() - t0) * 1000)
    warm_tb = []
    for _ in range(QUERY_REPEATS):
        for q in fqs:
            t0 = time.time()
            s.topk_title_boost(q, 10)
            warm_tb.append((time.time() - t0) * 1000)
    preview = {}
    if plain_index is not None:
        from myaku_ray.oracle import reference_query_set

        s_pl = Searcher(plain_index)
        reps = max(QUERY_REPEATS, 5)
        med_pl, med_po = [], []
        for q in reference_query_set():
            hits_pl = s_pl.topk(q, 10)
            hits_po = s.topk(q, 10)
            if not hits_pl:
                continue
            s_pl.hydrate(list(hits_pl), q)  # warm doc/file caches
            s.hydrate(list(hits_po), q)
            t_pl, t_po = [], []
            for _ in range(reps):
                t0 = time.time()
                s_pl.hydrate(list(hits_pl), q)
                t_pl.append((time.time() - t0) * 1000)
                t0 = time.time()
                s.hydrate(list(hits_po), q)
                t_po.append((time.time() - t0) * 1000)
            med_pl.append(_st.median(t_pl))
            med_po.append(_st.median(t_po))
        if med_pl:
            preview = {
                "preview_n_queries": len(med_pl),
                "preview_hydrate_plain_ms_p50": round(_st.median(med_pl), 2),
                "preview_hydrate_pos_ms_p50": round(_st.median(med_po), 2),
                # total-work ratio across the query set (hydrate = doc
                # read + preview; the doc read is identical both ways, so
                # this UNDERSTATES the preview-stage-only speedup)
                "preview_speedup_x": round(sum(med_pl) / sum(med_po), 2),
                "preview_speedup_max_x": round(
                    max(a / b for a, b in zip(med_pl, med_po)), 2
                ),
            }
    return {
        "n_phrases": len(phrases),
        "phrase_cold_p50_ms": round(_st.median(cold_ph), 2),
        "phrase_cold_max_ms": round(max(cold_ph), 2),
        "phrase_warm_p50_ms": round(_st.median(warm_ph), 2),
        "near_cold_p50_ms": round(_st.median(cold_nr), 2) if cold_nr else None,
        "near_cold_max_ms": round(max(cold_nr), 2) if cold_nr else None,
        "n_bools": len(bools),
        "bool_cold_p50_ms": round(_st.median(cold_bl), 2) if cold_bl else None,
        "bool_cold_max_ms": round(max(cold_bl), 2) if cold_bl else None,
        "bool_warm_p50_ms": round(_st.median(warm_bl), 2) if warm_bl else None,
        "n_dated": len(dated),
        "dated_cold_p50_ms": round(_st.median(cold_dt), 2) if cold_dt else None,
        "dated_cold_max_ms": round(max(cold_dt), 2) if cold_dt else None,
        "dated_warm_p50_ms": round(_st.median(warm_dt), 3) if warm_dt else None,
        "facet_sidecar_build_ms": round(facet_build_ms, 1),
        "facet_p50_ms": round(_st.median(warm_fc), 3) if warm_fc else None,
        "wildcard_vocab_build_ms": round(wc_vocab_build_ms, 1),
        "wildcard_cold_p50_ms": (
            round(_st.median(cold_wc), 2) if cold_wc else None
        ),
        "wildcard_warm_p50_ms": (
            round(_st.median(warm_wc), 2) if warm_wc else None
        ),
        "prefix_warm_p50_ms": (
            round(_st.median(warm_px), 2) if warm_px else None
        ),
        "titleboost_first_query_ms": round(tb_first_query_ms, 1),
        "titleboost_sidecar": _title_sidecar_info(pos_index),
        "titleboost_cold_p50_ms": (
            round(_st.median(cold_tb), 2) if cold_tb else None
        ),
        "titleboost_warm_p50_ms": (
            round(_st.median(warm_tb), 3) if warm_tb else None
        ),
        "phrase_qps": round(len(pqs) / phrase_qps_wall, 1),
        "phrase_qps_capacity": round(phrase_qps_capacity, 1),
        "phrase_qps_n": len(pqs),
        "phrase_qps_pool": pool,
        "phrase_qps_hits": int(hits),
        **preview,
    }


def bench_sharded(
    pages: str, num_cpus: int, n_shards: int = 4, n_q: int = 2000
) -> dict:
    """Document-sharded tier over the SAME bench corpus: global-stats
    sharded build (pipelines/shard.py) + federated serving latency
    (in-process thread fan-out AND the Ray-actor query-node tier), plus
    pipelined throughput through the actor federation — each query is
    n_shards remote top-k calls merged on the coordinator, with a
    window of queries in flight so query nodes never idle."""
    import collections
    import random

    import ray as _ray

    from myaku_ray.corpus import gen_blogs_table
    from myaku_ray.index.sharded import RayShardedSearcher, ShardedSearcher
    from myaku_ray.lexicon import build_lexicon
    from myaku_ray.oracle import reference_query_set
    from myaku_ray.pipelines.shard import build_sharded_index

    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    root = f"{BENCH_BASE}/bench_sharded_{n_shards}"
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.time()
    m = build_sharded_index(pages, root, n_shards, blog_ratings=ratings)
    out = {
        "sharded_n_shards": n_shards,
        "sharded_build_s": round(time.time() - t0, 3),
    }

    def lat(searcher) -> tuple[float, float]:
        qs = reference_query_set()
        cold, warm = [], []
        for q in qs:
            t0 = time.time()
            searcher.topk(q, 10)
            cold.append((time.time() - t0) * 1000)
        for _ in range(QUERY_REPEATS):
            for q in qs:
                t0 = time.time()
                searcher.topk(q, 10)
                warm.append((time.time() - t0) * 1000)
        return statistics.median(cold), statistics.median(warm)

    c, w = lat(ShardedSearcher(m["shard_dirs"]))
    out["sharded_thread_cold_p50_ms"] = round(c, 2)
    out["sharded_thread_warm_p50_ms"] = round(w, 3)

    act = RayShardedSearcher(m["shard_dirs"])
    try:
        c, w = lat(act)
        out["sharded_actor_cold_p50_ms"] = round(c, 2)
        out["sharded_actor_warm_p50_ms"] = round(w, 3)

        # pipelined federation throughput: same query mix as
        # bench_search_qps (2/3 single-term, 1/3 two-term WAND), a
        # bounded window of fan-outs in flight
        lex = [e.base_form for e in build_lexicon()]
        rng = random.Random(11)
        stream = [
            rng.choice(lex) + "の" + rng.choice(lex)
            if i % 3 == 2
            else rng.choice(lex)
            for i in range(n_q)
        ]
        window = max(4 * num_cpus // max(n_shards, 1), 8)
        pending: collections.deque = collections.deque()
        hits = 0
        t0 = time.time()
        for q in stream:
            pending.append(act.topk_async(q, 10))
            if len(pending) >= window:
                hits += len(act.merge(_ray.get(pending.popleft()), 10))
        while pending:
            hits += len(act.merge(_ray.get(pending.popleft()), 10))
        wall = time.time() - t0
        out.update(
            {
                "sharded_actor_qps": round(n_q / wall, 1),
                "sharded_actor_qps_n": n_q,
                "sharded_actor_qps_hits": int(hits),
                "sharded_actor_qps_window": window,
            }
        )
    finally:
        act.shutdown()

    # replica groups: same shards, 2 query nodes each — the query-
    # throughput axis on top of the corpus axis (N shards x R replicas).
    # Replicas only pay off when per-shard query COST dominates the
    # coordinator RPC, so the comparison runs a heavy mix (distinct
    # 3-term WAND conjunctions, k=50, memo-proof) at r=1 and r=2.
    heavy = [
        f"{rng.choice(lex)}の{rng.choice(lex)}の{rng.choice(lex)}"
        for _ in range(n_q)
    ]

    def pipelined_qps(searcher, qs: list) -> float:
        pending: collections.deque = collections.deque()
        t0 = time.time()
        for q in qs:
            pending.append(searcher.topk_async(q, 50))
            if len(pending) >= window:
                searcher.merge(_ray.get(pending.popleft()), 50)
        while pending:
            searcher.merge(_ray.get(pending.popleft()), 50)
        return round(len(qs) / (time.time() - t0), 1)

    act1 = RayShardedSearcher(m["shard_dirs"])
    try:
        out["sharded_actor_heavy_qps"] = pipelined_qps(act1, heavy)
    finally:
        act1.shutdown()
    act2 = RayShardedSearcher(m["shard_dirs"], replicas=2)
    try:
        out["sharded_actor_heavy_qps_r2"] = pipelined_qps(act2, heavy)
        out["sharded_replica_speedup"] = round(
            out["sharded_actor_heavy_qps_r2"]
            / max(out["sharded_actor_heavy_qps"], 1e-9),
            3,
        )
    finally:
        act2.shutdown()

    # reshard (n -> n-1) WITHOUT re-tokenizing, vs the full sharded
    # build: quantifies the fold+re-route+re-encode-only path
    from myaku_ray.pipelines.shard import reshard_index

    shutil.rmtree(root + "_re", ignore_errors=True)
    t0 = time.time()
    reshard_index(root, root + "_re", max(n_shards - 1, 1))
    out["sharded_reshard_s"] = round(time.time() - t0, 3)
    out["sharded_reshard_vs_build"] = round(
        out["sharded_reshard_s"] / max(out["sharded_build_s"], 1e-9), 3
    )
    return out


def bench_term_sharded(index_dir: str, n_shards: int = 4) -> dict:
    """Term-routed tier over the full bench index AND over its pruned
    derivation: cold/warm latency plus the per-query posting transfer
    both ways — the doc-vs-term routing trade, measured (full-index
    term routing moves df-sized arrays; pruned term routing is bounded
    by P postings/term)."""
    from myaku_ray.index.term_sharded import TermShardedSearcher
    from myaku_ray.oracle import reference_query_set
    from myaku_ray.pipelines.prune import prune_index

    out: dict = {}
    qs = reference_query_set()
    for tag, idx in (
        ("full", index_dir),
        ("pruned", index_dir.rstrip("/") + "_pruned"),
    ):
        if tag == "pruned":
            prune_index(index_dir, idx)  # idempotent (bench_queries made it)
        ts = TermShardedSearcher(idx, n_shards=n_shards)
        try:
            cold, moved = [], []
            for q in qs:
                t0 = time.time()
                ts.topk(q, 10)
                cold.append((time.time() - t0) * 1000)
                moved.append(ts.transfer_bytes)
            warm = []
            for q in qs:
                t0 = time.time()
                ts.topk(q, 10)
                warm.append((time.time() - t0) * 1000)
            out[f"term_sharded_{tag}_cold_p50_ms"] = round(
                statistics.median(cold), 2
            )
            out[f"term_sharded_{tag}_warm_p50_ms"] = round(
                statistics.median(warm), 2
            )
            out[f"term_sharded_{tag}_xfer_p50_kb"] = round(
                statistics.median(moved) / 1e3, 1
            )
            out[f"term_sharded_{tag}_xfer_max_kb"] = round(
                max(moved) / 1e3, 1
            )
        finally:
            ts.shutdown()
    return out


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
        "ivf_add_delta": ann.ivf_add_delta,
        "pq_recall_eval": ann.pq_recall_eval,
        "doc_ppl_buckets": textops.doc_ppl_buckets,
        "pq_cosine_topk": ann.pq_cosine_topk,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash_docs": dedup.simhash_docs,
        "simhash_pairs": dedup.simhash_pairs,
        "lang_id_ngram": textops.lang_id_ngram,
        "media_meta_stats": media.media_meta_stats,
        "media_features": media.media_features,
        "events_asof_join": events.events_asof_join,
        "tfidf_top_terms": textops.tfidf_top_terms,
        "kmeans_embeddings": ann.kmeans_embeddings,
        "semdedup_prune": ann.semdedup_prune,
        "top_terms_heavy_hitters": textops.top_terms_heavy_hitters,
        "pack_training_chunks": textops.pack_training_chunks,
        "hll_event_registers": events.hll_event_registers,
        "cms_term_counts": textops.cms_term_counts,
        "duplicate_spans": dedup.duplicate_spans,
        "dup_clusters": dedup.dup_clusters,
        "doc_repetition_stats": textops.doc_repetition_stats,
        "stratified_sample_by_source": textops.stratified_sample_by_source,
        "term_cooccurrence_pmi": textops.term_cooccurrence_pmi,
        "term_suggestions": textops.term_suggestions,
        "bigram_counts": textops.bigram_counts,
        "doc_length_band": textops.doc_length_band,
        "user_retention_cohorts": events.user_retention_cohorts,
        "event_funnel": events.event_funnel,
        "events_props_stats": events.events_props_stats,
        "ann_cosine_topk_filtered": ann.ann_cosine_topk_filtered,
        "hybrid_search_rrf": fulltext.hybrid_search_rrf,
        "shipping_priority_q3": relational.shipping_priority_q3,
        "local_supplier_revenue_q5": relational.local_supplier_revenue_q5,
        "part_type_profit_q9": relational.part_type_profit_q9,
        "events_running_value": events.events_running_value,
        "events_value_percentiles": events.events_value_percentiles,
        "dsir_importance_weights": textops.dsir_importance_weights,
        "large_volume_customers_q18": relational.large_volume_customers_q18,
        "returned_item_revenue_q10": relational.returned_item_revenue_q10,
        "customer_order_distribution_q13":
            relational.customer_order_distribution_q13,
        "doc_chunk_overlap": textops.doc_chunk_overlap,
        "mmr_diverse_rerank": ann.mmr_diverse_rerank,
        "hard_negative_mining": ann.hard_negative_mining,
        "weighted_sample_docs": textops.weighted_sample_docs,
        "events_hourly_anomalies": events.events_hourly_anomalies,
        "late_shipment_orders_q4": relational.late_shipment_orders_q4,
        "embedding_outliers": ann.embedding_outliers,
        "distinctive_terms_per_source": textops.distinctive_terms_per_source,
        "promo_revenue_q14": relational.promo_revenue_q14,
        "small_quantity_revenue_q17": relational.small_quantity_revenue_q17,
        "idle_customer_balance_q22": relational.idle_customer_balance_q22,
        "shingle_novelty": dedup.shingle_novelty,
        "vocab_coverage": textops.vocab_coverage,
        "nation_trade_volume_q7": relational.nation_trade_volume_q7,
        "events_value_percentiles_by_type":
            events.events_value_percentiles_by_type,
        "top_supplier_revenue_q15": relational.top_supplier_revenue_q15,
        "user_value_deciles": events.user_value_deciles,
        "event_type_affinity": events.event_type_affinity,
        "ivf_recall_eval": ann.ivf_recall_eval,
        "curation_funnel": textops.curation_funnel,
        "token_mass_gini": textops.token_mass_gini,
        "user_interarrival_stats": events.user_interarrival_stats,
        "user_value_week_delta": events.user_value_week_delta,
        "interleave_by_source": textops.interleave_by_source,
        "event_transition_counts": events.event_transition_counts,
        "weekly_active_breakdown": events.weekly_active_breakdown,
        "rolling_7d_active_users": events.rolling_7d_active_users,
        "forecast_revenue_q6": relational.forecast_revenue_q6,
        "nation_market_share_q8": relational.nation_market_share_q8,
        "knn_graph": ann.knn_graph,
        "near_dedup_survivors": dedup.near_dedup_survivors,
        "brand_band_revenue_q19": relational.brand_band_revenue_q19,
        "waiting_suppliers_q21": relational.waiting_suppliers_q21,
        "ship_delay_priority_q12": relational.ship_delay_priority_q12,
        "event_funnel_windowed": events.event_funnel_windowed,
        "doc_bigram_logppl": textops.doc_bigram_logppl,
        "cohort_ltv": events.cohort_ltv,
        "important_parts_q11": relational.important_parts_q11,
        "supplier_count_by_part_q16":
            relational.supplier_count_by_part_q16,
        "dedup_incremental": textops.dedup_incremental,
        "doc_compression_ratio": textops.doc_compression_ratio,
        "pages_search_prf": fulltext.pages_search_prf,
        "pages_significant_terms": fulltext.pages_significant_terms,
    }
    # cold-time the Q5/Q9 bucketed layout writes too (same convention as
    # the cache rmtree above)
    shutil.rmtree("/tmp/myaku_ray_join_q5", ignore_errors=True)
    shutil.rmtree("/tmp/myaku_ray_join_q8", ignore_errors=True)
    shutil.rmtree("/tmp/myaku_ray_join_q9", ignore_errors=True)
    shutil.rmtree("/tmp/myaku_ray_join_q21", ignore_errors=True)
    shutil.rmtree("/tmp/myaku_ray_join_q12", ignore_errors=True)
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
    queries = (
        bench_queries(build["index_dir"], pages) if not build_only else {}
    )
    if not build_only:
        queries.update(bench_search_qps(build["index_dir"], NUM_CPUS))
    # phrase/proximity serving over a positional sidecar of the SAME
    # bench corpus — recorded in the standard bench so every round logs
    # phrase QPS + cold/warm latency in whatever window the driver draws
    if not build_only and os.environ.get("MYAKU_BENCH_PHRASE", "1") != "0":
        from myaku_ray.corpus import gen_blogs_table as _gen_blogs
        from myaku_ray.pipelines.build import build_index as _build_index

        _blogs = _gen_blogs()
        pos_idx = f"{BENCH_BASE}/bench_pos_index"
        shutil.rmtree(pos_idx, ignore_errors=True)
        t0 = time.time()
        _build_index(
            pages, pos_idx,
            blog_ratings=dict(zip(_blogs["blog_url"], _blogs["rating"])),
            tokenize_concurrency=max(3 * NUM_CPUS // 4, 1),
            with_positions=True,
        )
        queries["index_build_pos_s"] = round(time.time() - t0, 3)
        queries.update(
            bench_phrase_serving(
                pages, pos_idx, NUM_CPUS, plain_index=build["index_dir"]
            )
        )
    # document-sharded build + federated serving (thread and Ray-actor
    # tiers) over the same corpus; skip via MYAKU_BENCH_SHARDED=0
    if not build_only and os.environ.get("MYAKU_BENCH_SHARDED", "1") != "0":
        queries.update(bench_sharded(pages, NUM_CPUS))
        queries.update(bench_term_sharded(build["index_dir"]))
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
        BENCH_PAGES, CORPUS_DIR = xl_pages, f"{BENCH_BASE}/pages_{xl_pages}"
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


_MEMBW_ARR = None


def _membw_init() -> None:
    """Allocate + fault the working set ONCE per worker, OUTSIDE any
    timed region — the probe must measure steady-state streaming
    bandwidth, not page-supply (see _hw_coldpage_probe for that)."""
    global _MEMBW_ARR
    import numpy as np

    _MEMBW_ARR = np.ones(8_000_000, dtype=np.float64)  # 64 MB, faulted


def _membw_task(_arg) -> float:
    a = _MEMBW_ARR
    t0 = time.time()
    passes = 24
    for _ in range(passes):
        a *= 1.000001  # read + write every byte in place
    return passes * 2 * a.nbytes / (time.time() - t0) / 1e9


def _hw_membw_scaling(n_lo: int, n_hi: int) -> dict:
    """Memory-BANDWIDTH probe: aggregate GB/s with N vs 4N workers over
    PRE-FAULTED per-worker arrays (a warmup map barriers all workers'
    init before the timed map).

    The pure-CPU spin probe scales ~linearly on this host while streaming
    memory saturates (~19 GB/s shared): Arrow/parquet pipelines are
    bandwidth-heavy, so THIS ceiling — not CPU — bounds their measured
    scaling.  Published so pipeline efficiency can be read against it."""
    import multiprocessing as mp

    def measure(nproc: int) -> float:
        with mp.Pool(nproc, initializer=_membw_init) as p:
            p.map(_membw_task, range(nproc))  # warmup + init barrier
            t0 = time.time()
            r = p.map(_membw_task, range(nproc * 2))
            wall = time.time() - t0
        total_bytes = len(r) * 24 * 2 * 8_000_000 * 8
        return total_bytes / wall / 1e9

    lo, hi = measure(n_lo), measure(n_hi)
    return {
        "hw_membw_gbps_lo": round(lo, 1),
        "hw_membw_gbps_hi": round(hi, 1),
        "hw_membw_efficiency": round((hi / lo) / (n_hi / n_lo), 3),
    }


def _coldpage_child() -> None:
    import numpy as np

    np.ones(32_000_000, dtype=np.float64)


def _hw_coldpage_probe(timeout_s: float = 60.0) -> dict:
    """Cold-PAGE-SUPPLY probe: MB/s at which a fresh process can fault in
    256 MB of never-touched anonymous memory.  On a healthy host this is
    GB/s; this sandbox VM has windows where the hypervisor supplies fresh
    pages at ~5 MB/s (measured 2026-08-17: np.ones(256 MB) = 40-75 s in a
    new process while re-touch of the same pages runs at 18 GB/s) — in
    such windows EVERY process start, Arrow buffer, and object-store
    mapping stalls, depressing absolute walls and compressing measured
    scaling ratios through no fault of the pipeline.  Subprocess-based so
    the probe itself always faults genuinely fresh memory; timeout-capped
    so a pathological window costs at most ``timeout_s``."""
    code = (
        "import numpy as np, time; t0=time.time();"
        "a=np.ones(32_000_000, dtype=np.float64);"
        "print((time.time()-t0))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
        dt = float(proc.stdout.strip())
    except (subprocess.TimeoutExpired, ValueError):
        # timed out, OOM-killed, or no parseable output — record the
        # floor (rate is AT MOST 256/timeout) instead of aborting a
        # 20-minute protocol run on its own diagnostic
        dt = timeout_s
    return {"hw_coldpage_mbps": round(256.0 / max(dt, 1e-9), 1)}


def _quiesce() -> None:
    """Flush dirty page cache and let the disk settle.  Each 400k build
    leaves ~2 GB of buffered index writes; without this, the NEXT leg
    (and the probes) run against the previous leg's writeback — measured
    as 10x-degraded 'host windows' that are actually self-inflicted IO
    shadows.  The sync wall is deliberately OUTSIDE every timed region."""
    os.sync()
    time.sleep(2)


def _prewarm_pages(max_bytes: int = 2 << 30, timeout_s: float = 30.0) -> dict:
    """Touch-and-free up to ``max_bytes`` of anonymous memory so the NEXT
    process starts against host-backed pages (measured on this VM:
    freed-but-recently-touched pages refault at GB/s while never-touched
    pages arrive at 5-100 MB/s in pathological windows).  Both scaling
    legs get the same warm treatment and the warm wall stays OUTSIDE
    every timed region, so this removes a host artifact without touching
    the measurement.  Bounded by ``timeout_s`` so a fully cold window
    costs at most that.  Measured caveat: the host reclaims the freed
    pool within ~10 s, so this mainly covers the next process's startup
    allocations (Ray session + object-store mapping), not a whole build
    leg — the window qualifier remains the real guard."""
    import numpy as np

    t0 = time.time()
    chunk = 256 << 20
    held = []  # HOLD until the end: pages freed mid-loop are reclaimed
    # by the host within seconds; a bulk release immediately before the
    # measured process starts leaves the whole pool host-backed for it
    while sum(a.nbytes for a in held) < max_bytes and (
        time.time() - t0 < timeout_s
    ):
        held.append(np.ones(chunk // 8, dtype=np.float64))
    warmed = sum(a.nbytes for a in held)
    held.clear()
    return {"prewarmed_gb": round(warmed / (1 << 30), 2)}


def _settled_coldpage_probe(
    attempts: int = 4, healthy_mbps: float = 1000.0
) -> dict:
    """Pre-leg cold-page probe with a bounded ACTIVE settle loop.

    A probe taken right after a leg's teardown reads 80-200 MB/s even in
    windows where the same probe reads 3-4.6 GB/s two minutes later
    (measured r04, every second leg of SCALING_r04.json) — that
    self-shadow kept every r03/r04 repeat below the window_ok gate.  A
    PASSIVE settle (4x12 s sleeps) does not clear it; what restores
    supply is TOUCHING memory — the end-of-repeat probes read GB/s
    precisely because the compute+membw probes touch GBs first.  Since
    the protocol already prewarms 2 GB before each timed leg (the leg
    never enters the passive post-teardown state), the honest leg-entry
    measurement is: alternate touch-and-free warming with fresh-process
    256 MB probes, and gate on the final reading.  Both the first
    (raw post-teardown) and final (leg-entry) readings are published.
    The settle wall stays OUTSIDE every timed region and is identical
    for both legs, so it cannot bias the ratio; a genuinely starved
    window stays under the gate no matter how much is touched
    (HOST_PATHOLOGY_r03: warming itself crawls at single-digit MB/s
    there)."""
    first = _hw_coldpage_probe(timeout_s=30.0)
    last = dict(first)
    for _ in range(attempts - 1):
        if last["hw_coldpage_mbps"] >= healthy_mbps:
            break
        _prewarm_pages(timeout_s=20.0)
        last = _hw_coldpage_probe(timeout_s=30.0)
    last["hw_coldpage_mbps_raw_first"] = first["hw_coldpage_mbps"]
    return last


def _single_build_run(ncpu: int, scaling_pages: str) -> dict:
    """One fresh-process build at the given parallelism (no best-of).
    A cold-page probe runs BEFORE the leg (the end-of-repeat probes
    sample the window's end — a window that dies mid-repeat and recovers
    by probe time would otherwise qualify falsely), with a bounded settle
    loop so the previous leg's teardown reclaim doesn't masquerade as a
    bad window (see _settled_coldpage_probe)."""
    _quiesce()
    pre = _settled_coldpage_probe()
    _prewarm_pages()
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        MYAKU_BENCH_BUILD_ONLY="1",
        MYAKU_BENCH_PAGES=scaling_pages,
    )
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    out["coldpage_mbps_pre"] = pre["hw_coldpage_mbps"]
    out["coldpage_mbps_pre_raw"] = pre.get("hw_coldpage_mbps_raw_first")
    # Per-task encode skew profile (max/median bucket-task wall): the
    # segments stage wall at high parallelism is max(task walls), so
    # this separates straggler skew from host windows in the ratio.
    enc = f"{BENCH_BASE}/index_{ncpu}/segments/_encode_tasks.json"
    try:
        with open(enc) as f:
            out["encode_tasks"] = json.load(f)
    except OSError:
        pass
    return out


def run_scaling() -> dict:
    """Same job at two parallelism levels (N and 4N CPUs) in fresh
    processes — the sandbox substitute for N- vs 4N-node clusters.

    Protocol (self-contained, no curation): K repeats (default 5), each
    repeat = one single-shot build at N and one at 4N with ALTERNATING
    order across repeats (host drift then biases both directions
    equally), followed by same-window CPU and memory-bandwidth probes.
    The artifact carries EVERY run plus the medians; the official number
    is the median, never a selected sample.

    Default N=4 (override with MYAKU_SCALING_N): the host gives ~linear
    compute scaling up to ~16 workers and degrades beyond (see the
    per-repeat hw_compute_efficiency), so 4 vs 16 isolates the PIPELINE's
    scaling from host oversubscription.  The membw probe matters because
    Arrow pipelines are bandwidth-heavy and this host's shared ~19 GB/s
    streaming ceiling — not CPU — is what stops them scaling."""
    n_lo = int(os.environ.get("MYAKU_SCALING_N", "4"))
    n_hi = 4 * n_lo
    repeats = int(os.environ.get("MYAKU_SCALING_REPEATS", "5"))
    # Larger corpus than the plain bench: parallel work must dominate the
    # fixed per-stage costs for the ratio to measure the pipeline.
    scaling_pages = os.environ.get(
        "MYAKU_BENCH_PAGES", os.environ.get("MYAKU_SCALING_PAGES", "400000")
    )
    runs = []
    for rep in range(repeats):
        order = (n_lo, n_hi) if rep % 2 == 0 else (n_hi, n_lo)
        res = {}
        for ncpu in order:
            res[ncpu] = _single_build_run(ncpu, scaling_pages)
        _quiesce()  # probes must not measure the last build's writeback
        hw = _hw_compute_scaling(n_lo, n_hi)
        membw = _hw_membw_scaling(n_lo, n_hi)
        cold = _hw_coldpage_probe()
        raw = (
            res[n_hi]["build_docs_per_s"] / res[n_lo]["build_docs_per_s"]
        ) / (n_hi / n_lo)
        # Pre-registered window qualifier — PIPELINE-INDEPENDENT, so it
        # cannot cherry-pick good pipeline results: a repeat's window is
        # clean iff the same-run HOST probes show (a) the shared host
        # itself scaling computationally (spin probe >= 0.85 of linear
        # 4x), (b) the steady-state bandwidth ceiling not collapsed by
        # external tenants (aggregate at the high level >= 8 GB/s; its
        # 4->16 RATIO is an inherent shared ceiling, deliberately not
        # gated), and (c) fresh-page supply above 1 GB/s (pathological
        # windows measured at 5-90 MB/s stall every allocation and
        # compress scaling ratios).
        # page-supply must be healthy ENTERING each leg (pre-probes) and
        # at repeat end — a window that collapses mid-repeat fails
        cold_legs = min(
            res[n_lo].get("coldpage_mbps_pre", 0.0),
            res[n_hi].get("coldpage_mbps_pre", 0.0),
        )
        window_ok = bool(
            hw["hw_compute_efficiency"] >= 0.85
            and membw["hw_membw_gbps_hi"] >= 8.0
            and cold["hw_coldpage_mbps"] >= 1000.0
            and cold_legs >= 1000.0
        )
        runs.append(
            {
                "repeat": rep,
                "order": list(order),
                f"docs_per_s_{n_lo}": res[n_lo]["build_docs_per_s"],
                f"docs_per_s_{n_hi}": res[n_hi]["build_docs_per_s"],
                f"build_s_{n_lo}": res[n_lo]["value"],
                f"build_s_{n_hi}": res[n_hi]["value"],
                f"coldpage_mbps_pre_{n_lo}": res[n_lo].get(
                    "coldpage_mbps_pre"
                ),
                f"coldpage_mbps_pre_{n_hi}": res[n_hi].get(
                    "coldpage_mbps_pre"
                ),
                f"coldpage_mbps_pre_raw_{n_lo}": res[n_lo].get(
                    "coldpage_mbps_pre_raw"
                ),
                f"coldpage_mbps_pre_raw_{n_hi}": res[n_hi].get(
                    "coldpage_mbps_pre_raw"
                ),
                "raw_efficiency": round(raw, 3),
                "efficiency_vs_host": round(
                    raw / hw["hw_compute_efficiency"], 3
                ),
                "efficiency_vs_membw": round(
                    raw / membw["hw_membw_efficiency"], 3
                ),
                "window_ok": window_ok,
                **hw,
                **membw,
                **cold,
            }
        )
        print(json.dumps({"progress": runs[-1]}), file=sys.stderr)

    def med(key: str) -> float:
        return round(statistics.median(r[key] for r in runs), 3)

    clean = [r for r in runs if r["window_ok"]]

    def med_clean(key: str) -> float | None:
        if not clean:
            return None
        return round(statistics.median(r[key] for r in clean), 3)

    first = runs[0]
    return {
        "metric": (
            f"scaling: index build docs/s at num_cpus={n_lo} vs {n_hi}, "
            f"{repeats} alternating-order repeats, medians"
        ),
        "n_lo": n_lo,
        "n_hi": n_hi,
        "repeats": repeats,
        "bench_pages": int(scaling_pages),
        "median_raw_efficiency": med("raw_efficiency"),
        "median_efficiency_vs_host": med("efficiency_vs_host"),
        "median_efficiency_vs_membw": med("efficiency_vs_membw"),
        # medians over clean-window repeats only (see window_ok above; the
        # qualifier reads ONLY host probes, never the pipeline result)
        "n_clean_windows": len(clean),
        "median_raw_efficiency_clean": med_clean("raw_efficiency"),
        "median_efficiency_vs_host_clean": med_clean("efficiency_vs_host"),
        f"median_docs_per_s_{n_lo}": med(f"docs_per_s_{n_lo}"),
        f"median_docs_per_s_{n_hi}": med(f"docs_per_s_{n_hi}"),
        "median_hw_compute_efficiency": med("hw_compute_efficiency"),
        "median_hw_membw_efficiency": med("hw_membw_efficiency"),
        # back-compat keys (first repeat's values; medians are official)
        "scaling_efficiency": med("raw_efficiency"),
        f"docs_per_s_{n_lo}": first[f"docs_per_s_{n_lo}"],
        f"docs_per_s_{n_hi}": first[f"docs_per_s_{n_hi}"],
        "runs": runs,
    }


def _serve_subprocess(ncpu: int, index_dir: str, n_q: int) -> dict:
    env = dict(
        os.environ,
        MYAKU_SERVE_INDEX=index_dir,
        MYAKU_SERVE_NCPU=str(ncpu),
        MYAKU_SERVE_NQ=str(n_q),
    )
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--serve-worker"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def run_serve_worker() -> dict:
    ncpu = int(os.environ["MYAKU_SERVE_NCPU"])
    _ray_init(ncpu)
    out = bench_search_qps(
        os.environ["MYAKU_SERVE_INDEX"],
        ncpu,
        n_q=int(os.environ.get("MYAKU_SERVE_NQ", "3000")),
    )
    import ray

    ray.shutdown()
    return out


def run_scaling_serve() -> dict:
    """Second scaling axis: QUERY-SERVING throughput at num_cpus=N vs 4N
    in fresh processes over the SAME prebuilt index — the serving-tier
    half of the north metric (BM25 top-k latency/throughput).  Unlike the
    build, serving works over warm, bounded per-actor state (term
    dictionaries + caches loaded once in __init__), so it is far less
    exposed to the host's page-supply pathology windows; it evidences
    that the QUERY path, not just the build, scales with workers."""
    n_lo = int(os.environ.get("MYAKU_SCALING_N", "4"))
    n_hi = 4 * n_lo
    repeats = int(os.environ.get("MYAKU_SCALING_REPEATS", "3"))
    n_q = int(os.environ.get("MYAKU_SERVE_NQ", "6000"))
    pages = os.environ.get("MYAKU_BENCH_PAGES", "100000")

    # one shared index build (not part of the measurement)
    global CORPUS_DIR, BENCH_PAGES
    BENCH_PAGES, CORPUS_DIR = int(pages), f"{BENCH_BASE}/pages_{pages}"
    _ray_init(NUM_CPUS)
    corpus = ensure_corpus()
    build = bench_build(corpus, NUM_CPUS)
    from myaku_ray.pipelines.first_page import build_first_page_cache

    build_first_page_cache(build["index_dir"])
    import ray

    ray.shutdown()

    runs = []
    for rep in range(repeats):
        order = (n_lo, n_hi) if rep % 2 == 0 else (n_hi, n_lo)
        res = {}
        for ncpu in order:
            _quiesce()
            res[ncpu] = _serve_subprocess(ncpu, build["index_dir"], n_q)
        hw = _hw_compute_scaling(n_lo, n_hi)
        cold = _hw_coldpage_probe()
        # steady-state ratio: a serving tier is long-lived, so pool ramp
        # (actor init + first faults) is excluded from the scaling number;
        # the ramp-inclusive ratio is kept alongside
        raw = (
            res[n_hi]["search_qps_steady"] / res[n_lo]["search_qps_steady"]
        ) / (n_hi / n_lo)
        raw_with_ramp = (
            res[n_hi]["search_qps"] / res[n_lo]["search_qps"]
        ) / (n_hi / n_lo)
        runs.append(
            {
                "repeat": rep,
                "order": list(order),
                f"qps_{n_lo}": res[n_lo]["search_qps"],
                f"qps_{n_hi}": res[n_hi]["search_qps"],
                f"qps_steady_{n_lo}": res[n_lo]["search_qps_steady"],
                f"qps_steady_{n_hi}": res[n_hi]["search_qps_steady"],
                "raw_efficiency": round(raw, 3),
                "raw_efficiency_with_ramp": round(raw_with_ramp, 3),
                "efficiency_vs_host": round(
                    raw / hw["hw_compute_efficiency"], 3
                ),
                **hw,
                **cold,
            }
        )
        print(json.dumps({"progress": runs[-1]}), file=sys.stderr)

    def med(key: str) -> float:
        return round(statistics.median(r[key] for r in runs), 3)

    return {
        "metric": (
            f"serving scaling: search QPS at num_cpus={n_lo} vs {n_hi}, "
            f"{repeats} alternating-order repeats, medians; index "
            f"{pages} pages prebuilt once"
        ),
        "n_lo": n_lo,
        "n_hi": n_hi,
        "repeats": repeats,
        "n_queries": n_q,
        "median_raw_efficiency": med("raw_efficiency"),
        "median_raw_efficiency_with_ramp": med("raw_efficiency_with_ramp"),
        "median_efficiency_vs_host": med("efficiency_vs_host"),
        f"median_qps_{n_lo}": med(f"qps_{n_lo}"),
        f"median_qps_{n_hi}": med(f"qps_{n_hi}"),
        f"median_qps_steady_{n_lo}": med(f"qps_steady_{n_lo}"),
        f"median_qps_steady_{n_hi}": med(f"qps_steady_{n_hi}"),
        "runs": runs,
    }


def run_kernel_ab() -> dict:
    """Same-window A/B of the tokenizer tf kernel: the all-consuming
    ``findall`` fast path vs the longest-match reference loop, measured
    back-to-back in ONE process over the SAME extracted texts
    (alternating passes, median per kernel) — so the kernel speedup
    claim lives in a JSON artifact, not prose."""
    import statistics as _st

    _ray_init(NUM_CPUS)
    n_pages = int(os.environ.get("MYAKU_AB_PAGES", "20000"))
    corpus_dir = f"{BENCH_BASE}/pages_{n_pages}"
    from myaku_ray.corpus import write_pages_parquet

    write_pages_parquet(corpus_dir, n_pages)
    import ray

    ray.shutdown()

    import pyarrow.dataset as pads

    texts = [
        t
        for t in pads.dataset(corpus_dir)
        .to_table(columns=["text"])["text"]
        .to_pylist()
        if t
    ]
    from myaku_ray.tokenizer import get_tokenizer

    tok = get_tokenizer()
    tok.find_term_tfs(texts[0])  # warm: lexicon + regex compile

    def time_pass(fn) -> float:
        t0 = time.time()
        for t in texts:
            fn(t)
        return time.time() - t0

    passes = int(os.environ.get("MYAKU_AB_PASSES", "3"))
    fast_times, slow_times = [], []
    pos_times = []
    for _ in range(passes):  # alternate so host drift hits all equally
        fast_times.append(time_pass(tok.find_term_tfs))
        slow_times.append(time_pass(tok._find_term_tfs_slow))
        # round-5 third lane: the array-native positions kernel (same
        # term set + per-occurrence offsets) measured against the same
        # texts — the POSITIONS_r05 1.045x build claim's kernel basis
        pos_times.append(time_pass(tok.find_term_positions_arrays))
    n_chars = sum(len(t) for t in texts)
    fast_s = _st.median(fast_times)
    slow_s = _st.median(slow_times)
    pos_s = _st.median(pos_times)
    return {
        "metric": "tokenizer tf-kernel A/B (same process, same texts)",
        "n_docs": len(texts),
        "n_chars": n_chars,
        "passes": passes,
        "kernel_fast_s": round(fast_s, 3),
        "kernel_slow_s": round(slow_s, 3),
        "kernel_positions_s": round(pos_s, 3),
        "fast_times_s": [round(x, 3) for x in fast_times],
        "slow_times_s": [round(x, 3) for x in slow_times],
        "positions_times_s": [round(x, 3) for x in pos_times],
        "speedup": round(slow_s / fast_s, 3),
        "positions_vs_fast_x": round(pos_s / fast_s, 3),
        "fast_mchars_per_s": round(n_chars / fast_s / 1e6, 2),
        "slow_mchars_per_s": round(n_chars / slow_s / 1e6, 2),
        "positions_mchars_per_s": round(n_chars / pos_s / 1e6, 2),
    }


def run_positions() -> dict:
    """Positional-sidecar cost + phrase/proximity query latency, one
    session: build the bench corpus index plain and with positions
    back-to-back N times (MYAKU_POS_REPEATS, default 5), ALTERNATING
    which kind goes first per repeat so host drift hits both equally —
    the overhead claim is the median of per-repeat (positional/plain)
    wall ratios, with every repeat published.  Then time phrase_topk /
    near_topk cold/warm and phrase QPS on the positional index."""
    import statistics as _st

    _ray_init(NUM_CPUS)
    n_pages = int(os.environ.get("MYAKU_POS_PAGES", "50000"))
    repeats = int(os.environ.get("MYAKU_POS_REPEATS", "5"))
    corpus_dir = f"{BENCH_BASE}/pages_{n_pages}"
    from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
    from myaku_ray.pipelines.build import build_index

    write_pages_parquet(corpus_dir, n_pages)
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    conc = max(3 * NUM_CPUS // 4, 1)
    sizes = {}

    def one_build(kind: str, wp: bool) -> float:
        idx = f"{BENCH_BASE}/posbench_{kind}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        build_index(
            corpus_dir, idx, blog_ratings=ratings,
            tokenize_concurrency=conc, with_positions=wp,
        )
        wall = round(time.time() - t0, 3)
        total = 0
        for root, _, files in os.walk(os.path.join(idx, "segments")):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        sizes[kind] = total
        return wall

    reps = []
    for r in range(repeats):
        order = (
            (("plain", False), ("positional", True))
            if r % 2 == 0
            else (("positional", True), ("plain", False))
        )
        walls = {}
        for kind, wp in order:
            walls[kind] = one_build(kind, wp)
        reps.append(
            {
                "order": [k for k, _ in order],
                "plain_s": walls["plain"],
                "positional_s": walls["positional"],
                "overhead_x": round(walls["positional"] / walls["plain"], 3),
            }
        )

    import ray

    n_pq = int(os.environ.get("MYAKU_POS_QPS_N", "1500"))
    serving = bench_phrase_serving(
        corpus_dir, f"{BENCH_BASE}/posbench_positional", NUM_CPUS, n_pq,
        plain_index=f"{BENCH_BASE}/posbench_plain",
    )
    ray.shutdown()

    return {
        "metric": "positional build overhead + phrase/near latency",
        "n_pages": n_pages,
        "num_cpus": NUM_CPUS,
        "repeats": repeats,
        "build_repeats": reps,
        "build_plain_s": round(_st.median(r["plain_s"] for r in reps), 3),
        "build_positional_s": round(
            _st.median(r["positional_s"] for r in reps), 3
        ),
        "build_overhead_x": round(
            _st.median(r["overhead_x"] for r in reps), 3
        ),
        "segments_plain_mb": round(sizes["plain"] / 1e6, 1),
        "segments_positional_mb": round(sizes["positional"] / 1e6, 1),
        "segments_overhead_x": round(sizes["positional"] / sizes["plain"], 3),
        **serving,
    }


def _gen_phrase_stream(corpus_dir: str, n_q: int) -> list[str]:
    """Distinct contiguous 2-token slices of real corpus docs — a
    deterministic stream of guaranteed-chainable phrase queries."""
    import pyarrow.dataset as pads

    from myaku_ray.tokenizer import get_tokenizer

    tok = get_tokenizer()
    out: list[str] = []
    seen: set = set()
    for text in (
        pads.dataset(corpus_dir).to_table(columns=["text"])["text"]
        .to_pylist()
    ):
        if not text:
            continue
        toks = tok.tokenize(text)
        for i in range(len(toks) - 1):
            if toks[i + 1].start != toks[i].start + toks[i].length:
                continue
            q = text[toks[i].start : toks[i + 1].start + toks[i + 1].length]
            if q not in seen:
                seen.add(q)
                out.append(q)
                if len(out) >= n_q:
                    return out
    return out


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--probe" in sys.argv:
        # ~30 s window-health check (same probes the scaling protocol
        # runs per repeat) — cheap go/no-go before a 25-min protocol run
        n_lo = int(os.environ.get("MYAKU_SCALING_N", "4"))
        print(
            json.dumps(
                {**_hw_compute_scaling(n_lo, 4 * n_lo),
                 **_hw_membw_scaling(n_lo, 4 * n_lo),
                 **_hw_coldpage_probe()}
            )
        )
    elif "--serve-worker" in sys.argv:
        print(json.dumps(run_serve_worker()))
    elif "--scaling-serve" in sys.argv:
        print(json.dumps(run_scaling_serve()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--kernel-ab" in sys.argv:
        print(json.dumps(run_kernel_ab()))
    elif "--positions" in sys.argv:
        print(json.dumps(run_positions()))
    else:
        print(json.dumps(run_once()))
