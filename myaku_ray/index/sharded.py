"""Federated serving over a document-sharded index
(pipelines/shard.py): fan the query to per-shard Searchers, merge on
the total rank key.

Because every shard was encoded with the GLOBAL collection statistics
(the build's df/stats exchange) and shards partition the document
space, a doc's baked per-(term, doc) contributions — and therefore
its summed score — are bit-identical to the monolithic index's.  The
global top-k is then exactly the k best rows of the union of
per-shard top-k lists under the shared total order
(score, warc_us, doc_id) DESC; no rescoring and no second fetch
round is needed (contrast Lucene's dfs_query_then_fetch, which pays
an extra stats round-trip at query time precisely because its shards
index with LOCAL stats).

Per-shard calls run in a thread pool: Searcher's hot loops release
the GIL in Arrow/numpy kernels, and on a real deployment each shard
is a remote query node anyway — the pool models that fan-out without
adding a Ray task round-trip per query.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import ray

from myaku_ray.index.searcher import Searcher, SearchResult


class ShardedSearcher:
    """Query engine over the shard directories of ``build_sharded_index``
    (each a complete index dir the ordinary Searcher opens)."""

    def __init__(self, shard_dirs: list[str], cache_segments: bool = True):
        if not shard_dirs:
            raise ValueError("need at least one shard dir")
        self.shard_dirs = list(shard_dirs)
        self.shards = [
            Searcher(d, cache_segments=cache_segments) for d in shard_dirs
        ]
        self._pool = ThreadPoolExecutor(
            max_workers=min(len(self.shards), (os.cpu_count() or 8))
        )

    # -- fan-out / merge ----------------------------------------------------

    def _fanout(self, fn) -> list:
        """Run ``fn(shard_searcher)`` on every shard concurrently."""
        return list(self._pool.map(fn, self.shards))

    @staticmethod
    def _merge(per_shard: list[list[SearchResult]], k: int):
        """k best rows of the union under (score, warc_us, doc_id) DESC —
        the engine-wide rank key (shards are disjoint, so no doc-level
        dedup is needed)."""
        rows = [r for hits in per_shard for r in hits]
        rows.sort(key=lambda r: (r.score, r.warc_us, r.doc_id), reverse=True)
        return rows[:k]

    # -- query API (mirrors Searcher) ----------------------------------------

    def topk(
        self, query_str: str, k: int = 10, query_type: str = "exact"
    ) -> list[SearchResult]:
        return self._merge(
            self._fanout(lambda s: s.topk(query_str, k, query_type)), k
        )

    def search(
        self, query_str: str, k: int = 10, query_type: str = "exact"
    ) -> list[SearchResult]:
        """topk + hydration.  Each hit hydrates on the shard that owns
        it (``doc_id % n_shards`` — the build's routing key), the way a
        real fan-out fetches documents from the owning content node."""
        hits = self.topk(query_str, k, query_type)
        if not hits:
            return hits
        n = len(self.shards)
        by_shard: dict[int, list[SearchResult]] = {}
        for r in hits:
            by_shard.setdefault(r.doc_id % n, []).append(r)
        hydrated: dict[int, SearchResult] = {}
        for i, sub in by_shard.items():
            for r in self.shards[i].hydrate(sub, query_str, query_type):
                hydrated[r.doc_id] = r
        return [hydrated[r.doc_id] for r in hits]

    def count(self, query_str: str, query_type: str = "exact") -> int:
        return sum(self._fanout(lambda s: s.count(query_str, query_type)))

    def phrase_topk(self, query_str: str, k: int = 10) -> list[SearchResult]:
        return self._merge(
            self._fanout(lambda s: s.phrase_topk(query_str, k)), k
        )

    def near_topk(
        self, query_str: str, window: int, k: int = 10
    ) -> list[SearchResult]:
        return self._merge(
            self._fanout(lambda s: s.near_topk(query_str, window, k)), k
        )


@ray.remote
class _ShardQueryNode:
    """One query node owning one shard directory — the process shape of
    a real deployment (an Elasticsearch data node / Vespa content node).
    The Searcher and all its lazily-built serving caches live inside the
    actor, so segment state is loaded once per node, never shipped."""

    def __init__(self, shard_dir: str):
        self.searcher = Searcher(shard_dir)

    def topk(self, q: str, k: int, query_type: str) -> list[SearchResult]:
        return self.searcher.topk(q, k, query_type)

    def count(self, q: str, query_type: str) -> int:
        return self.searcher.count(q, query_type)

    def phrase_topk(self, q: str, k: int) -> list[SearchResult]:
        return self.searcher.phrase_topk(q, k)

    def near_topk(self, q: str, window: int, k: int) -> list[SearchResult]:
        return self.searcher.near_topk(q, window, k)

    def hydrate(
        self, hits: list[SearchResult], q: str, query_type: str
    ) -> list[SearchResult]:
        return self.searcher.hydrate(hits, q, query_type)


class RayShardedSearcher:
    """Federated serving over REAL process boundaries: one Ray actor per
    shard (``_ShardQueryNode``), fan-out via ``.remote()`` futures, merge
    on the coordinator under the same total rank key as ShardedSearcher.

    This is the deployment-shaped tier — per-shard segment caches live
    in separate processes (separate heaps, true parallelism, placeable
    on different nodes by the Ray scheduler), and only top-k hit rows
    (~k small dataclasses per shard) cross the process boundary per
    query.  On a multi-node cluster the same class works unchanged: Ray
    places each query node wherever its CPU reservation fits and the
    coordinator's merge cost stays O(n_shards * k).

    Results are bit-identical to ShardedSearcher (and therefore to the
    monolithic Searcher) — pytest gates all three against each other.

    ``replicas`` is the query-throughput axis: R query nodes per shard
    over the same shard directory (a real deployment's replica groups).
    Each query fans to ONE replica per shard, chosen round-robin, so
    concurrent queries spread across replica groups while every query
    still sees the whole corpus.  Correctness is replica-invariant
    (same directories), so the identity gates hold for any R.

    Scheduling note: n_shards x replicas x num_cpus_per_shard CPU is
    reserved up front; if it exceeds the cluster, actor creation pends
    and the first query blocks forever — size replicas to the cluster
    (or pass fractional num_cpus_per_shard in small sessions).
    """

    def __init__(
        self,
        shard_dirs: list[str],
        num_cpus_per_shard: float = 1,
        replicas: int = 1,
    ):
        if not shard_dirs:
            raise ValueError("need at least one shard dir")
        if replicas < 1:
            raise ValueError("replicas must be >= 1")
        self.shard_dirs = list(shard_dirs)
        self.replica_groups = [
            [
                _ShardQueryNode.options(num_cpus=num_cpus_per_shard).remote(d)
                for _ in range(replicas)
            ]
            for d in shard_dirs
        ]
        self._rr = 0

    @property
    def nodes(self):
        """One representative node per shard (replica 0) — the hydration
        owner path and existing callers use this."""
        return [g[0] for g in self.replica_groups]

    def _pick(self):
        """One node per shard for a single query, round-robin across
        replica groups."""
        r = self._rr
        self._rr += 1
        return [g[r % len(g)] for g in self.replica_groups]

    # -- async fan-out: returns futures so a caller can pipeline many
    # queries (the QPS bench keeps a window in flight) ---------------------

    def topk_async(self, q: str, k: int = 10, query_type: str = "exact"):
        return [n.topk.remote(q, k, query_type) for n in self._pick()]

    @staticmethod
    def merge(per_shard: list[list[SearchResult]], k: int):
        return ShardedSearcher._merge(per_shard, k)

    # -- sync API (mirrors ShardedSearcher) -----------------------------------

    def topk(
        self, query_str: str, k: int = 10, query_type: str = "exact"
    ) -> list[SearchResult]:
        return self.merge(ray.get(self.topk_async(query_str, k, query_type)), k)

    def count(self, query_str: str, query_type: str = "exact") -> int:
        return sum(
            ray.get(
                [n.count.remote(query_str, query_type) for n in self._pick()]
            )
        )

    def phrase_topk(self, query_str: str, k: int = 10) -> list[SearchResult]:
        return self.merge(
            ray.get(
                [n.phrase_topk.remote(query_str, k) for n in self._pick()]
            ),
            k,
        )

    def near_topk(
        self, query_str: str, window: int, k: int = 10
    ) -> list[SearchResult]:
        return self.merge(
            ray.get(
                [n.near_topk.remote(query_str, window, k) for n in self._pick()]
            ),
            k,
        )

    def search(
        self, query_str: str, k: int = 10, query_type: str = "exact"
    ) -> list[SearchResult]:
        """topk + hydration on the owning node (doc_id % n routing)."""
        hits = self.topk(query_str, k, query_type)
        if not hits:
            return hits
        n = len(self.replica_groups)
        by_shard: dict[int, list[SearchResult]] = {}
        for r in hits:
            by_shard.setdefault(r.doc_id % n, []).append(r)
        rr = self._rr
        futs = {
            i: self.replica_groups[i][rr % len(self.replica_groups[i])]
            .hydrate.remote(sub, query_str, query_type)
            for i, sub in by_shard.items()
        }
        hydrated: dict[int, SearchResult] = {}
        for sub in ray.get(list(futs.values())):
            for r in sub:
                hydrated[r.doc_id] = r
        return [hydrated[r.doc_id] for r in hits]

    def shutdown(self) -> None:
        """Kill every query-node actor (bench hygiene between sections)."""
        for g in self.replica_groups:
            for n in g:
                ray.kill(n)
        self.replica_groups = []
