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
