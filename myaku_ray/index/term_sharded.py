"""Term-routed (by-term partitioned) serving tier — the OTHER classic
index-sharding axis, complementing the document-routed federation in
``index/sharded.py``.

The build already hash-partitions terms into ``num_segments`` segment
directories (``term_hash(term) % num_segments`` — ``searcher.py``), so a
term shard is simply a SUBSET of segment dirs: shard(t) =
(term_hash(t) % num_segments) % n_shards.  Each query-node actor owns
its segment subset (on a real deployment that subset is what sits on
its local disk; here every node opens the same path but only ever reads
its own segments) and returns the decoded posting ARRAYS for the query
terms it owns.  The coordinator rebuilds per-term ``ArrayPostings`` and
runs the ordinary ``array_topk`` — **bit-identical to the monolithic
Searcher by construction**, because scores are baked per-posting at
build time and the coordinator executes the exact same ranking kernel
over the exact same arrays.

The trade this tier makes explicit (and measures — see
``transfer_bytes``): document-routing moves O(shards x k) result rows
per query but every shard scans every query term; term-routing touches
only the owning shards but moves O(sum df) decoded postings per query —
corpus-sized for a particle term.  The production answer is composition:
term-route the PRUNED tier (``pipelines/prune.py``), where every term's
transfer is bounded by P postings, and keep the full index doc-routed
for the exact tail.  Both compositions are tested.
"""

from __future__ import annotations

import os
from collections import defaultdict

import ray

from myaku_ray.index.codec import ArrayPostings
from myaku_ray.index.searcher import Searcher, SearchResult
from myaku_ray.index.util import term_hash


@ray.remote
class _TermShardNode:
    """One term-shard query node: a Searcher over the shared layout,
    serving ONLY terms routed to this shard (its segment subset)."""

    def __init__(self, index_dir: str, shard_id: int, n_shards: int):
        self._s = Searcher(index_dir)
        self._shard_id = shard_id
        self._n_shards = n_shards

    def term_postings(self, terms: list[str]):
        """Decoded (ids, scores, warc, max_score) per owned term.

        Arrays ride Ray's zero-copy numpy serialization.  A term above
        the searcher's DECODE_LIMIT still decodes fully here — that
        df-sized transfer is term-routing's documented cost; route the
        pruned tier (per-term transfer <= P postings) when it matters.
        """
        out = {}
        for t in terms:
            it = self._s.term_iterator(t)
            if it is None:
                continue
            if not isinstance(it, ArrayPostings):
                seg = term_hash(t) % self._s.stats["num_segments"]
                blobs = [
                    blob
                    for fi in self._s._segment_file_indexes(seg)
                    for blob, _ms in fi.term_rows(t)
                ]
                it = ArrayPostings(blobs)
            out[t] = (it.ids, it.scores, it.warc, it.max_score)
        return out


class TermShardedSearcher:
    """Coordinator over ``n_shards`` term-shard query nodes.

    ``topk`` reproduces ``Searcher.topk`` (exact query type)
    bit-identically: same per-term arrays, same ``array_topk`` /
    ``topk_arrays`` ranking kernel, same (score, warc_us, doc_id) DESC
    key.  ``transfer_bytes`` exposes the posting bytes moved for the
    last query — the axis the docstring trade is measured on."""

    def __init__(self, index_dir: str, n_shards: int = 4):
        self.index_dir = index_dir
        self.n_shards = n_shards
        # local Searcher for query analysis + hydration only — it never
        # reads postings on this path
        self._local = Searcher(index_dir)
        self._num_segments = self._local.stats["num_segments"]
        self.nodes = [
            _TermShardNode.remote(index_dir, i, n_shards)
            for i in range(n_shards)
        ]
        self.transfer_bytes = 0

    def _shard_of(self, term: str) -> int:
        return (term_hash(term) % self._num_segments) % self.n_shards

    def topk(self, query_str: str, k: int = 10) -> list[SearchResult]:
        from myaku_ray.index.wand import array_topk

        terms = list(dict.fromkeys(self._local.analyze_query(query_str)))
        by_shard: dict[int, list[str]] = defaultdict(list)
        for t in terms:
            by_shard[self._shard_of(t)].append(t)
        refs = [
            self.nodes[s].term_postings.remote(ts)
            for s, ts in by_shard.items()
        ]
        iters: dict[str, ArrayPostings] = {}
        moved = 0
        for part in ray.get(refs):
            for t, (ids, scores, warc, mx) in part.items():
                iters[t] = ArrayPostings.from_arrays(ids, scores, warc, mx)
                moved += ids.nbytes + scores.nbytes + warc.nbytes
        self.transfer_bytes = moved
        if not iters:
            return []
        if len(iters) == 1:
            (it,) = iters.values()
            hits = it.topk_arrays(k)
        else:
            hits = array_topk(iters, k)
        return [
            SearchResult(doc_id=d, score=s, warc_us=w) for (d, s, w) in hits
        ]

    def search(self, query_str: str, k: int = 10):
        """Hydrated results (url attached), like ``Searcher.search`` —
        hydration is a doc-store point read, orthogonal to how postings
        are routed."""
        return self._local.hydrate(self.topk(query_str, k), query_str)

    def shutdown(self) -> None:
        for n in self.nodes:
            ray.kill(n)
        self.nodes = []
