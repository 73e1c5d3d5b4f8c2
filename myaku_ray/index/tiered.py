"""Tiered query routing: pruned head tier + exact full tier.

``pipelines/prune.py`` proves the per-term top-P kept set is a
rank-key PREFIX, so a SINGLE-term query with k <= P answered from the
pruned tier is EXACT — and single high-df-term lookups are precisely
the head of a search workload.  The router sends a query to the pruned
tier only when that exactness precondition holds (one analyzed term,
k <= P); everything else — multi-term disjunctions, deep pagination —
goes to the full index.  The composite is therefore bit-identical to
the monolithic Searcher on EVERY query (it shares the exact search
golden) while the head queries touch at most P postings.

At 10^12 docs the two tiers differ by orders of magnitude in size
(bench: 0.45 % of postings kept at P=64 on the 100k-page corpus), so
this is the standard production split: the pruned tier fits in fast
storage / page cache on every query node; the full index stays on the
doc-routed federation for the tail.
"""

from __future__ import annotations

import json
import os

from myaku_ray.index.searcher import Searcher, SearchResult


class TieredSearcher:
    """Route between a pruned head tier and the exact full index.

    ``pruned_dir`` must be a ``prune_index`` derivation of
    ``index_dir`` (the marker's ``pruned_max_postings`` is read to get
    P).  ``served_pruned`` / ``served_full`` count routing decisions."""

    def __init__(self, index_dir: str, pruned_dir: str):
        self.full = Searcher(index_dir)
        self.pruned = Searcher(pruned_dir)
        with open(os.path.join(pruned_dir, "stats.json")) as f:
            self.max_postings = int(
                json.load(f).get("pruned_max_postings", 0)
            )
        if self.max_postings <= 0:
            raise ValueError(f"{pruned_dir} is not a pruned tier")
        self.served_pruned = 0
        self.served_full = 0

    def topk(self, query_str: str, k: int = 10) -> list[SearchResult]:
        terms = list(dict.fromkeys(self.full.analyze_query(query_str)))
        if len(terms) == 1 and k <= self.max_postings:
            self.served_pruned += 1
            return self.pruned.topk(query_str, k)
        self.served_full += 1
        return self.full.topk(query_str, k)

    def search(self, query_str: str, k: int = 10) -> list[SearchResult]:
        return self.full.hydrate(self.topk(query_str, k), query_str)
