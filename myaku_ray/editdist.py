"""Edit-distance kernels shared by the fuzzy-suggestion paths.

``levenshtein_capped`` is plain unit-cost Levenshtein (the DuckDB
``levenshtein`` contract the SQL oracles check against), banded to a
cap so vocabulary-scale candidate verification costs O(len * cap) per
pair instead of O(len^2).  ``deletion_variants`` is the SymSpell
candidate key set: every string reachable by deleting <= max_dist
chars.  Two strings at distance <= d always share a <= d-deletion
variant (delete each side's unaligned chars of an optimal alignment),
so a variant-keyed inverted map has exact candidate recall.
"""

from __future__ import annotations

import itertools


def levenshtein_capped(a: str, b: str, cap: int) -> int:
    """Unit-cost Levenshtein distance, banded: returns the exact
    distance when it is <= cap, else cap + 1 (early-exiting as soon as
    a full DP row exceeds the cap).  Two reusable rows, O(cap) work per
    row: only band cells [i-cap, i+cap] are visited.  Reuse is safe
    because cells right of the band were never written (bands only
    advance right, so they hold their init values, all > cap), cells
    left of it are never read, and the lo-1 boundary is written
    explicitly each row."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    if la == 0 or lb == 0:
        return max(la, lb)
    big = cap + 1
    prev = list(range(lb + 1))
    cur = [big] * (lb + 1)
    for i in range(1, la + 1):
        lo = max(1, i - cap)
        hi = min(lb, i + cap)
        cur[lo - 1] = i if lo == 1 and i <= cap else big
        best = cur[lo - 1]
        ca = a[i - 1]
        for j in range(lo, hi + 1):
            v = prev[j] + 1
            w = cur[j - 1] + 1
            if w < v:
                v = w
            x = prev[j - 1] + (0 if ca == b[j - 1] else 1)
            if x < v:
                v = x
            cur[j] = v
            if v < best:
                best = v
        if best > cap:
            return big
        prev, cur = cur, prev
    return min(prev[lb], big)


def deletion_variants(term: str, max_dist: int) -> set[str]:
    """All strings reachable from ``term`` by deleting up to
    ``max_dist`` characters, the term itself included —
    O(len^max_dist) strings."""
    seen = {term}
    for k in range(1, min(max_dist, len(term)) + 1):
        for idxs in itertools.combinations(range(len(term)), k):
            drop = set(idxs)
            seen.add("".join(c for i, c in enumerate(term) if i not in drop))
    return seen
