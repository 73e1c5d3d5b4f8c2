"""Deterministic hashing utilities for index routing (process-independent)."""

from __future__ import annotations

import hashlib


def term_hash(term: str) -> int:
    """Stable 63-bit hash of a term (python hash() is salted — never use it
    for routing).  ``term_hash(term) % num_segments`` is the segment
    assignment, computable identically at build and query time."""
    d = hashlib.blake2b(term.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big") & 0x7FFF_FFFF_FFFF_FFFF
