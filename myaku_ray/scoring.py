"""Quality scoring + BM25 relevance — shared by build, query, and oracle.

Quality model reproduces the reference exactly (integer scores,
floor-weighted factor sums):

- ``MyakuArticleScorer.score_article`` = Σ floor(factor × weight) over
  5 factors (myaku/scorer/__init__.py:27-60).
- Factor tables from myaku/scorer/factor_scorers.py:
  length buckets (:141-156), publication recency buckets (:181-189),
  blog order (:209-247), blog rating fixed/star paths (:250-310),
  has-video (:121-135), term-frequency modifier (:337-363).
- Final per-(term,doc) rank value = article quality + tf modifier,
  denormalized into the posting (document_convert.py:201,219-221).

Relevance extends the reference's static ranking with BM25 (the
north-star's base relevance): per-(term,doc) contribution

    s(t, d) = bm25(tf, df, doclen) + QUALITY_WEIGHT * (quality(d) + mod(tf))

and score(q, d) = Σ_{t ∈ q∩d} s(t, d).  Contributions are quantized to
float32 at build time; the oracle quantizes identically, so top-k is
rank-identical.  Ties break by (score, warc_ts, doc_id) DESC, mirroring
ArticleRankKey (myaku/datatypes.py:134-148).
"""

from __future__ import annotations

import math

import numpy as np

MAX_FACTOR_SCORE = 1000  # factor_scorers.py:20

# value-range tables: list of (inclusive_upper_bound | None, multiplier);
# first matching bound wins (ValueRangeMultipliers, factor_scorers.py:45-100)
LENGTH_RANGES = [
    (100, -1), (200, -0.5), (300, 0), (400, 0.2), (500, 0.6), (700, 0.8),
    (1000, 1), (1300, 0.8), (1500, 0.6), (1700, 0.4), (1900, 0.2),
    (2100, 0), (2500, -0.5), (None, -1),
]
RECENCY_RANGES = [
    (7, 1), (30, 0.9), (90, 0.6), (180, 0.4), (365, 0.2),
    (365 * 3, 0), (None, -0.2),
]
STAR_RANGES = [
    (5, -0.5), (10, -0.25), (20, 0), (30, 0.25), (50, 0.5),
    (70, 0.7), (100, 0.8), (None, 1),
]
TF_RANGES = [(1, 0), (2, 0.25), (3, 0.5), (4, 0.75), (None, 1)]

FIXED_SOURCE_MULTIPLIER = {"news": 0.25, "editorial": 0.25}

# (scorer, weight) lists — scorer/__init__.py:27-38
ARTICLE_FACTOR_WEIGHTS = {
    "length": 3,
    "blog_order": 1,
    "blog_rating": 2,
    "has_video": 1,
    "recency": 2,
}
TF_MOD_WEIGHT = 3

BM25_K1 = 1.2
BM25_B = 0.75
QUALITY_WEIGHT = 1.0 / 2000.0  # scales quality ints into BM25 magnitude


def range_multiplier(ranges, value) -> float:
    for bound, mult in ranges:
        if bound is None or value <= bound:
            return mult
    raise ValueError("no unbounded range")


def length_score(alnum: int) -> int:
    return math.floor(MAX_FACTOR_SCORE * range_multiplier(LENGTH_RANGES, alnum))


def recency_score(age_days: int) -> int:
    return math.floor(MAX_FACTOR_SCORE * range_multiplier(RECENCY_RANGES, age_days))


def has_video_score(has_video: bool) -> int:
    return MAX_FACTOR_SCORE if has_video else 0


def blog_order_score(article_order, section_order) -> int:
    # factor_scorers.py:209-247
    if article_order is not None and article_order == 1:
        return MAX_FACTOR_SCORE
    if section_order is not None and section_order == 1:
        return math.floor(MAX_FACTOR_SCORE * 0.5)
    return 0


def blog_rating_score(source: str, rating: float | None) -> int:
    # factor_scorers.py:250-310; news sources fixed, blog source star buckets
    if source in FIXED_SOURCE_MULTIPLIER:
        return math.floor(MAX_FACTOR_SCORE * FIXED_SOURCE_MULTIPLIER[source])
    mult = range_multiplier(STAR_RANGES, int(rating if rating is not None else 0))
    return math.floor(MAX_FACTOR_SCORE * mult)


def article_quality_score(
    *,
    alnum: int,
    age_days: int,
    has_video: bool,
    source: str,
    blog_rating: float | None,
    blog_article_order: int | None,
    blog_section_order: int | None,
) -> int:
    """Σ floor(factor × weight) — scorer/__init__.py:55-60 (integer)."""
    total = 0
    total += math.floor(length_score(alnum) * ARTICLE_FACTOR_WEIGHTS["length"])
    total += math.floor(
        blog_order_score(blog_article_order, blog_section_order)
        * ARTICLE_FACTOR_WEIGHTS["blog_order"]
    )
    total += math.floor(
        blog_rating_score(source, blog_rating) * ARTICLE_FACTOR_WEIGHTS["blog_rating"]
    )
    total += math.floor(
        has_video_score(has_video) * ARTICLE_FACTOR_WEIGHTS["has_video"]
    )
    total += math.floor(recency_score(age_days) * ARTICLE_FACTOR_WEIGHTS["recency"])
    return total


def tf_modifier(tf: int) -> int:
    """Term-frequency modifier (scorer/__init__.py:62-85, floor-weighted)."""
    return math.floor(
        math.floor(MAX_FACTOR_SCORE * range_multiplier(TF_RANGES, tf)) * TF_MOD_WEIGHT
    )


# ---------------------------------------------------------------------------
# BM25 (Lucene-style non-negative idf)
# ---------------------------------------------------------------------------

def idf(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25(tf: float, df: int, doclen: float, n_docs: int, avgdl: float) -> float:
    num = tf * (BM25_K1 + 1.0)
    den = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * doclen / avgdl)
    return idf(df, n_docs) * num / den


def posting_scores_vec(
    tfs: np.ndarray,
    doclens: np.ndarray,
    qualities: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
) -> np.ndarray:
    """Vectorized per-posting contribution, quantized to float32.

    Matches the scalar path bit-for-bit: same double-precision formula,
    then one float32 cast — the oracle uses ``posting_score`` below which
    does the same ops.
    """
    tfs_f = tfs.astype(np.float64)
    num = tfs_f * (BM25_K1 + 1.0)
    den = tfs_f + BM25_K1 * (1.0 - BM25_B + BM25_B * doclens.astype(np.float64) / avgdl)
    base = idf(df, n_docs) * num / den
    mods = np.floor(
        np.floor(
            MAX_FACTOR_SCORE
            * np.select(
                [tfs <= 1, tfs <= 2, tfs <= 3, tfs <= 4],
                [0.0, 0.25, 0.5, 0.75],
                default=1.0,
            )
        )
        * TF_MOD_WEIGHT
    )
    total = base + QUALITY_WEIGHT * (qualities.astype(np.float64) + mods)
    return total.astype(np.float32)


def posting_score(
    tf: int, doclen: int, quality: int, df: int, n_docs: int, avgdl: float
) -> float:
    """Scalar per-posting contribution (oracle path), float32-quantized."""
    base = bm25(float(tf), df, float(doclen), n_docs, avgdl)
    total = base + QUALITY_WEIGHT * (float(quality) + float(tf_modifier(tf)))
    return float(np.float32(total))


# ---------------------------------------------------------------------------
# More-like-this term selection (shared by Searcher.more_like_this and
# the serial oracle so selection float behavior is identical)
# ---------------------------------------------------------------------------

MLT_N_TERMS = 8


def mlt_term_score(tf: int, df: int, n_docs: int) -> float:
    """Seed-term salience for more-like-this: tf x BM25-idf, rounded to
    6 decimals (the library-wide oracle-identity rule)."""
    return round(tf * idf(df, n_docs), 6)


def select_mlt_terms(
    tf_by_term: dict, df_of, n_docs: int, n_terms: int = MLT_N_TERMS
) -> list:
    """Top ``n_terms`` seed-document terms by (mlt_term_score DESC,
    term ASC); terms absent from the index (df 0) are skipped."""
    scored = []
    for term, tf in tf_by_term.items():
        df = df_of(term)
        if df and df > 0:
            scored.append((-mlt_term_score(tf, df, n_docs), term))
    scored.sort()
    return [t for (_, t) in scored[:n_terms]]


# ---------------------------------------------------------------------------
# Pseudo-relevance-feedback (Rocchio-style) expansion-term selection and
# significant-terms ranking — shared by the Searcher serving paths and the
# serial oracle so every float/tie decision is identical on both sides.
# ---------------------------------------------------------------------------

PRF_FB_DOCS = 5  # feedback depth: top-R first-pass docs
PRF_N_TERMS = 8  # expansion terms added to the query

SIG_FB_DOCS = 20  # foreground sample: top-R matched docs
SIG_TOPK = 10
SIG_MIN_FG = 2  # a term seen in one foreground doc is noise, not signal


def select_prf_terms(
    tf_by_term: dict, df_of, n_docs: int, n_terms: int = PRF_N_TERMS
) -> list:
    """Expansion terms for pseudo-relevance feedback: the MLT salience
    kernel (summed feedback tf x idf, 6-decimal rounding, term-ASC tie
    break) over the CONCATENATED feedback documents.  The caller must
    already have removed the original query terms from ``tf_by_term``
    (they are the query, not an expansion)."""
    return select_mlt_terms(tf_by_term, df_of, n_docs, n_terms)


def rank_significant_terms(
    fg_by_term: dict,
    df_of,
    n_docs: int,
    k: int = SIG_TOPK,
    min_fg: int = SIG_MIN_FG,
) -> list:
    """Foreground-vs-background lift ranking with EXACT arithmetic.

    ``fg_by_term[t]`` = number of foreground (matched-sample) docs
    containing ``t``; background rate = df(t) / n_docs.  With the
    foreground size constant per query, lift order == (fg * n_docs) /
    df order, compared as exact ``Fraction``s — no float epsilon can
    reorder ties, so the serial oracle is bit-reproducible.  Rank =
    (lift DESC, fg DESC, term ASC); terms below ``min_fg`` or absent
    from the index are dropped.  Returns [(term, fg, df), ...]."""
    from fractions import Fraction

    scored = []
    for t, fg in fg_by_term.items():
        if fg < min_fg:
            continue
        df = df_of(t)
        if not df or df <= 0:
            continue
        scored.append((-Fraction(fg * n_docs, df), -fg, t, df))
    scored.sort()
    return [(t, -nfg, df) for (_lift, nfg, t, df) in scored[:k]]
