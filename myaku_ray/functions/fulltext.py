"""Full-text query operators exposed to the driver gate.

- ``bm25_topk_docs``: build the whitespace BM25 index over ``documents``
  with the real engine (salted shuffle -> varint segments -> WAND) and
  return top-10 per reference term.  SQL-checkable: scores are
  float32-quantized exactly as the DuckDB oracle's ``::FLOAT`` cast.
- ``pages_*``: the Myaku-semantics pipeline over the synthetic web-page
  corpus (HTML extraction, lemma tokenization, quality-weighted ranking).
  Not SQL-expressible -> driver records rows-only checks; the pytest suite
  holds the strong (oracle) gate for these.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pyarrow as pa

TEXT_QUERY_TERMS = [
    "data", "spark", "window", "the", "vector", "customer", "zzzmissing",
]
CACHE_ROOT = "/tmp/myaku_ray_cache"


def _cache_dir(kind: str, sf_dir: str) -> str:
    key = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    return os.path.join(CACHE_ROOT, f"{kind}_{key}")


def bm25_topk_docs(sf_dir: str, k: int = 10):
    from myaku_ray.pipelines.text_index import TextSearcher, build_text_index

    idx = _cache_dir("textindex", sf_dir)
    build_text_index(f"{sf_dir}/documents.parquet", idx)
    s = TextSearcher(idx)
    rows = {"term": [], "doc_id": [], "score": [], "rank": []}
    for term in TEXT_QUERY_TERMS:
        for rank, (doc_id, score) in enumerate(s.topk(term, k), start=1):
            rows["term"].append(term)
            rows["doc_id"].append(doc_id)
            rows["score"].append(score)
            rows["rank"].append(rank)
    import numpy as np

    return pa.table(
        {
            "term": pa.array(rows["term"], pa.string()),
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "score": pa.array(np.asarray(rows["score"], dtype=np.float32)),
            "rank": pa.array(rows["rank"], pa.int64()),
        }
    )


BM25_TOPK_SQL_TEMPLATE = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                 (SELECT CAST(sum(doclen) AS DOUBLE) / count(*) FROM dl) AS avgdl),
s AS (
  SELECT tf.term, tf.doc_id,
    (ln(1.0::DOUBLE + (stats.n_docs - df.df + 0.5::DOUBLE) / (df.df + 0.5::DOUBLE))
     * (tf.tf * (1.2::DOUBLE + 1.0::DOUBLE))
     / (tf.tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * dl.doclen / stats.avgdl)))::FLOAT AS score
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  WHERE tf.term IN ({terms})
)
SELECT term, doc_id, score,
  CAST(row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id DESC) AS BIGINT) AS rank
FROM s
QUALIFY rank <= {k}
"""


def bm25_topk_sql(k: int = 10) -> str:
    terms = ", ".join(f"'{t}'" for t in TEXT_QUERY_TERMS)
    return BM25_TOPK_SQL_TEMPLATE.format(terms=terms, k=k)


# ---------------------------------------------------------------------------
# Pages-corpus pipelines (Myaku semantics; rows-only driver checks)
# ---------------------------------------------------------------------------

PAGES_N = 600


def _pages_dir() -> str:
    from myaku_ray.corpus import write_pages_parquet

    d = os.path.join(CACHE_ROOT, f"pages_{PAGES_N}")
    write_pages_parquet(d, PAGES_N)
    return d


def pages_extract_stats(sf_dir: str):
    """Extraction pipeline summary over the synthetic page corpus."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from myaku_ray.corpus import gen_blogs_table
    from myaku_ray.stages.extract import make_extract_fn

    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    pages = rd.read_parquet(_pages_dir(), columns=["url", "warc_ts", "html", "lang"])
    docs = pages.map_batches(
        make_extract_fn(ratings), batch_format="pyarrow", batch_size=256
    )
    return docs.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("alnum_count", alias_name="sum_alnum"),
    )


def canon_json(v) -> str:
    """Canonical JSON for nested FLI payload values: sorted keys, no
    whitespace, raw utf-8 — both the distributed query and the serial
    golden generator serialize through this exact function, so equal
    payloads give byte-equal strings."""
    import json

    return json.dumps(v, ensure_ascii=False, separators=(",", ":"),
                      sort_keys=True)


def fli_payload_json(batch: pa.Table) -> pa.Table:
    """Serialize the three nested FLI columns to canonical JSON strings.

    The typed list<struct> payload stays the engine-internal format
    (FLI_SCHEMA; pytest goldens assert it field-by-field) — this is the
    driver-facing projection, which must be value-hashable against a
    DuckDB VALUES oracle, and nested struct literals are not reliably
    hash-comparable across Arrow and DuckDB result paths."""
    cols = {n: batch[n] for n in ("doc_id", "term", "tf", "reading", "pos")}
    out = dict(cols)
    for name in ("found_positions", "possible_interps", "interp_position_map"):
        out[f"{name}_json"] = pa.array(
            [canon_json(v) for v in batch[name].to_pylist()], pa.string()
        )
    return pa.table(out)


def _pages_fli_typed(sf_dir: str):
    """Typed (list<struct>) FLI payload slice — shared by the JSON
    driver projection and the interp-profile digest."""
    import pyarrow.compute as pc
    import ray.data as rd

    from myaku_ray.corpus import gen_blogs_table
    from myaku_ray.stages.extract import make_extract_fn
    from myaku_ray.stages.tokenize import FliStage

    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    pages = rd.read_parquet(_pages_dir(), columns=["url", "warc_ts", "html", "lang"])
    docs = pages.map_batches(
        make_extract_fn(ratings), batch_format="pyarrow", batch_size=256
    ).select_columns(["doc_id", "text"])

    def interesting(batch: pa.Table) -> pa.Table:
        multi = pc.greater(pc.list_value_length(batch["possible_interps"]), 1)
        phrase = pc.equal(batch["pos"], "連語")
        return batch.filter(pc.or_(multi, phrase))

    return (
        docs.map_batches(FliStage, batch_format="pyarrow",
                         batch_size=128, concurrency=(1, 4))
        .map_batches(interesting, batch_format="pyarrow")
    )


def pages_fli_interps(sf_dir: str):
    """Full FoundJpnLexicalItem payload over the page corpus: positions,
    possible_interps and interp_position_map (FliStage actor pool;
    myaku/datatypes.py:307-425 analog), with the nested columns
    canonically JSON-serialized for the driver's stored-golden compare.
    Returns the FLI rows for terms with >1 interpretation plus every
    meta-phrase item — the payload slice the reference's golden e2e test
    asserts field-by-field."""
    return _pages_fli_typed(sf_dir).map_batches(
        fli_payload_json, batch_format="pyarrow"
    )


def _pages_searcher():
    """Build (or reuse) the fixed pages-corpus index and return a Searcher
    over it — shared by every pages search query so the index location,
    ratings plumbing and build arguments live in ONE place."""
    from myaku_ray.corpus import gen_blogs_table
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.pipelines.build import build_index

    pages = _pages_dir()
    idx = os.path.join(CACHE_ROOT, f"pagesindex_{PAGES_N}")
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    build_index(pages, idx, blog_ratings=ratings)
    return Searcher(idx)


def pages_search_topk(sf_dir: str, k: int = 10):
    """Full Myaku pipeline: build the pages index, run the reference query
    set, return ranked (query, rank, doc_id, score, url) rows."""
    from myaku_ray.oracle import reference_query_set

    s = _pages_searcher()
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for q in reference_query_set():
        for rank, r in enumerate(s.search(q, k), start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            # round-5 like the parity tests: engine and serial oracle sum
            # f32 contributions in f64 and can differ by 1 ulp
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_boolean_search(sf_dir: str, k: int = 10):
    """Boolean AND/NOT retrieval over the pages index: docs containing
    every must term and none of the ``-``-prefixed terms, BM25-summed
    over the must terms — the conjunctive query type the OR-by-default
    WAND path doesn't express (Searcher.boolean_topk).  Ranked rows for
    the corpus-derived boolean query set; stored golden = the serial
    set-algebra oracle (oracle.oracle_boolean_topk)."""
    from myaku_ray.oracle import boolean_query_set

    s = _pages_searcher()
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for q in boolean_query_set(_pages_dir()):
        for rank, r in enumerate(s.boolean_search(q, k), start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_search_facets(sf_dir: str):
    """Index-native faceted search: matched-doc counts per doc source
    for each reference query — computed from the count() matched set
    and a doc_id->source sidecar (one vectorized searchsorted; no doc
    text read).  Stored golden = serial union-postings + meta-source
    count (oracle.oracle_facets)."""
    from myaku_ray.oracle import reference_query_set

    s = _pages_searcher()
    rows = {"query": [], "source": [], "n_docs": []}
    for q in reference_query_set():
        for src_name, n in s.facets(q):
            rows["query"].append(q)
            rows["source"].append(src_name)
            rows["n_docs"].append(n)
    return pd.DataFrame(rows)


def pages_search_altforms(sf_dir: str, k: int = 10):
    """Alt-form search over the pages index: the QueryType semantics the
    reference reserves but never implements (DEFINITE_ALT_FORMS /
    POSSIBLE_ALT_FORMS, myaku/datastore/__init__.py:26-68) — each query
    term expands to its alternate-spelling group; per-doc group score is
    the max over member spellings.  Ranked rows for the fixed alt-form
    query set under all three query types."""
    from myaku_ray.oracle import altform_query_set

    s = _pages_searcher()
    rows = {
        "query": [], "query_type": [], "rank": [], "doc_id": [],
        "score": [], "url": [],
    }
    for q in altform_query_set():
        for qt in ("exact", "definite", "possible"):
            for rank, r in enumerate(s.search(q, k, query_type=qt), start=1):
                rows["query"].append(q)
                rows["query_type"].append(qt)
                rows["rank"].append(rank)
                rows["doc_id"].append(r.doc_id)
                rows["score"].append(round(r.score, 5))
                rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_prefix_search(sf_dir: str, k: int = 10):
    """Prefix (trailing-wildcard) search over the pages index: each
    corpus-derived prefix expands to the vocabulary terms that start
    with it — capped to the highest-df ``Searcher.PREFIX_MAX_TERMS``
    members in deterministic (-df, term) order — and the members score
    as ONE alt-form-style group (per-doc max).  Stored golden = the
    serial full-vocabulary prefix scan (oracle.oracle_prefix_topk)."""
    from myaku_ray.oracle import prefix_query_set

    s = _pages_searcher()
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for p in prefix_query_set(_pages_dir()):
        hits = s.prefix_topk(p, k)
        for rank, r in enumerate(s.hydrate(hits, p) if hits else [], start=1):
            rows["query"].append(p)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_wildcard_search(sf_dir: str, k: int = 10):
    """General-wildcard search over the pages index (``*ab``, ``a*c``,
    ``*b*``, multi-star): each corpus-derived pattern expands over the
    vocabulary — capped to the highest-df ``Searcher.PREFIX_MAX_TERMS``
    members in deterministic (-df, term) order — and the members score
    as ONE alt-form-style group (per-doc max).  Stored golden = the
    serial regex full-vocabulary scan (oracle.oracle_wildcard_topk)."""
    from myaku_ray.oracle import wildcard_query_set

    s = _pages_searcher()
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for p in wildcard_query_set(_pages_dir()):
        hits = s.wildcard_topk(p, k)
        for rank, r in enumerate(s.hydrate(hits, p) if hits else [], start=1):
            rows["query"].append(p)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_fuzzy_search(sf_dir: str, k: int = 10):
    """Fuzzy (edit-distance) search over the pages index: each
    corpus-derived misspelled query expands to the vocabulary terms
    within Levenshtein distance <= max_dist (SymSpell
    deletion-neighborhood candidates, banded-kernel verification; the
    exact spelling included) — capped to ``Searcher.PREFIX_MAX_TERMS``
    members in deterministic (distance, -df, term) order — and the
    members score as ONE alt-form-style group (per-doc max).  Each
    query runs at max_dist 1 and 2.  Stored golden = the serial
    full-vocabulary scan with an independent Levenshtein
    (oracle.oracle_fuzzy_topk)."""
    from myaku_ray.oracle import fuzzy_query_set

    s = _pages_searcher()
    rows = {
        "query": [], "max_dist": [], "rank": [], "doc_id": [],
        "score": [], "url": [],
    }
    for q in fuzzy_query_set(_pages_dir()):
        for dist in (1, 2):
            hits = s.fuzzy_topk(q, k, max_dist=dist)
            for rank, r in enumerate(
                s.hydrate(hits, q) if hits else [], start=1
            ):
                rows["query"].append(q)
                rows["max_dist"].append(dist)
                rows["rank"].append(rank)
                rows["doc_id"].append(r.doc_id)
                rows["score"].append(round(r.score, 5))
                rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_sharded_search(sf_dir: str, k: int = 10, n_shards: int = 3):
    """Document-sharded build + federated serving: the pages corpus is
    built as ``n_shards`` document-routed index shards sharing GLOBAL
    collection statistics (pipelines/shard.py — one tokenize pass,
    hive-routed (shard, bucket) postings write, vocab-sized global-IDF
    merge replicated to every shard), then the reference query set runs
    through ShardedSearcher (per-shard top-k merged on the total rank
    key).  The oracle is the SAME stored golden as pages_search_topk:
    the sharded engine must be bit-identical to the monolithic one —
    scores included — which is exactly the global-stats exchange's
    guarantee."""
    from myaku_ray.corpus import gen_blogs_table
    from myaku_ray.index.sharded import ShardedSearcher
    from myaku_ray.oracle import reference_query_set
    from myaku_ray.pipelines.shard import build_sharded_index

    pages = _pages_dir()
    out = os.path.join(CACHE_ROOT, f"pagessharded_{PAGES_N}x{n_shards}")
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    m = build_sharded_index(pages, out, n_shards, blog_ratings=ratings)
    fed = ShardedSearcher(m["shard_dirs"])
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for q in reference_query_set():
        for rank, r in enumerate(fed.search(q, k), start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def _pages_sharded_updated_root(n_shards: int = 3) -> str:
    """Sharded index built THROUGH THE INCREMENTAL PATH over the pages
    corpus: sharded build over the first ``UPDATE_SPLIT`` pages, then
    ``update_sharded_index`` with the remaining pages as a crawl batch
    (delta tokenize routed through the same hive (shard, bucket) write,
    global-stats refresh re-encoding every shard).  The final logical
    corpus equals the full corpus, so serving over this tree must match
    the from-scratch golden.  Cached behind a flow marker; shared by
    ``pages_sharded_update_search`` and ``pages_reshard_search``."""
    import shutil

    import pyarrow.parquet as _pq

    from myaku_ray.corpus import gen_blogs_table
    from myaku_ray.pipelines.shard import (
        build_sharded_index,
        update_sharded_index,
    )

    root = os.path.join(
        CACHE_ROOT, f"pagesshupd_{PAGES_N}x{n_shards}_{UPDATE_SPLIT}"
    )
    out = os.path.join(root, "sharded")
    marker = os.path.join(root, "_FLOW_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        base_d = os.path.join(root, "base")
        delta_d = os.path.join(root, "delta")
        os.makedirs(base_d)
        os.makedirs(delta_d)
        full = _pq.read_table(_pages_dir())
        _pq.write_table(
            full.slice(0, UPDATE_SPLIT), os.path.join(base_d, "pages.parquet")
        )
        _pq.write_table(
            full.slice(UPDATE_SPLIT), os.path.join(delta_d, "pages.parquet")
        )
        blogs = gen_blogs_table()
        ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
        build_sharded_index(base_d, out, n_shards, blog_ratings=ratings)
        update_sharded_index(delta_d, out, blog_ratings=ratings)
        with open(marker, "w") as f:
            f.write("ok")
    return out


def _fed_rows(fed, k: int) -> pd.DataFrame:
    from myaku_ray.oracle import reference_query_set

    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for q in reference_query_set():
        for rank, r in enumerate(fed.search(q, k), start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_sharded_update_search(sf_dir: str, k: int = 10, n_shards: int = 3):
    """Incremental update ON THE SHARDED LAYOUT, driven to the
    from-scratch golden (see ``_pages_sharded_updated_root``): one row
    certifying build+update+stats exchange+federation end to end.  The
    oracle is the SAME stored golden as ``pages_search_topk``."""
    from myaku_ray.index.sharded import ShardedSearcher
    from myaku_ray.pipelines.shard import shard_dirs_of

    out = _pages_sharded_updated_root(n_shards)
    return _fed_rows(ShardedSearcher(shard_dirs_of(out, n_shards)), k)


def pages_reshard_search(sf_dir: str, k: int = 10, new_n: int = 2):
    """Reshard the incrementally-updated 3-shard tree to ``new_n`` shards
    WITHOUT re-tokenizing (``pipelines/shard.reshard_index``: fold
    committed deltas/tombstones, re-route postings by the new
    ``doc_id %% new_n`` in one per-bucket pass, re-encode with the
    unchanged global stats) and serve the reference set through the new
    federation.  Routing must not move a single rank or score, so the
    oracle is STILL the from-scratch ``pages_search_topk`` golden —
    build -> update -> reshard -> federated serving, one row."""
    import shutil

    from myaku_ray.index.sharded import ShardedSearcher
    from myaku_ray.pipelines.shard import reshard_index, shard_dirs_of

    src = _pages_sharded_updated_root(3)
    new_root = os.path.join(
        CACHE_ROOT, f"pagesreshard_{PAGES_N}_3to{new_n}"
    )
    if not os.path.exists(os.path.join(new_root, "reshard.json")):
        shutil.rmtree(new_root, ignore_errors=True)
        reshard_index(src, new_root, new_n)
    return _fed_rows(ShardedSearcher(shard_dirs_of(new_root, new_n)), k)


def pages_search_title_boost(sf_dir: str, k: int = 10):
    """Fielded (title-boosted) search over the pages index: a term's
    posting contribution gains a flat ``Searcher.TITLE_BOOST`` when the
    doc's TITLE contains the term (Lucene field-boost semantics; the
    matched set is identical to plain search since title text is part
    of the indexed body).  Stored golden = the serial oracle's boosted
    ranking (oracle.oracle_title_boost_topk) over the reference query
    set."""
    from myaku_ray.oracle import reference_query_set

    s = _pages_searcher()
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for q in reference_query_set():
        hits = s.topk_title_boost(q, k)
        for rank, r in enumerate(s.hydrate(hits, q) if hits else [], start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_search_diverse(sf_dir: str, k: int = 10):
    """Host-collapse (source-diversified) search over the pages index:
    the first k global-rank docs with at most 2 per source — web
    search's site collapse (``Searcher.topk_diverse``; source lookup
    is the facet sidecar, no doc read).  Stored golden = the serial
    full-ranked-list walk (oracle.oracle_topk_diverse)."""
    from myaku_ray.oracle import reference_query_set

    s = _pages_searcher()
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for q in reference_query_set():
        hits = s.topk_diverse(q, k, per_source_cap=2)
        for rank, r in enumerate(s.hydrate(hits, q) if hits else [], start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_search_dated(sf_dir: str, k: int = 10):
    """Date-filtered (crawl-time range) search over the pages index:
    the ordinary BM25 ranking restricted to docs whose warc_us falls in
    [t_lo, t_hi] — Lucene filter semantics, applied INSIDE the ranked
    scan (``Searcher.topk_in_range``: array mask / WAND candidate check
    over the posting payload's own warc column; no sidecar, no doc read,
    no over-fetch).  Ranked rows for the corpus-derived
    (query, range) set; stored golden = the serial filtered ranking
    (oracle.oracle_topk_in_range)."""
    from myaku_ray.oracle import date_range_query_set

    s = _pages_searcher()
    rows = {
        "query": [], "t_lo": [], "t_hi": [], "rank": [], "doc_id": [],
        "score": [], "url": [],
    }
    for q, lo, hi in date_range_query_set(_pages_dir()):
        hits = s.topk_in_range(q, lo, hi, k)
        for rank, r in enumerate(s.hydrate(hits, q) if hits else [], start=1):
            rows["query"].append(q)
            rows["t_lo"].append(lo)
            rows["t_hi"].append(hi)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_search_previews(sf_dir: str, k: int = 5):
    """Full serving contract for the reference query set: ranked results
    WITH the assembled preview strings and matched-term lists — the K5
    sample-selection + M19 whitespace-collapse output the reference's
    API returns per hit (article_preview.py semantics).  Previously only
    pytest-gated (byte-identity engine-vs-rescan); the stored golden
    pins the exact strings as a driver row.  matched_terms is
    '|'-joined (find_lexical_items yields term-sorted items)."""
    from myaku_ray.oracle import reference_query_set

    s = _pages_searcher()
    rows = {
        "query": [], "rank": [], "doc_id": [], "matched_terms": [],
        "preview": [],
    }
    for q in reference_query_set():
        for rank, r in enumerate(s.search(q, k), start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["matched_terms"].append("|".join(r.matched_terms))
            rows["preview"].append(r.preview)
    return pd.DataFrame(rows)


def pages_search_paged(sf_dir: str, pages: tuple = (2, 3)):
    """Cursor pagination (K2): pages 2-3 of each reference query via
    ``Searcher.search_page`` — skip (page-1)*10, take 10 over the
    bounded top-(page*10) heap, the reference's paginate contract
    (index_search.py:232-236).  Page 1 is already pinned by
    pages_search_topk; these rows pin that the heap-resume ranks
    11..30 agree with the serial oracle's full ordering."""
    from myaku_ray.oracle import reference_query_set

    s = _pages_searcher()
    rows = {"query": [], "page": [], "rank": [], "doc_id": [], "score": []}
    for q in reference_query_set():
        for page in pages:
            for i, r in enumerate(s.search_page(q, page), start=1):
                rows["query"].append(q)
                rows["page"].append(page)
                rows["rank"].append((page - 1) * s.PAGE_SIZE + i)
                rows["doc_id"].append(r.doc_id)
                rows["score"].append(round(r.score, 5))
    return pd.DataFrame(rows).astype({"page": "int64", "rank": "int64"})


def pages_result_counts(sf_dir: str):
    """Total matched-doc count per reference query (A3 — the reference's
    result-count endpoint, Searcher.count: posting-list length union
    without hydration)."""
    from myaku_ray.oracle import reference_query_set

    s = _pages_searcher()
    qs = list(reference_query_set())
    return pd.DataFrame(
        {"query": qs, "n_results": [s.count(q) for q in qs]}
    ).astype({"n_results": "int64"})


UPDATE_SPLIT = 400


def _pages_update_searcher():
    """Build the pages index THROUGH THE INCREMENTAL PATH: initial build
    over the corpus's first ``UPDATE_SPLIT`` pages (row order of the
    fixed parquet — deterministic), then ``update_index`` with the
    remaining pages as a crawl batch, then ``compact_index``.  The
    final logical corpus equals the full 600-page corpus, so search
    over this index must match the from-scratch golden — the update /
    displacement / compaction machinery (J4/J5, S6) exercised under a
    driver-recorded row instead of pytest only."""
    import shutil

    import pyarrow.parquet as _pq

    from myaku_ray.corpus import gen_blogs_table
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.pipelines.build import build_index
    from myaku_ray.pipelines.update import compact_index, update_index

    root = os.path.join(CACHE_ROOT, f"pagesupd_{PAGES_N}_{UPDATE_SPLIT}")
    idx = os.path.join(root, "index")
    marker = os.path.join(root, "_FLOW_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        base_d = os.path.join(root, "base")
        delta_d = os.path.join(root, "delta")
        os.makedirs(base_d)
        os.makedirs(delta_d)
        full = _pq.read_table(_pages_dir())
        _pq.write_table(
            full.slice(0, UPDATE_SPLIT),
            os.path.join(base_d, "pages.parquet"),
        )
        _pq.write_table(
            full.slice(UPDATE_SPLIT),
            os.path.join(delta_d, "pages.parquet"),
        )
        blogs = gen_blogs_table()
        ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
        build_index(base_d, idx, blog_ratings=ratings)
        update_index(delta_d, idx, blog_ratings=ratings)
        compact_index(idx)
        with open(marker, "w") as f:
            f.write("ok")
    return Searcher(idx)


def pages_update_search(sf_dir: str, k: int = 10):
    """Ranked reference-set results over the INCREMENTALLY-built index
    (initial build -> update_index -> compact_index); the oracle is the
    same stored golden as pages_search_topk, so this row certifies that
    the incremental path converges to the from-scratch ranking."""
    from myaku_ray.oracle import reference_query_set

    s = _pages_update_searcher()
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for q in reference_query_set():
        for rank, r in enumerate(s.search(q, k), start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_update_phrase(sf_dir: str, k: int = 10):
    """Phrase search over an INCREMENTALLY-built POSITIONAL index
    (initial build with positions -> update_index -> compact_index over
    the same corpus split as pages_update_search); oracle = the stored
    phrase golden, certifying the pos_blob sidecar survives the update
    + compaction path with ranking intact (the compaction-safety pytest
    promoted to a driver row)."""
    import shutil

    from myaku_ray.corpus import gen_blogs_table
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import phrase_query_set
    from myaku_ray.pipelines.build import build_index
    from myaku_ray.pipelines.update import compact_index, update_index

    import pyarrow.parquet as _pq

    root = os.path.join(
        CACHE_ROOT, f"pagesupdpos_{PAGES_N}_{UPDATE_SPLIT}"
    )
    idx = os.path.join(root, "index")
    marker = os.path.join(root, "_FLOW_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        base_d = os.path.join(root, "base")
        delta_d = os.path.join(root, "delta")
        os.makedirs(base_d)
        os.makedirs(delta_d)
        full = _pq.read_table(_pages_dir())
        _pq.write_table(
            full.slice(0, UPDATE_SPLIT),
            os.path.join(base_d, "pages.parquet"),
        )
        _pq.write_table(
            full.slice(UPDATE_SPLIT),
            os.path.join(delta_d, "pages.parquet"),
        )
        blogs = gen_blogs_table()
        ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
        build_index(base_d, idx, blog_ratings=ratings, with_positions=True)
        update_index(delta_d, idx, blog_ratings=ratings)
        compact_index(idx)
        with open(marker, "w") as f:
            f.write("ok")
    s = Searcher(idx)
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for q in phrase_query_set(_pages_dir()):
        for rank, r in enumerate(s.phrase_search(q, k), start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_index_stats(sf_dir: str):
    """Global index invariants as (metric, value) rows: n_docs, distinct
    terms, total postings (Σ df) and total term occurrences (Σ ctf),
    read from the BUILT index's df stage + stats manifest — layout- and
    parallelism-independent constants that pin the build pipeline
    (dedup, tokenize, df aggregation) against the serial oracle's
    independently-computed counts (reference parity: the index-info
    record, myaku/datastore/database.py's build summary)."""
    import pyarrow.parquet as _pq

    s = _pages_searcher()
    dft = _pq.read_table(
        os.path.join(s.index_dir, "df", "df.parquet"), columns=["df", "ctf"]
    )
    vals = {
        "n_docs": int(s.stats["n_docs"]),
        "n_terms": dft.num_rows,
        "total_postings": int(
            pa.compute.sum(dft["df"]).as_py()
        ),
        "total_tf": int(pa.compute.sum(dft["ctf"]).as_py()),
    }
    return pd.DataFrame(
        {"metric": list(vals), "value": list(vals.values())}
    ).astype({"value": "int64"})


def pages_term_trend(sf_dir: str):
    """Crawl-time trend analytics: matched-doc counts per (query term,
    UTC month), computed entirely from the posting payload's warc_us
    column — no doc hydration, cost bound = one sub-list decode per
    term (the ``count`` bound).  Rows for the reference query set."""
    from myaku_ray.oracle import reference_query_set

    s = _pages_searcher()
    rows = {"query": [], "term": [], "month": [], "n_docs": []}
    for q in reference_query_set():
        for term, month, n in s.term_trend(q):
            rows["query"].append(q)
            rows["term"].append(term)
            rows["month"].append(month)
            rows["n_docs"].append(n)
    return pd.DataFrame(rows)


def pages_suggest(sf_dir: str, k: int = 5):
    """Fuzzy "did-you-mean" over the pages index vocabulary: for each
    deterministically misspelled query, the vocab terms within
    Levenshtein distance <= 2 ranked by (distance, -df, term) — served
    from the SymSpell deletion-neighborhood map the Searcher builds
    lazily over the df stage (``Searcher.suggest``).  Stored-golden
    oracled against the serial full-vocabulary scan."""
    from myaku_ray.oracle import suggest_query_set

    s = _pages_searcher()
    rows = {"query": [], "rank": [], "suggestion": [], "dist": [], "df": []}
    for q in suggest_query_set(_pages_dir()):
        for rank, (term, dist, df) in enumerate(s.suggest(q, k), start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["suggestion"].append(term)
            rows["dist"].append(dist)
            rows["df"].append(df)
    return pd.DataFrame(rows)


def _pages_pos_searcher():
    """Positional pages index (``with_positions=True``): the phrase /
    proximity serving path.  Separate index dir — the score blobs are
    byte-identical to the plain index's (pytest-asserted), only the
    pos_blob sidecar differs."""
    from myaku_ray.corpus import gen_blogs_table
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.pipelines.build import build_index

    pages = _pages_dir()
    idx = os.path.join(CACHE_ROOT, f"pagesposindex_{PAGES_N}")
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    build_index(pages, idx, blog_ratings=ratings, with_positions=True)
    return Searcher(idx)


def pages_phrase_search(sf_dir: str, k: int = 10):
    """Phrase search over the positional pages index: the query's token
    chain must appear contiguously (doc-side char offsets chaining,
    index/phrase.py) — a capability the term-only reference engine
    lacks.  Ranked rows for the corpus-derived phrase query set."""
    from myaku_ray.oracle import phrase_query_set

    s = _pages_pos_searcher()
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for q in phrase_query_set(_pages_dir()):
        for rank, r in enumerate(s.phrase_search(q, k), start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_near_search(sf_dir: str, k: int = 10):
    """Proximity search: every query term within a char window (smallest
    covering range per doc), ranked like the ordinary AND scan."""
    from myaku_ray.oracle import near_query_set

    s = _pages_pos_searcher()
    rows = {
        "query": [], "window": [], "rank": [], "doc_id": [],
        "score": [], "url": [],
    }
    for q, w in near_query_set(_pages_dir()):
        for rank, r in enumerate(s.hydrate(s.near_topk(q, w, k), q), start=1):
            rows["query"].append(q)
            rows["window"].append(w)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_fli_interp_profile(sf_dir: str):
    """Compact aggregate over the FLI interpretation payload: count of
    interpretation structs per (term pos, interp POS chain, conjugation
    type/form, sources) — the oracle-checkable digest of
    ``pages_fli_interps``'s nested list<struct> columns (any change to
    interp emission shifts these counts).  The flatten runs over the
    FILTERED payload slice (result-sized, not corpus-sized); the heavy
    stage is the same FliStage actor pool."""
    ds = _pages_fli_typed(sf_dir)

    def profile(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        terms: dict = {}
        tfsum: Counter = Counter()
        for term_pos, term, tf, interps in zip(
            batch["pos"].to_pylist(),
            batch["term"].to_pylist(),
            batch["tf"].to_pylist(),
            batch["possible_interps"].to_pylist(),
        ):
            for it in interps:
                key = (
                    term_pos,
                    "/".join(it["parts_of_speech"] or []),
                    it["conjugated_type"] or "",
                    it["conjugated_form"] or "",
                    "+".join(it["interp_sources"] or []),
                )
                c[key] += 1
                tfsum[key] += int(tf)
                terms.setdefault(key, set()).add(term)
        ks = sorted(c)
        return pa.table(
            {
                "term_pos": pa.array([k[0] for k in ks], pa.string()),
                "interp_pos": pa.array([k[1] for k in ks], pa.string()),
                "conj_type": pa.array([k[2] for k in ks], pa.string()),
                "conj_form": pa.array([k[3] for k in ks], pa.string()),
                "sources": pa.array([k[4] for k in ks], pa.string()),
                "n": pa.array([c[k] for k in ks], pa.int64()),
                "sum_tf": pa.array([tfsum[k] for k in ks], pa.int64()),
                # distinct terms can't partial-aggregate as a count —
                # ship the per-batch term SETS and merge in map_groups
                "term_set": pa.array(
                    [sorted(terms[k]) for k in ks], pa.list_(pa.string())
                ),
            }
        )

    def merge(g) -> "pd.DataFrame":
        import pandas as _pd

        uniq = set()
        for ts in g["term_set"]:
            uniq.update(ts)
        return _pd.DataFrame(
            {
                "term_pos": [g["term_pos"].iloc[0]],
                "interp_pos": [g["interp_pos"].iloc[0]],
                "conj_type": [g["conj_type"].iloc[0]],
                "conj_form": [g["conj_form"].iloc[0]],
                "sources": [g["sources"].iloc[0]],
                "n": [int(g["n"].sum())],
                "sum_tf": [int(g["sum_tf"].sum())],
                "n_terms": [len(uniq)],
            }
        )

    return (
        ds.map_batches(profile, batch_format="pyarrow")
        .groupby(["term_pos", "interp_pos", "conj_type", "conj_form", "sources"])
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 lexical top-k fused with embedding-ANN top-k by
# reciprocal-rank fusion (RRF, Cormack et al. 2009) — the standard
# modern search composition.  Query i pairs TEXT_QUERY_TERMS[i] with
# query vector vec_id=i; both legs are the already-oracled operators,
# and the fusion is exact rational arithmetic (sum of at most two
# 1/(60+rank) doubles is order-independent), so the whole composite is
# SQL-checkable end to end.
# ---------------------------------------------------------------------------

RRF_K = 60
HYBRID_TOPK = 10


def hybrid_search_rrf(sf_dir: str, k: int = HYBRID_TOPK):
    import numpy as np
    import pandas as pd

    from myaku_ray.functions.ann import N_QUERIES, ann_cosine_topk

    n_q = min(N_QUERIES, len(TEXT_QUERY_TERMS))
    bm = bm25_topk_docs(sf_dir).to_pandas()
    ann = ann_cosine_topk(sf_dir)
    ann = ann if isinstance(ann, pd.DataFrame) else ann.to_pandas()

    term_of = {TEXT_QUERY_TERMS[i]: i for i in range(n_q)}
    b = bm[bm["term"].isin(term_of)].copy()
    b["query_id"] = b["term"].map(term_of)
    contrib = pd.concat(
        [
            pd.DataFrame(
                {
                    "query_id": b["query_id"].astype(np.int64),
                    "doc_id": b["doc_id"].astype(np.int64),
                    "c": 1.0 / (RRF_K + b["rank"].astype(np.int64)),
                }
            ),
            pd.DataFrame(
                {
                    "query_id": ann.loc[
                        ann["query_vec_id"] < n_q, "query_vec_id"
                    ].astype(np.int64),
                    "doc_id": ann.loc[
                        ann["query_vec_id"] < n_q, "neighbor_vec_id"
                    ].astype(np.int64),
                    "c": 1.0
                    / (
                        RRF_K
                        + ann.loc[ann["query_vec_id"] < n_q, "rank"].astype(
                            np.int64
                        )
                    ),
                }
            ),
        ],
        ignore_index=True,
    )
    f = (
        contrib.groupby(["query_id", "doc_id"], as_index=False)["c"]
        .sum()
        .rename(columns={"c": "rrf"})
    )
    f["rrf_r"] = np.round(f["rrf"], 9)
    f = f.sort_values(
        ["query_id", "rrf_r", "doc_id"], ascending=[True, False, True]
    )
    f["rank"] = f.groupby("query_id").cumcount() + 1
    out = f[f["rank"] <= k][["query_id", "doc_id", "rrf_r", "rank"]]
    return out.reset_index(drop=True)


def hybrid_search_rrf_sql(k: int = HYBRID_TOPK) -> str:
    from myaku_ray.functions.ann import ANN_COSINE_TOPK_SQL, N_QUERIES

    n_q = min(N_QUERIES, len(TEXT_QUERY_TERMS))
    mapping = ", ".join(
        f"({i}::BIGINT, '{TEXT_QUERY_TERMS[i]}')" for i in range(n_q)
    )
    return f"""
WITH b AS ({bm25_topk_sql()}),
a AS ({ANN_COSINE_TOPK_SQL}),
m(query_id, term) AS (SELECT * FROM (VALUES {mapping})),
u AS (
  SELECT m.query_id, b.doc_id, 1.0::DOUBLE / ({RRF_K} + b.rank) AS c
  FROM b JOIN m ON b.term = m.term
  UNION ALL
  SELECT a.query_vec_id, a.neighbor_vec_id, 1.0::DOUBLE / ({RRF_K} + a.rank)
  FROM a WHERE a.query_vec_id < {n_q}
),
f AS (
  SELECT query_id, doc_id, round(sum(c), 9) AS rrf_r
  FROM u GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rrf_r,
  CAST(row_number() OVER (PARTITION BY query_id
       ORDER BY rrf_r DESC, doc_id) AS BIGINT) AS rank
FROM f
QUALIFY rank <= {k}
"""


def pages_more_like_this(sf_dir: str, k: int = 10):
    """Index-native related-document search: for each seed doc (the
    content-stable URL-ordered seed set), tokenize its stored text, pick
    the most salient terms by tf x idf, and rank other docs with the
    standard disjunctive engine (Searcher.more_like_this) — the
    "related articles" feature a serving stack builds on the same index
    it searches.  Stored golden = serial seed-term selection + ranker
    (oracle.oracle_more_like_this; the term-selection kernel
    scoring.select_mlt_terms is shared verbatim)."""
    from myaku_ray.oracle import mlt_seed_set

    s = _pages_searcher()
    rows = {"seed_doc_id": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for seed in mlt_seed_set(_pages_dir()):
        results = s.more_like_this(seed, k)
        urls: dict[int, str] = {}
        if results:
            docs = s._read_docs_by_id([r.doc_id for r in results])
            best: dict[int, int] = {}
            for d, u, w in zip(
                docs["doc_id"], docs["url"], docs["warc_ts"].cast("int64")
            ):
                did, wv = d.as_py(), w.as_py()
                if did not in best or wv > best[did]:
                    best[did] = wv
                    urls[did] = u.as_py()
        for rank, r in enumerate(results, start=1):
            rows["seed_doc_id"].append(seed)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(urls.get(r.doc_id))
    return pd.DataFrame(rows)


def pages_search_prf(sf_dir: str, k: int = 10):
    """Pseudo-relevance-feedback search (Rocchio expansion) over the
    pages index: first-pass top-R docs feed summed-tf x idf expansion
    terms (shared kernel scoring.select_prf_terms), then ONE disjunctive
    query over original + expansion terms (Searcher.topk_prf).  Cost
    per query is corpus-size-independent: one ordinary query + R point
    hydrations + one (|q|+E)-term query.  Stored golden = the serial
    two-pass oracle (oracle.oracle_prf_topk)."""
    from myaku_ray.oracle import reference_query_set

    s = _pages_searcher()
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for q in reference_query_set():
        results = s.topk_prf(q, k)
        urls: dict[int, str] = {}
        if results:
            docs = s._read_docs_by_id([r.doc_id for r in results])
            best: dict[int, int] = {}
            for d, u, w in zip(
                docs["doc_id"], docs["url"], docs["warc_ts"].cast("int64")
            ):
                did, wv = d.as_py(), w.as_py()
                if did not in best or wv > best[did]:
                    best[did] = wv
                    urls[did] = u.as_py()
        for rank, r in enumerate(results, start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(urls.get(r.doc_id))
    return pd.DataFrame(rows)


def pages_significant_terms(sf_dir: str):
    """Significant-terms aggregation per reference query: terms
    overrepresented in the query's top-ranked doc sample vs the whole
    corpus (foreground count vs df), ranked by the exact-Fraction lift
    kernel scoring.rank_significant_terms — the "what is this result
    set about" serving aggregation.  Foreground is the top-SIG_FB_DOCS
    sample, so the cost is bounded at any corpus size even for
    particle queries whose matched set is the corpus.  Stored golden =
    the serial oracle (oracle.oracle_significant_terms)."""
    from myaku_ray.oracle import reference_query_set

    s = _pages_searcher()
    rows = {"query": [], "rank": [], "term": [], "fg": [], "df": []}
    for q in reference_query_set():
        for rank, (term, fg, df) in enumerate(
            s.significant_terms(q), start=1
        ):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["term"].append(term)
            rows["fg"].append(fg)
            rows["df"].append(df)
    return pd.DataFrame(rows)


def _pages_pruned_searcher():
    """Derive (idempotently) the impact-pruned serving tier from the
    cached pages index and return a Searcher over it — a pruned
    directory is a fully valid index layout, so serving needs no
    special mode."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.pipelines.prune import prune_index

    _pages_searcher()  # ensure the source index exists
    idx = os.path.join(CACHE_ROOT, f"pagesindex_{PAGES_N}")
    pruned = idx + "_pruned"
    prune_index(idx, pruned)
    return Searcher(pruned)


def pages_pruned_search(sf_dir: str, k: int = 10):
    """Reference query set served from the impact-pruned tier
    (pipelines/prune.py: per-term top-P postings by the engine rank
    key).  Single-term queries with k <= P are EXACT by construction;
    multi-term disjunctive queries are the measured approximation —
    pages_pruned_recall quantifies it against the exact golden.
    Stored golden = serial per-term prune + rank
    (oracle.oracle_pruned_topk, same lexsort key)."""
    from myaku_ray.oracle import reference_query_set

    s = _pages_pruned_searcher()
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for q in reference_query_set():
        for rank, r in enumerate(s.search(q, k), start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    return pd.DataFrame(rows)


def pages_pruned_recall(sf_dir: str, k: int = 10):
    """Overlap@k of the pruned tier vs the exact engine per reference
    query — the recall price of serving from per-term top-P postings.
    Oracle = TRUE SQL composed from the two stored rankings (join the
    pruned golden against the exact golden on (query, doc_id)).

    Queries whose EXACT top-k is empty are skipped: overlap@k is
    undefined over an empty exact set, and the SQL side (grouped off
    the exact golden's rows) naturally emits no row for them — both
    sides agree by construction (round-4 ADVICE item; a pytest asserts
    the reference set currently has no such query, so this is contract
    hardening, not a behavior change)."""
    from myaku_ray.oracle import reference_query_set

    exact = _pages_searcher()
    pruned = _pages_pruned_searcher()
    rows = {"query": [], "n_overlap": []}
    for q in reference_query_set():
        e = {r.doc_id for r in exact.topk(q, k)}
        if not e:
            continue
        p = {r.doc_id for r in pruned.topk(q, k)}
        rows["query"].append(q)
        rows["n_overlap"].append(len(e & p))
    return pd.DataFrame(rows)


def pages_pruned_recall_sql() -> str:
    from myaku_ray.functions.pages_golden import (
        PAGES_PRUNED_SEARCH_SQL, PAGES_SEARCH_TOPK_SQL,
    )

    return f"""
WITH p AS ({PAGES_PRUNED_SEARCH_SQL}),
e AS ({PAGES_SEARCH_TOPK_SQL})
SELECT e.query, count(p.doc_id) AS n_overlap
FROM e LEFT JOIN p ON p.query = e.query AND p.doc_id = e.doc_id
GROUP BY e.query
"""


def pages_term_sharded_search(sf_dir: str, k: int = 10, n_shards: int = 3):
    """Reference query set served through the TERM-routed tier
    (index/term_sharded.py): query terms fan out only to their owning
    shard actors, which return decoded posting arrays; the coordinator
    runs the ordinary ranking kernel.  Must be BIT-IDENTICAL to the
    monolithic ranking, so it shares pages_search_topk's stored golden
    — the same contract the doc-routed federation meets from the other
    sharding axis."""
    from myaku_ray.index.term_sharded import TermShardedSearcher
    from myaku_ray.oracle import reference_query_set

    _pages_searcher()  # ensure the index exists
    idx = os.path.join(CACHE_ROOT, f"pagesindex_{PAGES_N}")
    ts = TermShardedSearcher(idx, n_shards=n_shards)
    try:
        rows = {
            "query": [], "rank": [], "doc_id": [], "score": [], "url": [],
        }
        for q in reference_query_set():
            for rank, r in enumerate(ts.search(q, k), start=1):
                rows["query"].append(q)
                rows["rank"].append(rank)
                rows["doc_id"].append(r.doc_id)
                rows["score"].append(round(r.score, 5))
                rows["url"].append(r.url)
        return pd.DataFrame(rows)
    finally:
        ts.shutdown()


def pages_tiered_search(sf_dir: str, k: int = 10):
    """Reference query set through the tiered router
    (index/tiered.py): single-term queries with k <= P answer from the
    pruned head tier (exact by the rank-key-prefix property),
    everything else from the full index — bit-identical to the
    monolithic ranking on every query, so it shares the exact search
    golden."""
    from myaku_ray.index.tiered import TieredSearcher
    from myaku_ray.oracle import reference_query_set

    _pages_pruned_searcher()  # ensure both tiers exist
    idx = os.path.join(CACHE_ROOT, f"pagesindex_{PAGES_N}")
    ts = TieredSearcher(idx, idx + "_pruned")
    rows = {"query": [], "rank": [], "doc_id": [], "score": [], "url": []}
    for q in reference_query_set():
        for rank, r in enumerate(ts.search(q, k), start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["doc_id"].append(r.doc_id)
            rows["score"].append(round(r.score, 5))
            rows["url"].append(r.url)
    assert ts.served_pruned > 0  # the head tier actually serves traffic
    return pd.DataFrame(rows)
