"""Positional index + phrase/proximity search (index/positions.py,
index/phrase.py): codec round-trip, tokenizer positional-kernel parity,
score-path byte-identity, and engine-vs-oracle rank identity."""

from __future__ import annotations

import numpy as np
import pytest

from myaku_ray.corpus import gen_blogs_table, write_pages_parquet

N_PAGES = 200


@pytest.fixture(scope="module")
def pos_built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("phrase")
    pages = str(root / "pages")
    write_pages_parquet(pages, N_PAGES)
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    from myaku_ray.pipelines.build import build_index

    pos_idx = str(root / "posidx")
    plain_idx = str(root / "plainidx")
    build_index(pages, pos_idx, blog_ratings=ratings, with_positions=True)
    build_index(pages, plain_idx, blog_ratings=ratings)
    return pages, pos_idx, plain_idx, ratings


def test_position_codec_roundtrip():
    from myaku_ray.index.positions import (
        encode_pos_blob,
        encode_position_record,
        encode_position_records_from_pairs,
        gather_positions,
    )

    rng = np.random.default_rng(11)
    truth, recs = [], []
    for _ in range(300):
        c = int(rng.integers(0, 9))
        starts = (
            np.sort(rng.choice(65536, size=c, replace=False))
            if c
            else np.empty(0, np.int64)
        ).astype(np.int64)
        lens = rng.integers(1, 40, size=c).astype(np.int64)
        truth.append((starts, lens))
        recs.append(encode_position_record(starts, lens))
    pairs = [list(zip(s_.tolist(), l_.tolist())) for s_, l_ in truth]
    assert recs == encode_position_records_from_pairs(pairs)
    blob = encode_pos_blob(recs)
    wanted = np.sort(rng.choice(300, size=77, replace=False))
    counts, starts, lens = gather_positions(blob, wanted)
    off = 0
    for j, w in enumerate(wanted):
        ts, tl = truth[w]
        assert counts[j] == len(ts)
        assert (starts[off : off + len(ts)] == ts).all()
        assert (lens[off : off + len(ts)] == tl).all()
        off += len(ts)


def test_find_term_positions_parity(pos_built):
    """Fast positional kernel == find_lexical_items positions, and
    len(positions) == find_term_tfs tf, on every real doc."""
    import pyarrow.parquet as pq

    from myaku_ray.html_extract import extract_page
    from myaku_ray.tokenizer import get_tokenizer

    pages = pos_built[0]
    tok = get_tokenizer()
    t = pq.read_table(pages, columns=["url", "html", "lang"])
    checked = 0
    for i in range(t.num_rows):
        if t["lang"][i].as_py() != "ja":
            continue
        er = extract_page(t["html"][i].as_py(), t["url"][i].as_py())
        if not er.ok:
            continue
        fast = tok.find_term_positions(er.text)
        slow = {
            it["term"]: [tuple(p) for p in it["positions"]]
            for it in tok.find_lexical_items(er.text)
        }
        assert fast == slow
        assert {k: len(v) for k, v in fast.items()} == tok.find_term_tfs(
            er.text
        )
        checked += 1
    assert checked > 50


def test_score_path_byte_identical(pos_built):
    """The positional build's score blobs are byte-identical to the
    plain build's — positions cannot perturb ranking."""
    import os

    import pyarrow.dataset as pads

    _, pos_idx, plain_idx, _ = pos_built

    def blob_map(root, cols):
        t = pads.dataset(
            os.path.join(root, "segments"), format="parquet"
        ).to_table(columns=cols)
        return {
            (a, b): c
            for a, b, c in zip(
                t["term"].to_pylist(), t["salt"].to_pylist(),
                t["blob"].to_pylist(),
            )
        }

    mp = blob_map(pos_idx, ["term", "salt", "blob"])
    mn = blob_map(plain_idx, ["term", "salt", "blob"])
    assert mp == mn


def test_phrase_and_near_rank_identity(pos_built):
    """Engine phrase/proximity == serial oracle (set-chase per doc) on
    the derived query set: doc ids, scores (5dp), warc order."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import (
        _doc_positions,
        build_oracle_index,
        near_query_set,
        oracle_near_topk,
        oracle_phrase_topk,
        phrase_query_set,
    )

    pages, pos_idx, _, ratings = pos_built
    oi = build_oracle_index(pages, blog_ratings=ratings)
    pos = _doc_positions(oi)
    s = Searcher(pos_idx)

    phrases = phrase_query_set(pages)
    assert len(phrases) >= 4
    n_hits = 0
    for p in phrases:
        got = [(r.doc_id, round(r.score, 5), r.warc_us) for r in s.phrase_topk(p, 10)]
        want = [
            (d, round(sc, 5), w)
            for (d, sc, w) in oracle_phrase_topk(oi, p, 10, positions=pos)
        ]
        assert got == want, p
        n_hits += len(got)
    assert n_hits > 0  # the derived set must actually exercise matches
    assert s.phrase_topk("ぬりぬりぺぺぺ", 10) == []

    for q, w in near_query_set(pages):
        got = [(r.doc_id, round(r.score, 5), r.warc_us) for r in s.near_topk(q, w, 10)]
        want = [
            (d, round(sc, 5), ww)
            for (d, sc, ww) in oracle_near_topk(oi, q, w, 10, positions=pos)
        ]
        assert got == want, (q, w)


def test_phrase_count_and_gap_semantics(pos_built):
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import phrase_query_set

    pages, pos_idx, _, _ = pos_built
    s = Searcher(pos_idx)
    phrases = phrase_query_set(pages)
    # counts agree with the match set the topk path produced
    from myaku_ray.index.phrase import phrase_match_docs

    for p in phrases:
        assert s.phrase_count(p) == len(phrase_match_docs(s, p))
    # a query containing whitespace between tokens can never match
    gapped = [p for p in phrases if "\n" in p or " " in p]
    for p in gapped:
        assert s.phrase_count(p) == 0


def test_plain_index_rejects_phrase(pos_built):
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import phrase_query_set

    pages, _, plain_idx, _ = pos_built
    s = Searcher(plain_idx)
    p = phrase_query_set(pages)[0]
    with pytest.raises(ValueError, match="without positions"):
        s.phrase_topk(p, 10)


def test_positional_index_survives_update(ray_session, tmp_path_factory):
    """Incremental update of a positional index keeps the sidecar: delta
    postings are tokenized WITH positions (update.py reads
    stats.with_positions), and phrase results over the refreshed index
    match the serial oracle on the effective corpus."""
    from myaku_ray.corpus_update import gen_update_batch, write_union_parquet, write_update_parquet
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import (
        _doc_positions, build_oracle_index, oracle_phrase_topk,
        phrase_query_set,
    )
    from myaku_ray.pipelines.build import build_index
    from myaku_ray.pipelines.update import update_index

    root = tmp_path_factory.mktemp("phrase_upd")
    base = str(root / "base")
    n_base = 120
    write_pages_parquet(base, n_base, use_ray=False)
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    idx = str(root / "idx")
    build_index(base, idx, blog_ratings=ratings, tokenize_concurrency=2,
                with_positions=True)
    batch = gen_update_batch(n_base, n_new=30)
    upd = str(root / "upd")
    write_update_parquet(upd, batch)
    m = update_index(upd, idx, blog_ratings=ratings, tokenize_concurrency=2)
    assert m["refreshed"]

    union = str(root / "union.parquet")
    write_union_parquet(union, base, batch)
    oi = build_oracle_index(union, blog_ratings=ratings)
    pos = _doc_positions(oi)

    def assert_parity(searcher):
        n_hits = 0
        for p in phrase_query_set(union):
            got = [
                (r.doc_id, round(r.score, 5))
                for r in searcher.phrase_topk(p, 10)
            ]
            want = [
                (d, round(sc, 5))
                for (d, sc, _w) in oracle_phrase_topk(oi, p, 10, positions=pos)
            ]
            assert got == want, p
            n_hits += len(got)
        assert n_hits > 0

    assert_parity(Searcher(idx))

    # compaction must keep the positional sidecar: compact, then refresh
    # re-encodes from the compacted postings — phrase parity must hold
    from myaku_ray.pipelines.update import compact_index, refresh_index

    compact_index(idx)
    refresh_index(idx)
    assert_parity(Searcher(idx))


def test_stream_path_matches_array_path(pos_built, monkeypatch):
    """Forcing the bounded-memory streaming AND (stream limit 0, tiny
    chunks) must reproduce the array path's phrase/near/count results
    exactly on the real corpus — every query, every rank position."""
    from myaku_ray.index import phrase as ph
    from myaku_ray.index.phrase import phrase_match_docs
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import near_query_set, phrase_query_set

    pages, pos_idx, _, _ = pos_built
    s_arr = Searcher(pos_idx)
    phrases = phrase_query_set(pages)
    nears = near_query_set(pages)
    want_phrase = {
        p: (
            [(r.doc_id, r.score, r.warc_us) for r in s_arr.phrase_topk(p, 10)],
            s_arr.phrase_count(p),
            phrase_match_docs(s_arr, p).tolist(),
        )
        for p in phrases
    }
    want_near = {
        (q, w): [
            (r.doc_id, r.score, r.warc_us) for r in s_arr.near_topk(q, w, 10)
        ]
        for q, w in nears
    }
    assert any(v[1] > 0 for v in want_phrase.values())

    monkeypatch.setattr(ph, "_PHRASE_STREAM_LIMIT", 0)
    monkeypatch.setattr(ph, "_STREAM_CHUNK_BLOCKS", 2)
    monkeypatch.setattr(ph, "_STREAM_RUN_CAP", 3)
    s_str = Searcher(pos_idx)
    for p, (topk, cnt, ids) in want_phrase.items():
        got = [(r.doc_id, r.score, r.warc_us) for r in s_str.phrase_topk(p, 10)]
        assert got == topk, p
        if cnt:  # stream path actually ran
            assert s_str._phrase_last_stats["path"] == "stream"
        assert s_str.phrase_count(p) == cnt, p
        assert phrase_match_docs(s_str, p).tolist() == ids, p
    for (q, w), topk in want_near.items():
        got = [(r.doc_id, r.score, r.warc_us) for r in s_str.near_topk(q, w, 10)]
        assert got == topk, (q, w)


def test_preview_from_positions_byte_identical(pos_built):
    """Hydrated search over the positional index must produce previews
    and matched_terms BYTE-IDENTICAL to the plain index's re-tokenize
    path — while never tokenizing a result doc (only the query)."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import phrase_query_set

    pages, pos_idx, plain_idx, _ = pos_built
    s_pos = Searcher(pos_idx)
    s_plain = Searcher(plain_idx)
    queries = ["日本", "今日", "東京"] + [
        p for p in phrase_query_set(pages)[:3]
    ]
    # spy: count doc-text tokenizations during the positional hydrate
    calls = []
    orig = s_pos._tok.find_lexical_items

    class SpyTok:
        def __getattr__(self, name):
            return getattr(s_pos.__dict__["_tok_real"], name)

        def find_lexical_items(self, text):
            calls.append(len(text))
            return orig(text)

    s_pos.__dict__["_tok_real"] = s_pos._tok
    checked = 0
    for q in queries:
        a = s_plain.search(q, 10)
        calls.clear()
        s_pos._tok = SpyTok()
        try:
            b = s_pos.search(q, 10)
        finally:
            s_pos._tok = s_pos.__dict__["_tok_real"]
        assert [
            (r.doc_id, r.score, r.warc_us, r.url, r.title,
             r.matched_terms, r.preview)
            for r in a
        ] == [
            (r.doc_id, r.score, r.warc_us, r.url, r.title,
             r.matched_terms, r.preview)
            for r in b
        ], q
        # only the query string (tiny) may have been tokenized — never a
        # result doc body
        assert all(n <= s_pos.MAX_QUERY_LEN for n in calls), (q, calls)
        checked += len(b)
    assert checked > 0


def test_phrase_is_subset_of_and_search(pos_built):
    """Every phrase match must also be an AND match of its terms, with
    the same score the ordinary ranked scan assigns."""
    from myaku_ray.index.phrase import phrase_chain, phrase_match_docs
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import phrase_query_set

    pages, pos_idx, _, _ = pos_built
    s = Searcher(pos_idx)
    for p in phrase_query_set(pages):
        chain = phrase_chain(s, p)
        if not chain:
            continue
        matched = set(phrase_match_docs(s, p).tolist())
        if not matched:
            continue
        # docs containing every chain term
        and_docs = None
        for t in set(chain):
            it = s.term_iterator(t)
            ids = set(it.ids.tolist()) if it is not None else set()
            and_docs = ids if and_docs is None else (and_docs & ids)
        assert matched <= and_docs


def test_phrase_edge_contracts(pos_built):
    """Cheap invariants: empty query, k truncation, repeated-token
    chains, and term_trend consistency on the positional index."""
    from myaku_ray.index.phrase import phrase_chain
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import phrase_query_set

    pages, pos_idx, _, _ = pos_built
    s = Searcher(pos_idx)
    assert s.phrase_topk("", 10) == []
    assert s.phrase_count("") == 0
    q = next(p for p in phrase_query_set(pages) if s.phrase_count(p) > 1)
    full = s.phrase_topk(q, 10)
    assert s.phrase_topk(q, 1) == full[:1]
    # repeated-token chain: derive a real adjacent equal-base-form pair
    # from the corpus (note "のの" itself is a dictionary surface, so
    # longest-match makes it a SINGLE token — querying it must still
    # agree with the oracle, exercised below either way)
    from myaku_ray.oracle import (
        _doc_positions, build_oracle_index, oracle_phrase_topk,
    )

    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    oi = build_oracle_index(pages, blog_ratings=ratings)
    dpos = _doc_positions(oi)
    repeated = None
    for meta in oi.docs.values():
        toks = s._tok.tokenize(meta["text"])
        for i in range(len(toks) - 1):
            if (
                toks[i].base_form == toks[i + 1].base_form
                and toks[i + 1].start == toks[i].start + toks[i].length
            ):
                cand = meta["text"][
                    toks[i].start : toks[i + 1].start + toks[i + 1].length
                ]
                if len(phrase_chain(s, cand) or []) == 2:
                    repeated = cand
                    break
        if repeated:
            break
    for probe in (["のの"] + ([repeated] if repeated else [])):
        got = [(r.doc_id, round(r.score, 5)) for r in s.phrase_topk(probe, 10)]
        want = [
            (d, round(sc, 5))
            for (d, sc, _w) in oracle_phrase_topk(oi, probe, 10, positions=dpos)
        ]
        assert got == want, probe
    if repeated:  # the doc the pair came from must match
        assert s.phrase_count(repeated) >= 1
