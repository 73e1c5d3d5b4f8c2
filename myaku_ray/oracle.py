"""Serial single-process oracle: the golden reference for the Ray pipeline.

Mirrors the reference's test strategy (SURVEY.md §5): the distributed
pipeline must match this oracle EXACTLY — byte-identical extracted text per
url, identical posting sets, and rank-identical top-k (docIDs AND scores)
on the query set.  The oracle shares the pure functions (extraction,
tokenization, scoring) with the pipeline; what it does differently is the
execution: one process, one thread, plain dicts — no Ray.

Score accumulation over query terms is done in sorted-term order in
float64 over float32-quantized contributions, matching the WAND engine's
deterministic summation exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow.parquet as pq

from myaku_ray.corpus import FIXED_NOW, MAX_ARTICLE_LEN, blog_url_of, order_nums_of
from myaku_ray.html_extract import extract_page
from myaku_ray.normalize import alnum_count, doc_id_for_url, normalize_char_width, text_hash
from myaku_ray.scoring import article_quality_score, posting_score
from myaku_ray.tokenizer import get_tokenizer


@dataclass
class OracleIndex:
    n_docs: int
    avgdl: float
    df: dict            # term -> document frequency
    postings: dict      # term -> list[(doc_id, tf)]
    docs: dict          # doc_id -> {"doclen", "quality", "warc_us", "url", "text"}


def build_oracle_index(
    pages_parquet: str,
    *,
    blog_ratings: dict[str, float] | None = None,
    fixed_now=FIXED_NOW,
) -> OracleIndex:
    """Serial index build over the same pages parquet the pipeline reads."""
    blog_ratings = blog_ratings or {}
    import pyarrow as pa

    tok = get_tokenizer()
    table = pq.read_table(pages_parquet)
    # us-since-epoch ints, exactly as the pipeline's cast (naive-UTC, no tz)
    warc_us_col = table["warc_ts"].cast(pa.int64()).to_pylist()

    # pass 1: extract + filter + doc rows
    raw_docs = []
    for i in range(table.num_rows):
        url = table["url"][i].as_py()
        lang = table["lang"][i].as_py()
        if lang != "ja":
            continue
        html = table["html"][i].as_py()
        warc = table["warc_ts"][i].as_py()
        er = extract_page(html, url)
        if not er.ok or len(er.text) > MAX_ARTICLE_LEN:
            continue
        alnum = alnum_count(er.text)
        border, sorder = order_nums_of(url)
        burl = blog_url_of(url)
        quality = article_quality_score(
            alnum=alnum,
            age_days=(fixed_now - warc).days,
            has_video=er.has_video,
            source=er.source,
            blog_rating=blog_ratings.get(burl) if burl else None,
            blog_article_order=border,
            blog_section_order=sorder,
        )
        raw_docs.append(
            {
                "doc_id": doc_id_for_url(url),
                "url": url,
                "text": er.text,
                "hash": text_hash(er.text),
                "quality": quality,
                "warc_us": warc_us_col[i],
                "source": er.source,
                "title": er.title,
            }
        )

    # exact dedup: winner = min doc_id per content hash (A6)
    best: dict = {}
    for d in raw_docs:
        cur = best.get(d["hash"])
        if cur is None or d["doc_id"] < cur["doc_id"]:
            best[d["hash"]] = d
    winners = sorted(best.values(), key=lambda d: d["doc_id"])

    # tokenize winners -> postings
    postings: dict = {}
    docs: dict = {}
    total_tokens = 0
    for d in winners:
        items = tok.find_lexical_items(d["text"])
        doclen = sum(it["tf"] for it in items)
        total_tokens += doclen
        docs[d["doc_id"]] = {
            "doclen": doclen,
            "quality": d["quality"],
            "warc_us": d["warc_us"],
            "url": d["url"],
            "text": d["text"],
            "source": d["source"],
            "title": d["title"],
        }
        for it in items:
            postings.setdefault(it["term"], []).append((d["doc_id"], it["tf"]))

    n_docs = len(winners)
    avgdl = total_tokens / max(n_docs, 1)
    df = {t: len(pl) for t, pl in postings.items()}
    return OracleIndex(n_docs=n_docs, avgdl=avgdl, df=df, postings=postings, docs=docs)


def analyze_query(query_str: str) -> list[str]:
    tok = get_tokenizer()
    q = normalize_char_width(query_str)
    items = tok.find_lexical_items(q)
    seen, out = set(), []
    for it in sorted(items, key=lambda x: x["positions"][0]):
        if it["term"] not in seen:
            seen.add(it["term"])
            out.append(it["term"])
    return out


def oracle_topk(
    index: OracleIndex, query_str: str, k: int = 10, query_type: str = "exact"
):
    """Exact serial top-k: (doc_id, score, warc_us) desc by rank key.

    Alt-form query types (QueryType semantics,
    myaku/datastore/__init__.py:26-68): each query term expands to its
    definite/possible alternate-spelling group and a doc's contribution
    for that group is the MAX over member-term contributions, keyed by
    the original query term (same group keys and summation order as the
    engine's group iterators)."""
    from myaku_ray.lexicon import expand_alt_forms

    terms = analyze_query(query_str)
    per_doc: dict[int, dict[str, float]] = {}
    for t in terms:
        for m in expand_alt_forms(t, query_type):
            pl = index.postings.get(m)
            if not pl:
                continue
            dfv = index.df[m]
            for doc_id, tf in pl:
                meta = index.docs[doc_id]
                contrib = posting_score(
                    tf, meta["doclen"], meta["quality"], dfv, index.n_docs,
                    index.avgdl,
                )
                cur = per_doc.setdefault(doc_id, {})
                if t not in cur or contrib > cur[t]:
                    cur[t] = contrib
    scored = []
    for doc_id, contribs in per_doc.items():
        score = 0.0
        for t in sorted(contribs):
            score += contribs[t]
        scored.append((score, index.docs[doc_id]["warc_us"], doc_id))
    scored.sort(reverse=True)
    return [(d, s, w) for (s, w, d) in scored[:k]]


def oracle_topk_in_range(
    index: OracleIndex,
    query_str: str,
    t_lo: int,
    t_hi: int,
    k: int = 10,
    query_type: str = "exact",
):
    """Serial date-filtered top-k: oracle_topk's exact ranking restricted
    to docs with t_lo <= warc_us <= t_hi (filter semantics — scores of
    the survivors are identical to the unfiltered ranking)."""
    full = oracle_topk(index, query_str, k=len(index.docs), query_type=query_type)
    out = [(d, s, w) for (d, s, w) in full if t_lo <= w <= t_hi]
    return out[:k]


def date_range_query_set(pages_parquet: str) -> list[tuple[str, int, int]]:
    """Deterministic (query, t_lo, t_hi) triples for the date-filtered
    search gate, derived from the corpus' own warc_ts span: for each
    reference query, the early half, the late half, and the middle third
    of [min(warc_us), max(warc_us)].  Pure function of the fixed corpus —
    both the engine op and the stored-golden generator call it."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    col = pq_mod.read_table(pages_parquet, columns=["warc_ts"])["warc_ts"]
    us = col.cast(pa.int64()).to_pylist()
    mn, mx = min(us), max(us)
    mid = (mn + mx) // 2
    third = (mx - mn) // 3
    out = []
    for q in reference_query_set():
        out.append((q, mn, mid))
        out.append((q, mid + 1, mx))
        out.append((q, mn + third, mx - third))
    return out


def _oracle_phrase_chain(query_str: str) -> list[str] | None:
    """Query -> contiguous base-form chain (oracle copy of the engine's
    contract: symbol tokens or gaps mean no chain)."""
    from myaku_ray.tokenizer import _SYMBOL_POS

    tok = get_tokenizer()
    toks = tok.tokenize(normalize_char_width(query_str))
    if not toks:
        return None
    chain, end = [], None
    for t in toks:
        if t.pos == _SYMBOL_POS:
            return None
        if end is not None and t.start != end:
            return None
        chain.append(t.base_form)
        end = t.start + t.length
    return chain


def _doc_positions(index: OracleIndex) -> dict:
    """doc_id -> {term: [(start, len), ...]} via the reference FLI path
    (find_lexical_items), computed once per oracle index."""
    tok = get_tokenizer()
    out = {}
    for doc_id, meta in index.docs.items():
        items = tok.find_lexical_items(meta["text"])
        out[doc_id] = {it["term"]: it["positions"] for it in items}
    return out


def _score_docs(index: OracleIndex, terms: list[str], docs: list[int]):
    """(doc_id, score, warc_us) rank-ordered — ordinary multi-term BM25
    sum over the distinct terms, restricted to the given docs."""
    tf_maps = {
        t: dict(index.postings.get(t, [])) for t in set(terms)
    }
    scored = []
    for d in docs:
        meta = index.docs[d]
        score = 0.0
        for t in sorted(set(terms)):
            tf = tf_maps[t].get(d)
            if tf is None:
                continue
            score += posting_score(
                tf, meta["doclen"], meta["quality"], index.df[t],
                index.n_docs, index.avgdl,
            )
        scored.append((score, meta["warc_us"], d))
    scored.sort(reverse=True)
    return [(d, s, w) for (s, w, d) in scored]


def oracle_phrase_topk(
    index: OracleIndex, query_str: str, k: int = 10, positions: dict | None = None
):
    """Serial phrase search: set-walk the occurrence chain per doc.

    Independent mechanism from the engine (per-doc Python set chase over
    find_lexical_items positions vs vectorized searchsorted over decoded
    pos_blobs); shared semantics contract only."""
    chain = _oracle_phrase_chain(query_str)
    if not chain:
        return []
    positions = positions if positions is not None else _doc_positions(index)
    matched = []
    for doc_id, posmap in positions.items():
        occ0 = posmap.get(chain[0])
        if not occ0:
            continue
        nexts = {s + l for (s, l) in occ0}
        ok = True
        for t in chain[1:]:
            occ = posmap.get(t)
            if not occ:
                ok = False
                break
            nexts = {s + l for (s, l) in occ if s in nexts}
            if not nexts:
                ok = False
                break
        if ok:
            matched.append(doc_id)
    return _score_docs(index, chain, matched)[:k]


def oracle_near_topk(
    index: OracleIndex,
    query_str: str,
    window: int,
    k: int = 10,
    positions: dict | None = None,
):
    """Serial proximity search: smallest-range merge per doc (max start -
    min start <= window over one occurrence per distinct term)."""
    terms = analyze_query(query_str)
    if not terms:
        return []
    positions = positions if positions is not None else _doc_positions(index)
    matched = []
    for doc_id, posmap in positions.items():
        lists = []
        ok = True
        for i, t in enumerate(terms):
            occ = posmap.get(t)
            if not occ:
                ok = False
                break
            lists.extend((s, i) for (s, _l) in occ)
        if not ok:
            continue
        lists.sort()
        have = [0] * len(terms)
        missing = len(terms)
        best = None
        left = 0
        for right in range(len(lists)):
            ti = lists[right][1]
            if have[ti] == 0:
                missing -= 1
            have[ti] += 1
            while missing == 0:
                span = lists[right][0] - lists[left][0]
                if best is None or span < best:
                    best = span
                tl = lists[left][1]
                have[tl] -= 1
                if have[tl] == 0:
                    missing += 1
                left += 1
        if best is not None and best <= window:
            matched.append(doc_id)
    return _score_docs(index, terms, matched)[:k]


def oracle_term_trend(
    index: OracleIndex, query_str: str, query_type: str = "exact"
) -> list:
    """Serial term-trend: per (query term, UTC month) matched-doc counts
    via a per-doc dict walk over the postings (independent mechanism
    from the engine's vectorized datetime64 bucketing)."""
    from collections import Counter
    from datetime import datetime, timezone

    from myaku_ray.lexicon import expand_alt_forms

    out = []
    for t in analyze_query(query_str):
        docs = set()
        for m in expand_alt_forms(t, query_type):
            docs.update(d for d, _tf in index.postings.get(m, []))
        c: Counter = Counter()
        for d in docs:
            ts = datetime.fromtimestamp(
                index.docs[d]["warc_us"] / 1_000_000, tz=timezone.utc
            )
            c[f"{ts.year:04d}-{ts.month:02d}"] += 1
        out.extend((t, month, n) for month, n in sorted(c.items()))
    return out


def oracle_suggest(
    index: OracleIndex, query_str: str, k: int = 5, max_dist: int = 2
) -> list[tuple[str, int, int]]:
    """Serial reference for ``Searcher.suggest``: a FULL vocabulary scan
    with an independent uncapped Levenshtein DP (no shared candidate
    generation or banding code with the engine), ranked by
    (distance, -df, term), the exact query excluded.  Returns top-k
    [(term, dist, df), ...]."""
    from myaku_ray.normalize import normalize_char_width

    q = normalize_char_width(query_str.strip())

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    scored = []
    for t, df in index.df.items():
        if t == q:
            continue
        d = lev(q, t)
        if d <= max_dist:
            scored.append((d, -int(df), t))
    scored.sort()
    return [(t, d, -neg_df) for d, neg_df, t in scored[:k]]


def suggest_query_set(pages_parquet: str) -> list[str]:
    """Deterministic did-you-mean queries derived from the FIXED corpus:
    tokenizer terms of the first URL-ordered docs (content-stable, the
    phrase/near derivation rule), deterministically misspelled —
    alternating middle-char deletion and substitution — plus one exact
    vocabulary term (neighbors minus itself) and one nonsense string
    with no distance-2 neighbor (zero suggestions)."""
    tok = get_tokenizer()
    texts = _first_texts(pages_parquet, want=3, min_len=200)
    base: list[str] = []
    seen: set[str] = set()
    for text in texts:
        for term in sorted(tok.find_term_tfs(text)):
            if len(term) >= 3 and term not in seen:
                seen.add(term)
                base.append(term)
            if len(base) >= 6:
                break
        if len(base) >= 6:
            break
    out: list[str] = []
    for i, t in enumerate(base):
        mid = len(t) // 2
        if i % 2 == 0:
            out.append(t[:mid] + t[mid + 1 :])  # one deletion
        else:
            out.append(t[:mid] + "ぴ" + t[mid + 1 :])  # one substitution
    if base:
        out.append(base[0])
    out.append("ゑゐゑゐゑ")
    return out


def phrase_query_set(pages_parquet: str) -> list[str]:
    """Deterministic phrase queries derived from the FIXED corpus text:
    contiguous 2- and 3-token slices of real docs (guaranteed hits), a
    cross-boundary slice containing a symbol (chain is unprovable —
    must return nothing), and a nonsense chain (zero hits)."""
    tok = get_tokenizer()
    texts = _first_texts(pages_parquet, want=3, min_len=200)
    out: list[str] = []
    for which, text in enumerate(texts):
        toks = tok.tokenize(text)
        runs2 = [
            i
            for i in range(len(toks) - 1)
            if toks[i + 1].start == toks[i].start + toks[i].length
        ]
        if not runs2:
            continue
        i = runs2[min(which * 7, len(runs2) - 1)]
        out.append(
            text[toks[i].start : toks[i + 1].start + toks[i + 1].length]
        )
        runs3 = [
            i
            for i in runs2
            if i + 2 < len(toks)
            and toks[i + 2].start == toks[i + 1].start + toks[i + 1].length
        ]
        if runs3 and which == 0:
            j = runs3[len(runs3) // 2]
            out.append(
                text[toks[j].start : toks[j + 2].start + toks[j + 2].length]
            )
        # a slice spanning a GAP (symbol/whitespace): phrase must be empty
        gaps = [
            i
            for i in range(len(toks) - 1)
            if toks[i + 1].start > toks[i].start + toks[i].length
        ]
        if gaps and which == 0:
            g = gaps[0]
            out.append(
                text[toks[g].start : toks[g + 1].start + toks[g + 1].length]
            )
    out.append("ぬりぬりぺぺぺ")  # nonsense chain, zero hits
    return out


def near_query_set(pages_parquet: str) -> list[tuple[str, int]]:
    """(query, window) pairs: two terms co-occurring in a real doc at
    three windows (tight / mid / loose) plus a multi-term query."""
    tok = get_tokenizer()
    texts = _first_texts(pages_parquet, want=1, min_len=200)
    if not texts:
        return []
    toks = [t for t in tok.tokenize(texts[0]) if len(t.base_form) > 1]
    seen: dict[str, int] = {}
    for t in toks:
        seen.setdefault(t.base_form, t.start)
    bases = list(seen)
    if len(bases) < 3:
        return []
    q2 = bases[0] + "の" + bases[1]
    q3 = bases[0] + bases[1] + bases[2]
    return [(q2, 20), (q2, 100), (q2, 1000), (q3, 200)]


def _first_texts(pages_parquet: str, want: int, min_len: int) -> list[str]:
    """First N extracted ja texts in URL order — the deterministic doc
    sample the query-set derivations run over.  Sorted by url (a
    content-stable key), NOT raw row order: a Ray-written corpus dir has
    no deterministic file/row order across runs, and a row-order sample
    made the derived phrase/near query sets (and so the stored goldens)
    depend on which write produced the cache."""
    import numpy as np

    table = pq.read_table(pages_parquet, columns=["url", "html", "lang"])
    order = np.argsort(np.asarray(table["url"].to_pylist(), dtype=object))
    out: list[str] = []
    for i in order:
        if table["lang"][i].as_py() != "ja":
            continue
        er = extract_page(table["html"][i].as_py(), table["url"][i].as_py())
        if er.ok and len(er.text) >= min_len:
            out.append(er.text)
            if len(out) >= want:
                break
    return out


def reference_query_set() -> list[str]:
    """The fixed query set for rank-identity checks (FIXTURES.md §4):
    mid-df terms, rare terms, high-df particles, width-normalization cases,
    a set phrase, and a zero-hit term."""
    from myaku_ray.lexicon import build_lexicon, build_phrases

    lex = build_lexicon()
    nouns = [e for e in lex if e.pos == "名詞" and not e.base_form.isascii()]
    kata = [e for e in lex if e.pos == "外来語" and len(e.surfaces) > 1]
    verbs = [e for e in lex if e.pos == "動詞" and len(e.surfaces) > 2]
    ascii_terms = [e for e in lex if e.pos == "名詞" and e.base_form.isascii()]
    a, b = build_phrases()[0]
    return [
        nouns[0].base_form,                    # mid/high-df noun
        nouns[50].base_form,
        nouns[900].base_form,                  # rare
        "の",                                   # particle, df ~ corpus
        "は",
        kata[0].surfaces[1],                   # half-width katakana query -> h2z
        verbs[0].surfaces[1],                  # conjugated surface -> base form
        "".join(chr(ord(c) + 0xFEE0) for c in ascii_terms[0].base_form),  # full-width latin
        a + b,                                 # set phrase (meta lexical item)
        nouns[2].base_form + "の" + nouns[7].base_form,  # multi-term
        "ぬりぬりぺぺぺ",                        # zero-hit
    ]


def altform_query_set() -> list[str]:
    """Fixed queries exercising the alt-form group shapes: a clean
    (unambiguous) entry member, an entry carrying an ambiguous kana
    spelling (definite < possible), the ambiguous kana itself, a verb
    group member queried via a CONJUGATED surface, a group-free term
    (expansion = singleton under every query type), and a multi-term
    query where one term has a group."""
    from myaku_ray.lexicon import (
        _form_entry_map, alt_form_entries, build_lexicon,
    )

    ents = alt_form_entries()
    fm = _form_entry_map()
    clean = next(
        forms for forms in ents
        if len(forms) == 2 and all(len(fm[f]) == 1 for f in forms)
    )
    dirty = next(
        forms for forms in ents if any(len(fm[f]) > 1 for f in forms)
    )
    amb = next(f for f in dirty if len(fm[f]) > 1)
    lex = build_lexicon()
    by_base = {e.base_form: e for e in lex}
    verb_pair = next(
        forms for forms in ents
        if all(by_base.get(f) and by_base[f].pos == "動詞" for f in forms)
    )
    conj = by_base[verb_pair[0]].surfaces[1]  # past-form surface
    free = next(
        e.base_form for e in lex
        if e.pos == "名詞" and e.base_form not in fm
    )
    return [
        clean[0],
        next(f for f in dirty if f != amb),
        amb,
        conj,
        free,
        clean[1] + "の" + free,
    ]


def oracle_boolean_topk(index: OracleIndex, query_str: str, k: int = 10):
    """Serial reference for ``Searcher.boolean_topk``: AND over must
    terms / NOT over ``-``-prefixed terms via Python set algebra over
    the oracle postings (independent mechanism from the engine's
    searchsorted-intersection / DAAT loop), scored and ranked by the
    shared ``_score_docs`` rank key."""
    must: list[str] = []
    nots: list[str] = []
    for token in query_str.split():
        neg = token.startswith("-") and len(token) > 1
        body = token[1:] if neg else token
        for t in analyze_query(body):
            target = nots if neg else must
            if t not in target:
                target.append(t)
    if not must or (set(must) & set(nots)):
        return []
    docsets = []
    for t in must:
        s = {d for d, _tf in index.postings.get(t, [])}
        if not s:
            return []
        docsets.append(s)
    docs = set.intersection(*docsets)
    for t in nots:
        docs -= {d for d, _tf in index.postings.get(t, [])}
    return _score_docs(index, must, sorted(docs))[:k]


def boolean_query_set(pages_parquet: str) -> list[str]:
    """Deterministic AND/NOT queries derived from the FIXED corpus in
    URL order (content-stable, the phrase/near derivation rule): two
    co-occurring terms (guaranteed hits), a 3-term AND, the same AND
    minus docs containing a third co-occurring term, a nonsense NOT
    (no-op exclusion), a nonsense MUST (empty), and a contradiction
    (empty)."""
    tok = get_tokenizer()
    texts = _first_texts(pages_parquet, want=1, min_len=200)
    if not texts:
        return []
    seen: dict[str, None] = {}
    for t in tok.tokenize(texts[0]):
        if len(t.base_form) > 1:
            seen.setdefault(t.base_form, None)
    bases = list(seen)
    if len(bases) < 4:
        return []
    b0, b1, b2, b3 = bases[:4]
    # the doc's two highest-tf terms (ties by term) — common corpus-wide,
    # so their AND has a candidate set well past k and the NOT prunes
    # partially instead of to zero
    tfs = tok.find_term_tfs(texts[0])
    m0, m1 = [t for _, t in sorted(((-c, t) for t, c in tfs.items()))[:2]]
    return [
        f"{b0} {b1}",
        f"{b0} {b1} {b3}",
        f"{b0} {b1} -{b2}",
        f"{b0} -ぬりぺちら",
        f"{b0} {b1} ぬりぺちら",
        f"{b0} -{b0}",
        f"{m0} {m1}",
        f"{m0} {m1} -{b0}",
        f"{m0} -{b0}",
    ]


def oracle_facets(
    index: OracleIndex, query_str: str, query_type: str = "exact"
) -> list[tuple[str, int]]:
    """Serial reference for ``Searcher.facets``: matched docs = union of
    the query terms' postings (the count() contract), counted per doc
    ``source``, ranked (count DESC, source ASC)."""
    from collections import Counter

    from myaku_ray.lexicon import expand_alt_forms

    terms = {
        m
        for t in analyze_query(query_str)
        for m in expand_alt_forms(t, query_type)
    }
    matched: set = set()
    for t in terms:
        matched.update(d for d, _tf in index.postings.get(t, []))
    counts = Counter(index.docs[d]["source"] for d in matched)
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def oracle_more_like_this(
    index: OracleIndex, doc_id: int, k: int = 10, n_terms: int | None = None
) -> list[tuple[int, float, int]]:
    """Serial reference for ``Searcher.more_like_this``: tokenize the
    seed doc's text, select terms with the SHARED kernel
    (scoring.select_mlt_terms — identical tf x idf rounding), then plain
    multi-term disjunctive scoring over those terms with the seed doc
    excluded, ranked by the engine's (score, warc_us, doc_id) DESC key."""
    from myaku_ray.scoring import select_mlt_terms

    meta = index.docs.get(doc_id)
    if meta is None:
        return []
    tok = get_tokenizer()
    items = tok.find_lexical_items(meta["text"])
    tf_by_term = {it["term"]: it["tf"] for it in items}
    terms = select_mlt_terms(
        tf_by_term, lambda t: index.df.get(t, 0), index.n_docs,
        *([n_terms] if n_terms is not None else []),
    )
    per_doc: dict[int, float] = {}
    for t in terms:
        for d, tf in index.postings.get(t, []):
            m = index.docs[d]
            per_doc[d] = per_doc.get(d, 0.0) + posting_score(
                tf, m["doclen"], m["quality"], index.df[t], index.n_docs,
                index.avgdl,
            )
    scored = [
        (s, index.docs[d]["warc_us"], d)
        for d, s in per_doc.items()
        if d != doc_id
    ]
    scored.sort(reverse=True)
    return [(d, s, w) for (s, w, d) in scored[:k]]


def mlt_seed_set(pages_parquet: str, n: int = 5) -> list[int]:
    """Seed doc_ids for the more-like-this golden: the first ``n``
    extractable ja docs in URL order (the content-stable derivation
    every pages query set uses — never raw row order)."""
    import numpy as np

    table = pq.read_table(pages_parquet, columns=["url", "html", "lang"])
    order = np.argsort(np.asarray(table["url"].to_pylist(), dtype=object))
    out: list[int] = []
    for i in order:
        if table["lang"][i].as_py() != "ja":
            continue
        url = table["url"][i].as_py()
        er = extract_page(table["html"][i].as_py(), url)
        if er.ok and len(er.text) <= MAX_ARTICLE_LEN:
            out.append(doc_id_for_url(url))
            if len(out) >= n:
                break
    return out


# ---------------------------------------------------------------------------
# Prefix (trailing-wildcard) search oracle
# ---------------------------------------------------------------------------

PREFIX_MAX_TERMS = 24  # mirrors Searcher.PREFIX_MAX_TERMS


def oracle_prefix_topk(
    index: OracleIndex,
    prefix: str,
    k: int = 10,
    max_terms: int = PREFIX_MAX_TERMS,
):
    """Serial prefix search: every vocabulary term starting with the
    width-normalized prefix, capped to the ``max_terms`` highest-df
    members in (-df, term) order — the engine's exact expansion rule —
    scored as ONE group (per-doc contribution = max over members),
    ranked (score, warc_us, doc_id) DESC."""
    q = normalize_char_width(prefix.strip())
    if not q:
        return []
    members = sorted(
        (t for t in index.df if t.startswith(q)),
        key=lambda t: (-index.df[t], t),
    )[:max_terms]
    best: dict[int, float] = {}
    for m in members:
        dfv = index.df[m]
        for doc_id, tf in index.postings[m]:
            meta = index.docs[doc_id]
            contrib = posting_score(
                tf, meta["doclen"], meta["quality"], dfv, index.n_docs,
                index.avgdl,
            )
            if doc_id not in best or contrib > best[doc_id]:
                best[doc_id] = contrib
    scored = sorted(
        ((s, index.docs[d]["warc_us"], d) for d, s in best.items()),
        reverse=True,
    )
    return [(d, s, w) for (s, w, d) in scored[:k]]


def oracle_wildcard_topk(
    index: OracleIndex,
    pattern: str,
    k: int = 10,
    max_terms: int = PREFIX_MAX_TERMS,
):
    """Serial general-wildcard search — an INDEPENDENT regex
    implementation of the engine's match contract (``Searcher.
    wildcard_topk`` uses a find-based segment matcher): the
    width-normalized pattern splits on ``*`` runs into literal
    segments joined by ``.*`` and fullmatched against every vocabulary
    term; matches cap to the ``max_terms`` highest-df members in
    (-df, term) order and score as ONE group (per-doc max), ranked
    (score, warc_us, doc_id) DESC."""
    import re as _re

    q = normalize_char_width(pattern.strip())
    segs = q.split("*")
    if not any(segs):
        return []
    if len(segs) == 1:
        members = [q] if q in index.df else []
    else:
        rx = _re.compile(
            "(?s)" + ".*".join(_re.escape(s) for s in segs) + r"\Z"
        )
        members = sorted(
            (t for t in index.df if rx.match(t)),
            key=lambda t: (-index.df[t], t),
        )[:max_terms]
    best: dict[int, float] = {}
    for m in members:
        dfv = index.df[m]
        for doc_id, tf in index.postings[m]:
            meta = index.docs[doc_id]
            contrib = posting_score(
                tf, meta["doclen"], meta["quality"], dfv, index.n_docs,
                index.avgdl,
            )
            if doc_id not in best or contrib > best[doc_id]:
                best[doc_id] = contrib
    scored = sorted(
        ((s, index.docs[d]["warc_us"], d) for d, s in best.items()),
        reverse=True,
    )
    return [(d, s, w) for (s, w, d) in scored[:k]]


def _oracle_levenshtein(a: str, b: str) -> int:
    """Plain full-matrix unit-cost Levenshtein — deliberately an
    INDEPENDENT implementation of the engine's banded/SymSpell path
    (editdist.py), so the fuzzy goldens cross-check the kernel too."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (0 if ca == b[j - 1] else 1),
            )
        prev = cur
    return prev[lb]


def oracle_fuzzy_topk(
    index: OracleIndex,
    term: str,
    k: int = 10,
    max_dist: int = 1,
    max_terms: int = PREFIX_MAX_TERMS,
):
    """Serial fuzzy (edit-distance) search: a FULL vocabulary scan with
    an independent Levenshtein, keeping terms at distance <= max_dist
    of the width-normalized query (the query spelling itself included),
    capped to ``max_terms`` members in (distance, -df, term) order —
    the engine's exact expansion rule — scored as ONE group (per-doc
    contribution = max over members), ranked (score, warc_us, doc_id)
    DESC."""
    q = normalize_char_width(term.strip())
    if not q:
        return []
    scored_terms = []
    for t in index.df:
        d = _oracle_levenshtein(q, t)
        if d <= max_dist:
            scored_terms.append((d, -index.df[t], t))
    scored_terms.sort()
    members = [t for _, _, t in scored_terms[:max_terms]]
    best: dict[int, float] = {}
    for m in members:
        dfv = index.df[m]
        for doc_id, tf in index.postings[m]:
            meta = index.docs[doc_id]
            contrib = posting_score(
                tf, meta["doclen"], meta["quality"], dfv, index.n_docs,
                index.avgdl,
            )
            if doc_id not in best or contrib > best[doc_id]:
                best[doc_id] = contrib
    scored = sorted(
        ((s, index.docs[d]["warc_us"], d) for d, s in best.items()),
        reverse=True,
    )
    return [(d, s, w) for (s, w, d) in scored[:k]]


def fuzzy_query_set(pages_parquet: str) -> list[str]:
    """Deterministic fuzzy-search queries derived from corpus content
    (URL order, the _first_texts rule): for the first few 3+-char
    terms of the first long docs, a one-deletion and a one-substitution
    misspelling (guaranteed distance-1 vocabulary neighbors), one exact
    vocabulary spelling (the distance-0 member must rank too), and a
    nonsense string with no near neighbor (zero hits)."""
    texts = _first_texts(pages_parquet, want=2, min_len=200)
    out: list[str] = []
    seen: set[str] = set()

    def add(p: str) -> None:
        if p and p not in seen:
            seen.add(p)
            out.append(p)

    for tx in texts:
        for t in analyze_query(tx[:400]):
            if len(t) < 3 or t.isascii():
                continue
            mid = len(t) // 2
            add(t[:mid] + t[mid + 1 :])  # one deletion
            add(t[:mid] + "ぴ" + t[mid + 1 :])  # one substitution
            if len(out) >= 6:
                break
        if len(out) >= 6:
            break
    if texts:
        for t in analyze_query(texts[0][:400]):
            if len(t) >= 3 and not t.isascii():
                add(t)  # exact vocabulary spelling
                break
    add("ゑゐぴぬ")  # zero-hit query
    return out


def oracle_title_boost_topk(
    index: OracleIndex, query_str: str, k: int = 10, boost: float = 0.5
):
    """Serial fielded (title-boosted) top-k — mirrors
    ``Searcher.topk_title_boost``: a term's per-posting contribution
    gains a flat ``boost`` (float64 add) when the doc's TITLE contains
    that term, where title membership is ``t in set(analyze_query(
    title))``.  Title text is part of the indexed body, so the matched
    set equals the plain ranking's; per-doc score sums contributions in
    sorted-term order, ranked (score, warc_us, doc_id) DESC.  Exact
    query type only (no alt-form expansion)."""
    terms = analyze_query(query_str)
    title_sets: dict[int, set] = {}

    def title_terms(doc_id: int) -> set:
        s = title_sets.get(doc_id)
        if s is None:
            s = set(analyze_query(index.docs[doc_id].get("title") or ""))
            title_sets[doc_id] = s
        return s

    per_doc: dict[int, dict[str, float]] = {}
    for t in terms:
        pl = index.postings.get(t)
        if not pl:
            continue
        dfv = index.df[t]
        for doc_id, tf in pl:
            meta = index.docs[doc_id]
            contrib = posting_score(
                tf, meta["doclen"], meta["quality"], dfv, index.n_docs,
                index.avgdl,
            )
            if boost and t in title_terms(doc_id):
                contrib += boost
            per_doc.setdefault(doc_id, {})[t] = contrib
    scored = []
    for doc_id, contribs in per_doc.items():
        score = 0.0
        for t in sorted(contribs):
            score += contribs[t]
        scored.append((score, index.docs[doc_id]["warc_us"], doc_id))
    scored.sort(reverse=True)
    return [(d, s, w) for (s, w, d) in scored[:k]]


def wildcard_query_set(pages_parquet: str) -> list[str]:
    """Deterministic wildcard patterns derived from corpus content (URL
    order, the _first_texts rule): for the first few 3+-char terms of
    the first long docs, the suffix (``*bc``), infix (``a*c``),
    contains (``*b*``) and multi-star (``a*b*``) shapes, plus a
    zero-hit pattern and a no-star exact lookup."""
    texts = _first_texts(pages_parquet, want=2, min_len=200)
    out: list[str] = []
    seen: set[str] = set()

    def add(p: str) -> None:
        if p not in seen:
            seen.add(p)
            out.append(p)

    for tx in texts:
        for t in analyze_query(tx[:400]):
            if len(t) < 3 or t.isascii():
                continue
            add("*" + t[1:])
            add(t[:1] + "*" + t[-1:])
            add("*" + t[1:2] + "*")
            add(t[:1] + "*" + t[1:2] + "*")
            if len(out) >= 8:
                break
        if len(out) >= 8:
            break
    if texts:
        for t in analyze_query(texts[0][:400]):
            if len(t) >= 2 and not t.isascii():
                add(t)  # no-star exact lookup
                break
    add("ゑゐ*ぬ")  # zero-hit pattern
    return out


def prefix_query_set(pages_parquet: str) -> list[str]:
    """Deterministic prefixes derived from corpus content (URL order,
    the _first_texts rule): the 1- and 2-char prefixes of the first
    few multi-char terms in the first long docs, plus a zero-hit
    prefix."""
    texts = _first_texts(pages_parquet, want=2, min_len=200)
    out: list[str] = []
    seen: set[str] = set()
    for tx in texts:
        for t in analyze_query(tx[:400]):
            if len(t) < 2 or t.isascii():
                continue
            for p in (t[:1], t[:2]):
                if p not in seen:
                    seen.add(p)
                    out.append(p)
            if len(out) >= 6:
                break
        if len(out) >= 6:
            break
    out.append("ゑゐぬ")  # zero-hit prefix
    return out


def oracle_topk_diverse(
    index: OracleIndex,
    query_str: str,
    k: int = 10,
    per_source_cap: int = 2,
    query_type: str = "exact",
):
    """Serial host-collapse: walk the FULL ranked matched list in
    (score, warc_us, doc_id) DESC order, keeping a doc only while its
    source has used fewer than ``per_source_cap`` slots — the engine's
    exact collapse contract."""
    full = oracle_topk(index, query_str, k=len(index.docs), query_type=query_type)
    used: dict[str, int] = {}
    out = []
    for doc_id, score, warc in full:
        src = index.docs[doc_id]["source"]
        if used.get(src, 0) >= per_source_cap:
            continue
        used[src] = used.get(src, 0) + 1
        out.append((doc_id, score, warc))
        if len(out) == k:
            break
    return out


def oracle_prf_topk(index: OracleIndex, query_str: str, k: int = 10):
    """Serial reference for ``Searcher.topk_prf``: first-pass top-R via
    ``oracle_topk`` (rank-identical to the engine by the search golden),
    feedback tfs from tokenizing those docs' texts with query terms
    excluded, expansion via the SHARED kernel
    ``scoring.select_prf_terms``, then one disjunctive pass over
    original + expansion terms ranked (score, warc_us, doc_id) DESC."""
    from myaku_ray.scoring import PRF_FB_DOCS, select_prf_terms

    qterms = analyze_query(query_str)
    qset = set(qterms)
    first = oracle_topk(index, query_str, k=PRF_FB_DOCS)
    tok = get_tokenizer()
    tf_by_term: dict[str, int] = {}
    for doc_id, _s, _w in first:
        for it in tok.find_lexical_items(index.docs[doc_id]["text"]):
            t = it["term"]
            if t not in qset:
                tf_by_term[t] = tf_by_term.get(t, 0) + int(it["tf"])
    expansion = select_prf_terms(
        tf_by_term, lambda t: index.df.get(t, 0), index.n_docs
    )
    per_doc: dict[int, float] = {}
    for t in dict.fromkeys(qterms + expansion):
        for d, tf in index.postings.get(t, []):
            m = index.docs[d]
            per_doc[d] = per_doc.get(d, 0.0) + posting_score(
                tf, m["doclen"], m["quality"], index.df[t], index.n_docs,
                index.avgdl,
            )
    scored = [(s, index.docs[d]["warc_us"], d) for d, s in per_doc.items()]
    scored.sort(reverse=True)
    return [(d, s, w) for (s, w, d) in scored[:k]]


def oracle_significant_terms(index: OracleIndex, query_str: str):
    """Serial reference for ``Searcher.significant_terms``: foreground =
    the top-SIG_FB_DOCS ranked docs, fg(t) = foreground docs containing
    t (query terms excluded), df from the independent serial index,
    ranked by the SHARED exact-Fraction lift kernel."""
    from myaku_ray.scoring import SIG_FB_DOCS, rank_significant_terms

    qset = set(analyze_query(query_str))
    first = oracle_topk(index, query_str, k=SIG_FB_DOCS)
    tok = get_tokenizer()
    fg_by_term: dict[str, int] = {}
    for doc_id, _s, _w in first:
        for t in {
            it["term"]
            for it in tok.find_lexical_items(index.docs[doc_id]["text"])
        }:
            if t not in qset:
                fg_by_term[t] = fg_by_term.get(t, 0) + 1
    return rank_significant_terms(
        fg_by_term, lambda t: index.df.get(t, 0), index.n_docs
    )


def oracle_pruned_topk(
    index: OracleIndex,
    query_str: str,
    k: int = 10,
    max_postings: int | None = None,
):
    """Serial reference for serving over the impact-pruned tier
    (pipelines/prune.py): per query term keep only the top-P postings
    by the engine rank key (score, warc_us, doc_id) DESC — the same
    lexsort selection the pruning derivation applies — then plain
    disjunctive scoring over the kept postings."""
    import numpy as np

    if max_postings is None:
        from myaku_ray.pipelines.prune import PRUNE_MAX_POSTINGS

        max_postings = PRUNE_MAX_POSTINGS
    per_doc: dict[int, float] = {}
    for t in dict.fromkeys(analyze_query(query_str)):
        pl = index.postings.get(t)
        if not pl:
            continue
        ids = np.array([d for d, _tf in pl], dtype=np.int64)
        scores = np.array(
            [
                posting_score(
                    tf,
                    index.docs[d]["doclen"],
                    index.docs[d]["quality"],
                    index.df[t],
                    index.n_docs,
                    index.avgdl,
                )
                for d, tf in pl
            ],
            dtype=np.float32,
        )
        warc = np.array(
            [index.docs[d]["warc_us"] for d, _tf in pl], dtype=np.uint64
        )
        if len(ids) > max_postings:
            keep = np.lexsort((ids, warc, scores))[-max_postings:]
            ids, scores, warc = ids[keep], scores[keep], warc[keep]
        for d, s in zip(ids.tolist(), scores.tolist()):
            per_doc[d] = per_doc.get(d, 0.0) + s
    scored = [(s, index.docs[d]["warc_us"], d) for d, s in per_doc.items()]
    scored.sort(reverse=True)
    return [(d, s, w) for (s, w, d) in scored[:k]]
