"""Generate stored-golden DuckDB oracles for the pages pipelines.

The pages corpus is a FIXED deterministic fixture (PAGES_N pages derived
from the seeded lexicon), so the correct outputs of pages_extract_stats /
pages_search_topk are constants.  This tool computes them with the SERIAL
oracle path (html_extract applied in-process; oracle.build_oracle_index +
oracle_topk for ranking — no Ray, no Dataset) and emits them as literal
VALUES tables into myaku_ray/functions/pages_golden.py, which
oracle_sql() serves to the driver.  Regenerate only when the corpus or
scoring semantics intentionally change:

    PYTHONPATH=/root/repo python tools/gen_pages_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import pandas as pd
import pyarrow.parquet as pq



def _sql_str(s: str) -> str:
    """SQL string literal with '' doubling (same as gen_op_goldens)."""
    return "'" + str(s).replace("'", "''") + "'"


def main() -> None:
    from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
    from myaku_ray.functions.fulltext import PAGES_N
    from myaku_ray.oracle import (
        build_oracle_index, oracle_topk, reference_query_set,
    )
    from myaku_ray.stages.extract import make_extract_fn

    pages_dir = "/tmp/myaku_ray_golden_pages"
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS_GOLDEN")):
        write_pages_parquet(pages_dir, PAGES_N, use_ray=False)
        open(os.path.join(pages_dir, "_SUCCESS_GOLDEN"), "w").write("ok")
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))

    # ---- extract stats golden (serial application of the extract fn) ----
    pages_t = pq.read_table(pages_dir)
    docs_t = make_extract_fn(ratings)(
        pages_t.select(["url", "warc_ts", "html", "lang"])
    )
    df = pd.DataFrame(
        {
            "source": docs_t["source"].to_pylist(),
            "alnum_count": docs_t["alnum_count"].to_pylist(),
        }
    )
    stats = (
        df.groupby("source")
        .agg(n_docs=("alnum_count", "size"), sum_alnum=("alnum_count", "sum"))
        .reset_index()
        .sort_values("source")
    )
    stats_rows = ",\n  ".join(
        f"({_sql_str(r.source)}, {int(r.n_docs)}::BIGINT, {int(r.sum_alnum)}::BIGINT)"
        for r in stats.itertuples()
    )
    stats_sql = (
        "SELECT * FROM (VALUES\n  "
        + stats_rows
        + "\n) AS golden(source, n_docs, sum_alnum)"
    )

    # ---- search top-k golden (independent serial ranker) ----------------
    oi = build_oracle_index(pages_dir, blog_ratings=ratings)
    rows = []
    for q in reference_query_set():
        for rank, (doc_id, score, _w) in enumerate(
            oracle_topk(oi, q, k=10), start=1
        ):
            # round-5 matches pages_search_topk's emitted score (engine
            # and serial oracle can differ by 1 ulp in the f64 sum)
            rows.append(
                (q, rank, doc_id, round(float(score), 5), oi.docs[doc_id]["url"])
            )
    search_rows = ",\n  ".join(
        f"({_sql_str(q)}, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for q, rank, doc_id, score, url in rows
    )
    search_sql = (
        "SELECT * FROM (VALUES\n  "
        + search_rows
        + "\n) AS golden(query, rank, doc_id, score, url)"
    )

    # ---- alt-form search golden (serial ranker, all query types) --------
    from myaku_ray.oracle import altform_query_set

    alt_rows = []
    for q in altform_query_set():
        for qt in ("exact", "definite", "possible"):
            for rank, (doc_id, score, _w) in enumerate(
                oracle_topk(oi, q, k=10, query_type=qt), start=1
            ):
                alt_rows.append(
                    (
                        q, qt, rank, doc_id, round(float(score), 5),
                        oi.docs[doc_id]["url"],
                    )
                )
    alt_values = ",\n  ".join(
        f"({_sql_str(q)}, {_sql_str(qt)}, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for q, qt, rank, doc_id, score, url in alt_rows
    )
    alt_sql = (
        "SELECT * FROM (VALUES\n  "
        + alt_values
        + "\n) AS golden(query, query_type, rank, doc_id, score, url)"
    )

    # ---- phrase / proximity goldens (serial positional oracle) ---------
    from myaku_ray.oracle import (
        _doc_positions, near_query_set, oracle_near_topk,
        oracle_phrase_topk, phrase_query_set,
    )

    dpos = _doc_positions(oi)
    phrase_rows = []
    for q in phrase_query_set(pages_dir):
        for rank, (doc_id, score, _w) in enumerate(
            oracle_phrase_topk(oi, q, k=10, positions=dpos), start=1
        ):
            phrase_rows.append(
                (q, rank, doc_id, round(float(score), 5),
                 oi.docs[doc_id]["url"])
            )
    phrase_values = ",\n  ".join(
        f"({_sql_str(q)}, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for q, rank, doc_id, score, url in phrase_rows
    )
    phrase_sql = (
        "SELECT * FROM (VALUES\n  "
        + phrase_values
        + "\n) AS golden(query, rank, doc_id, score, url)"
    )

    near_rows = []
    for q, w in near_query_set(pages_dir):
        for rank, (doc_id, score, _ww) in enumerate(
            oracle_near_topk(oi, q, w, k=10, positions=dpos), start=1
        ):
            near_rows.append(
                (q, w, rank, doc_id, round(float(score), 5),
                 oi.docs[doc_id]["url"])
            )
    near_values = ",\n  ".join(
        f"({_sql_str(q)}, {w}::BIGINT, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for q, w, rank, doc_id, score, url in near_rows
    )
    near_sql = (
        "SELECT * FROM (VALUES\n  "
        + near_values
        + "\n) AS golden(query, \"window\", rank, doc_id, score, url)"
    )

    # ---- term trend golden (serial per-doc month walk) -----------------
    from myaku_ray.oracle import oracle_term_trend

    trend_rows = []
    for q in reference_query_set():
        for term, month, n in oracle_term_trend(oi, q):
            trend_rows.append((q, term, month, n))
    trend_values = ",\n  ".join(
        f"({_sql_str(q)}, {_sql_str(t)}, {_sql_str(m)}, {n}::BIGINT)" for q, t, m, n in trend_rows
    )
    trend_sql = (
        "SELECT * FROM (VALUES\n  "
        + trend_values
        + "\n) AS golden(query, term, \"month\", n_docs)"
    )

    # ---- fuzzy suggestion golden (serial full-vocab Levenshtein scan) ---
    from myaku_ray.oracle import oracle_suggest, suggest_query_set

    sug_rows = []
    for q in suggest_query_set(pages_dir):
        for rank, (term, dist, dfreq) in enumerate(
            oracle_suggest(oi, q, k=5), start=1
        ):
            sug_rows.append((q, rank, term, dist, dfreq))
    sug_values = ",\n  ".join(
        f"({_sql_str(q)}, {rank}::BIGINT, {_sql_str(t)}, "
        f"{d}::BIGINT, {dfreq}::BIGINT)"
        for q, rank, t, d, dfreq in sug_rows
    )
    sug_sql = (
        "SELECT * FROM (VALUES\n  "
        + sug_values
        + '\n) AS golden(query, rank, suggestion, dist, df)'
    )

    # ---- boolean AND/NOT golden (serial set-algebra oracle) ------------
    from myaku_ray.oracle import boolean_query_set, oracle_boolean_topk

    bool_rows = []
    for q in boolean_query_set(pages_dir):
        for rank, (doc_id, score, _w) in enumerate(
            oracle_boolean_topk(oi, q, k=10), start=1
        ):
            bool_rows.append(
                (q, rank, doc_id, round(float(score), 5),
                 oi.docs[doc_id]["url"])
            )
    bool_values = ",\n  ".join(
        f"({_sql_str(q)}, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for q, rank, doc_id, score, url in bool_rows
    )
    bool_sql = (
        "SELECT * FROM (VALUES\n  "
        + bool_values
        + "\n) AS golden(query, rank, doc_id, score, url)"
    )

    # ---- facet golden (serial union-postings + meta-source count) ------
    from myaku_ray.oracle import oracle_facets

    facet_rows = []
    for q in reference_query_set():
        for src_name, n in oracle_facets(oi, q):
            facet_rows.append((q, src_name, n))
    facet_values = ",\n  ".join(
        f"({_sql_str(q)}, {_sql_str(src_name)}, {n}::BIGINT)"
        for q, src_name, n in facet_rows
    )
    facet_sql = (
        "SELECT * FROM (VALUES\n  "
        + facet_values
        + "\n) AS golden(query, source, n_docs)"
    )

    # ---- FLI interp profile golden (serial tokenizer pass) -------------
    # Mirrors fulltext.pages_fli_interp_profile: same "interesting" filter
    # (multi-interp or meta-phrase) and the same struct shaping FliStage
    # emits (stages/tokenize.py FLI_SCHEMA).
    from collections import Counter

    from myaku_ray.tokenizer import get_tokenizer

    tok = get_tokenizer()
    prof: Counter = Counter()
    prof_tf: Counter = Counter()
    prof_terms: dict = {}
    for text in docs_t["text"].to_pylist():
        for item in tok.find_lexical_items(text):
            if not (len(item["possible_interps"]) > 1 or item["pos"] == "連語"):
                continue
            for it in item["possible_interps"]:
                mi = it["mecab_interp"]
                key = (
                    item["pos"],
                    "/".join((mi["parts_of_speech"] if mi else None) or []),
                    (mi["conjugated_type"] if mi else None) or "",
                    (mi["conjugated_form"] if mi else None) or "",
                    "+".join(it["interp_sources"] or []),
                )
                prof[key] += 1
                prof_tf[key] += int(item["tf"])
                prof_terms.setdefault(key, set()).add(item["term"])
    prof_rows = ",\n  ".join(
        f"({_sql_str(k[0])}, {_sql_str(k[1])}, {_sql_str(k[2])}, "
        f"{_sql_str(k[3])}, {_sql_str(k[4])}, {n}::BIGINT, "
        f"{prof_tf[k]}::BIGINT, {len(prof_terms[k])}::BIGINT)"
        for k, n in sorted(prof.items())
    )
    prof_sql = (
        "SELECT * FROM (VALUES\n  "
        + prof_rows
        + "\n) AS golden(term_pos, interp_pos, conj_type, conj_form, sources,"
        " n, sum_tf, n_terms)"
    )

    # ---- more-like-this golden (serial seed-term selection + ranker) ----
    from myaku_ray.oracle import mlt_seed_set, oracle_more_like_this

    mlt_rows = []
    for seed in mlt_seed_set(pages_dir):
        for rank, (doc_id, score, _w) in enumerate(
            oracle_more_like_this(oi, seed, k=10), start=1
        ):
            mlt_rows.append(
                (seed, rank, doc_id, round(float(score), 5),
                 oi.docs[doc_id]["url"])
            )
    mlt_values = ",\n  ".join(
        f"({seed}::BIGINT, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for seed, rank, doc_id, score, url in mlt_rows
    )
    mlt_sql = (
        "SELECT * FROM (VALUES\n  "
        + mlt_values
        + "\n) AS golden(seed_doc_id, rank, doc_id, score, url)"
    )

    # ---- prefix (trailing-wildcard) search golden -----------------------
    from myaku_ray.oracle import oracle_prefix_topk, prefix_query_set

    pfx_rows = []
    for p in prefix_query_set(pages_dir):
        for rank, (doc_id, score, _w) in enumerate(
            oracle_prefix_topk(oi, p, k=10), start=1
        ):
            pfx_rows.append(
                (p, rank, doc_id, round(float(score), 5),
                 oi.docs[doc_id]["url"])
            )
    pfx_values = ",\n  ".join(
        f"({_sql_str(p)}, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for p, rank, doc_id, score, url in pfx_rows
    )
    pfx_sql = (
        "SELECT * FROM (VALUES\n  "
        + pfx_values
        + "\n) AS golden(query, rank, doc_id, score, url)"
    )

    # ---- host-collapse (source-diversified) search golden ---------------
    from myaku_ray.oracle import oracle_topk_diverse

    div_rows = []
    for q in reference_query_set():
        for rank, (doc_id, score, _w) in enumerate(
            oracle_topk_diverse(oi, q, k=10, per_source_cap=2), start=1
        ):
            div_rows.append(
                (q, rank, doc_id, round(float(score), 5),
                 oi.docs[doc_id]["url"])
            )
    div_values = ",\n  ".join(
        f"({_sql_str(q)}, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for q, rank, doc_id, score, url in div_rows
    )
    div_sql = (
        "SELECT * FROM (VALUES\n  "
        + div_values
        + "\n) AS golden(query, rank, doc_id, score, url)"
    )

    # ---- date-filtered (crawl-time range) search golden ------------------
    from myaku_ray.oracle import date_range_query_set, oracle_topk_in_range

    dated_rows = []
    for q, lo, hi in date_range_query_set(pages_dir):
        for rank, (doc_id, score, _w) in enumerate(
            oracle_topk_in_range(oi, q, lo, hi, k=10), start=1
        ):
            dated_rows.append(
                (q, lo, hi, rank, doc_id, round(float(score), 5),
                 oi.docs[doc_id]["url"])
            )
    dated_values = ",\n  ".join(
        f"({_sql_str(q)}, {lo}::BIGINT, {hi}::BIGINT, {rank}::BIGINT, "
        f"{doc_id}::BIGINT, {score!r}::DOUBLE, {_sql_str(url)})"
        for q, lo, hi, rank, doc_id, score, url in dated_rows
    )
    dated_sql = (
        "SELECT * FROM (VALUES\n  "
        + dated_values
        + "\n) AS golden(query, t_lo, t_hi, rank, doc_id, score, url)"
    )

    # ---- serving previews golden (serial preview assembly) ---------------
    from myaku_ray.oracle import analyze_query, get_tokenizer
    from myaku_ray.preview import build_preview

    tok = get_tokenizer()
    prev_rows = []
    for q in reference_query_set():
        qterms = set(analyze_query(q))
        for rank, (doc_id, _score, _w) in enumerate(
            oracle_topk(oi, q, k=5), start=1
        ):
            text = oi.docs[doc_id]["text"]
            items = tok.find_lexical_items(text)
            matched = [it for it in items if it["term"] in qterms]
            if not matched:
                mt, preview = "", text[:100]
            else:
                positions = sorted(
                    {tuple(p) for it in matched for p in it["positions"]}
                )
                samples = build_preview(text, positions)
                preview = " … ".join(s.text for s in samples)
                mt = "|".join(it["term"] for it in matched)
            prev_rows.append((q, rank, doc_id, mt, preview))
    prev_values = ",\n  ".join(
        f"({_sql_str(q)}, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{_sql_str(mt)}, {_sql_str(pv)})"
        for q, rank, doc_id, mt, pv in prev_rows
    )
    prev_sql = (
        "SELECT * FROM (VALUES\n  "
        + prev_values
        + "\n) AS golden(query, rank, doc_id, matched_terms, preview)"
    )

    # ---- pagination golden (ranks 11..30 from the serial full order) -----
    paged_rows = []
    count_rows = []
    for q in reference_query_set():
        full = oracle_topk(oi, q, k=1_000_000)
        count_rows.append((q, len(full)))
        for rank, (doc_id, score, _w) in enumerate(full[10:30], start=11):
            paged_rows.append(
                (q, (rank - 1) // 10 + 1, rank, doc_id, round(float(score), 5))
            )
    paged_values = ",\n  ".join(
        f"({_sql_str(q)}, {page}::BIGINT, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE)"
        for q, page, rank, doc_id, score in paged_rows
    )
    paged_sql = (
        "SELECT * FROM (VALUES\n  "
        + paged_values
        + "\n) AS golden(query, page, rank, doc_id, score)"
    )
    count_values = ",\n  ".join(
        f"({_sql_str(q)}, {n}::BIGINT)" for q, n in count_rows
    )
    counts_sql = (
        "SELECT * FROM (VALUES\n  "
        + count_values
        + "\n) AS golden(query, n_results)"
    )

    # ---- general-wildcard search golden ----------------------------------
    from myaku_ray.oracle import oracle_wildcard_topk, wildcard_query_set

    wc_rows = []
    for p in wildcard_query_set(pages_dir):
        for rank, (doc_id, score, _w) in enumerate(
            oracle_wildcard_topk(oi, p, k=10), start=1
        ):
            wc_rows.append(
                (p, rank, doc_id, round(float(score), 5),
                 oi.docs[doc_id]["url"])
            )
    wc_values = ",\n  ".join(
        f"({_sql_str(p)}, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for p, rank, doc_id, score, url in wc_rows
    )
    wc_sql = (
        "SELECT * FROM (VALUES\n  "
        + wc_values
        + "\n) AS golden(query, rank, doc_id, score, url)"
    )

    # ---- fuzzy (edit-distance) search golden ------------------------------
    from myaku_ray.oracle import fuzzy_query_set, oracle_fuzzy_topk

    fz_rows = []
    for p in fuzzy_query_set(pages_dir):
        for dist in (1, 2):
            for rank, (doc_id, score, _w) in enumerate(
                oracle_fuzzy_topk(oi, p, k=10, max_dist=dist), start=1
            ):
                fz_rows.append(
                    (p, dist, rank, doc_id, round(float(score), 5),
                     oi.docs[doc_id]["url"])
                )
    fz_values = ",\n  ".join(
        f"({_sql_str(p)}, {dist}::BIGINT, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for p, dist, rank, doc_id, score, url in fz_rows
    )
    fz_sql = (
        "SELECT * FROM (VALUES\n  "
        + fz_values
        + "\n) AS golden(query, max_dist, rank, doc_id, score, url)"
    )

    # ---- title-boost (fielded) search golden -----------------------------
    from myaku_ray.oracle import oracle_title_boost_topk

    tb_rows = []
    for q in reference_query_set():
        for rank, (doc_id, score, _w) in enumerate(
            oracle_title_boost_topk(oi, q, k=10), start=1
        ):
            tb_rows.append(
                (q, rank, doc_id, round(float(score), 5),
                 oi.docs[doc_id]["url"])
            )
    tb_values = ",\n  ".join(
        f"({_sql_str(q)}, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for q, rank, doc_id, score, url in tb_rows
    )
    tb_sql = (
        "SELECT * FROM (VALUES\n  "
        + tb_values
        + "\n) AS golden(query, rank, doc_id, score, url)"
    )

    # ---- pseudo-relevance-feedback search golden --------------------------
    from myaku_ray.oracle import oracle_prf_topk

    prf_rows = []
    for q in reference_query_set():
        for rank, (doc_id, score, _w) in enumerate(
            oracle_prf_topk(oi, q, k=10), start=1
        ):
            prf_rows.append(
                (q, rank, doc_id, round(float(score), 5),
                 oi.docs[doc_id]["url"])
            )
    prf_values = ",\n  ".join(
        f"({_sql_str(q)}, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for q, rank, doc_id, score, url in prf_rows
    )
    prf_sql = (
        "SELECT * FROM (VALUES\n  "
        + prf_values
        + "\n) AS golden(query, rank, doc_id, score, url)"
    )

    # ---- significant-terms aggregation golden -----------------------------
    from myaku_ray.oracle import oracle_significant_terms

    sig_rows = []
    for q in reference_query_set():
        for rank, (term, fg, dfreq) in enumerate(
            oracle_significant_terms(oi, q), start=1
        ):
            sig_rows.append((q, rank, term, fg, dfreq))
    sig_values = ",\n  ".join(
        f"({_sql_str(q)}, {rank}::BIGINT, {_sql_str(t)}, "
        f"{fg}::BIGINT, {dfreq}::BIGINT)"
        for q, rank, t, fg, dfreq in sig_rows
    )
    sig_sql = (
        "SELECT * FROM (VALUES\n  "
        + sig_values
        + "\n) AS golden(query, rank, term, fg, df)"
    )

    # ---- impact-pruned tier search golden ----------------------------------
    from myaku_ray.oracle import oracle_pruned_topk

    pr_rows = []
    for q in reference_query_set():
        for rank, (doc_id, score, _w) in enumerate(
            oracle_pruned_topk(oi, q, k=10), start=1
        ):
            pr_rows.append(
                (q, rank, doc_id, round(float(score), 5),
                 oi.docs[doc_id]["url"])
            )
    pr_values = ",\n  ".join(
        f"({_sql_str(q)}, {rank}::BIGINT, {doc_id}::BIGINT, "
        f"{score!r}::DOUBLE, {_sql_str(url)})"
        for q, rank, doc_id, score, url in pr_rows
    )
    pruned_sql = (
        "SELECT * FROM (VALUES\n  "
        + pr_values
        + "\n) AS golden(query, rank, doc_id, score, url)"
    )

    # ---- index invariants golden (serial oracle's independent counts) ----
    inv = {
        "n_docs": oi.n_docs,
        "n_terms": len(oi.postings),
        "total_postings": sum(len(pl) for pl in oi.postings.values()),
        "total_tf": sum(
            tf for pl in oi.postings.values() for _, tf in pl
        ),
    }
    inv_values = ",\n  ".join(
        f"({_sql_str(m)}, {v}::BIGINT)" for m, v in inv.items()
    )
    inv_sql = (
        "SELECT * FROM (VALUES\n  "
        + inv_values
        + "\n) AS golden(metric, value)"
    )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "myaku_ray", "functions", "pages_golden.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""GENERATED by tools/gen_pages_golden.py — stored-golden DuckDB\n'
            "oracles for the pages pipelines (serial-oracle outputs over the\n"
            f"fixed {PAGES_N}-page corpus as literal VALUES tables).  Do not\n"
            'edit by hand; regenerate via the tool."""\n\n'
            f"PAGES_EXTRACT_STATS_SQL = '''\n{stats_sql}\n'''\n\n"
            f"PAGES_SEARCH_TOPK_SQL = '''\n{search_sql}\n'''\n\n"
            f"PAGES_SEARCH_ALTFORMS_SQL = '''\n{alt_sql}\n'''\n\n"
            f"PAGES_FLI_INTERP_PROFILE_SQL = '''\n{prof_sql}\n'''\n\n"
            f"PAGES_PHRASE_SEARCH_SQL = '''\n{phrase_sql}\n'''\n\n"
            f"PAGES_NEAR_SEARCH_SQL = '''\n{near_sql}\n'''\n\n"
            f"PAGES_TERM_TREND_SQL = '''\n{trend_sql}\n'''\n\n"
            f"PAGES_SUGGEST_SQL = '''\n{sug_sql}\n'''\n\n"
            f"PAGES_BOOLEAN_SEARCH_SQL = '''\n{bool_sql}\n'''\n\n"
            f"PAGES_SEARCH_FACETS_SQL = '''\n{facet_sql}\n'''\n\n"
            f"PAGES_MORE_LIKE_THIS_SQL = '''\n{mlt_sql}\n'''\n\n"
            f"PAGES_PREFIX_SEARCH_SQL = '''\n{pfx_sql}\n'''\n\n"
            f"PAGES_SEARCH_DIVERSE_SQL = '''\n{div_sql}\n'''\n\n"
            f"PAGES_SEARCH_DATED_SQL = '''\n{dated_sql}\n'''\n\n"
            f"PAGES_SEARCH_PREVIEWS_SQL = '''\n{prev_sql}\n'''\n\n"
            f"PAGES_SEARCH_PAGED_SQL = '''\n{paged_sql}\n'''\n\n"
            f"PAGES_RESULT_COUNTS_SQL = '''\n{counts_sql}\n'''\n\n"
            f"PAGES_INDEX_STATS_SQL = '''\n{inv_sql}\n'''\n\n"
            f"PAGES_WILDCARD_SEARCH_SQL = '''\n{wc_sql}\n'''\n\n"
            f"PAGES_TITLE_BOOST_SQL = '''\n{tb_sql}\n'''\n\n"
            f"PAGES_FUZZY_SEARCH_SQL = '''\n{fz_sql}\n'''\n\n"
            f"PAGES_SEARCH_PRF_SQL = '''\n{prf_sql}\n'''\n\n"
            f"PAGES_SIGNIFICANT_TERMS_SQL = '''\n{sig_sql}\n'''\n\n"
            f"PAGES_PRUNED_SEARCH_SQL = '''\n{pruned_sql}\n'''\n",
        )
    print(
        f"wrote {out}: {len(stats)} stats rows, {len(rows)} search rows, "
        f"{len(alt_rows)} altform rows, {len(prof)} interp-profile rows, "
        f"{len(phrase_rows)} phrase rows, {len(near_rows)} near rows, "
        f"{len(trend_rows)} trend rows, {len(sug_rows)} suggest rows, "
        f"{len(bool_rows)} boolean rows, {len(facet_rows)} facet rows, "
        f"{len(pfx_rows)} prefix rows, {len(prev_rows)} preview rows, "
        f"{len(wc_rows)} wildcard rows, {len(tb_rows)} title-boost rows, "
        f"{len(fz_rows)} fuzzy rows, {len(prf_rows)} prf rows, "
        f"{len(sig_rows)} significant-terms rows, "
        f"{len(pr_rows)} pruned rows"
    )


if __name__ == "__main__":
    main()
