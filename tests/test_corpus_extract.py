"""Corpus generation + HTML extraction byte-identity (the per-row invariant)."""

from myaku_ray.corpus import (
    MAX_ARTICLE_LEN,
    blog_url_of,
    gen_page_row,
    order_nums_of,
    source_of,
)
from myaku_ray.html_extract import extract_page

N = 900


def _rows():
    return [gen_page_row(i, N) for i in range(N)]


def test_extraction_byte_identity():
    """Pipeline extraction of html must equal the golden text column exactly."""
    rows = _rows()
    n_ok = 0
    for r in rows:
        er = extract_page(r["html"], r["url"])
        if r["text"] == "":
            assert not er.ok, f"{r['url']}: expected skip, got ok"
        else:
            assert er.ok, f"{r['url']}: {er.skip_reason}"
            assert er.text == r["text"], f"{r['url']}: text mismatch"
            n_ok += 1
    assert n_ok > N * 0.9


def test_negative_cases_present():
    rows = _rows()
    reasons = set()
    langs = set()
    n_over = 0
    for r in rows:
        langs.add(r["lang"])
        er = extract_page(r["html"], r["url"])
        if not er.ok:
            reasons.add(er.skip_reason)
        if len(r["text"]) > MAX_ARTICLE_LEN:
            n_over += 1
    assert "paywall" in reasons
    assert "empty-body" in reasons
    assert n_over >= 1  # length-cap cases exist
    assert "en" in langs or "" in langs  # non-ja rows exist


def test_duplicates_exist():
    rows = _rows()
    texts = {}
    n_dup = 0
    for r in rows:
        if r["text"] == "":
            continue
        if r["text"] in texts:
            n_dup += 1
            assert texts[r["text"]] != r["url"]  # distinct urls share text
        else:
            texts[r["text"]] = r["url"]
    assert n_dup >= 3


def test_determinism_and_url_derivations():
    a = gen_page_row(123, N)
    b = gen_page_row(123, N)
    assert a["html"] == b["html"] and a["text"] == b["text"]
    assert source_of("https://src0.example.jp/articles/00000001") == "news"
    u = "https://src2.example.jp/series/00004/episodes/013"
    assert source_of(u) == "blog"
    assert blog_url_of(u) == "https://src2.example.jp/series/00004"
    assert order_nums_of(u) == (13, 3)
    assert blog_url_of("https://src0.example.jp/articles/1") is None


def test_video_flag_extracted():
    rows = _rows()
    flags = set()
    for r in rows:
        er = extract_page(r["html"], r["url"])
        if er.ok and er.source == "news":
            flags.add(er.has_video)
    assert flags == {True, False}
