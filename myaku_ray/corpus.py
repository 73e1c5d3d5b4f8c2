"""Deterministic synthetic Common-Crawl-style page corpus (the input table).

Produces the ``input_hint`` schema exactly:
``(url:string, warc_ts:timestamp[us], html:binary, text:large_string,
lang:string)`` — where ``text`` is the GOLDEN extracted text: the pipeline's
HTML extraction of ``html`` must equal it byte-for-byte per url (the per-row
invariant from BASELINE.json).

Page HTML mirrors the reference's three source shapes
(myaku/crawlers/{nhk_news_web,asahi,kakuyomu}.py and the golden fixtures in
myaku/tests/end_to_end/test_html/):

- ``news``   (src0, NHK-like):   <h1 class> title + <p class="article-p">
  paragraphs; text = ``title \\n\\n p1 \\n\\n p2 ...``
  (assembly per nhk_news_web.py:132,168).
- ``editorial`` (src1, Asahi-like): body div with <p>/<h2> children joined
  ``\\n\\n`` after the title (asahi.py:355-370); some rows paywalled
  (class "paywall-notice") and must be SKIPPED (asahi.py:84-99).
- ``blog``   (src2, Kakuyomu-like): episode paragraphs; text =
  ``title \\n\\n p1 \\n p2 ...`` (sections ``[title, ''] + paras`` joined
  ``'\\n'``, kakuyomu.py:666-685).

Inline noise the extractor must strip: ``<ruby>K<rt>reading</rt></ruby>``
(+ <rp> parens) per utils/html.py:574-585, and allowable inline tags
a/b/em/span/strong per utils/html.py:22-24.  Negative cases: paywall rows,
empty-body rows, non-ja rows, > 65536-char rows (index_build.py:48).

Every row is generated from ``random.Random(f"{seed}:{i}")`` only — independent
of block order, parallelizable with ``ray.data.range(n).map_batches`` and
stable under re-runs/resume.
"""

from __future__ import annotations

import html as _htmllib
import random
from datetime import datetime, timedelta

from myaku_ray.lexicon import build_lexicon, build_phrases, PARTICLES

# The fixed "now" for all recency computations (mirrors the reference's
# MockDatetime pattern, test_crawl.py:2047-2056). Never use wall-clock.
FIXED_NOW = datetime(2026, 8, 1, 0, 0, 0)

CORPUS_SEED = 42
MAX_ARTICLE_LEN = 65536  # reference length cap, index_build.py:48

SOURCES = ("news", "editorial", "blog")
SOURCE_NAMES = {
    "news": "NHK News Web",
    "editorial": "Asahi Shinbun",
    "blog": "Kakuyomu",
}

_ZIPF_S = 1.1


def _zipf_weights(n: int) -> list[float]:
    return [1.0 / (r + 1) ** _ZIPF_S for r in range(n)]


class _Vocab:
    """Process-local cached sampling tables over the lexicon."""

    _inst = None

    def __init__(self) -> None:
        lex = build_lexicon()
        self.entries = [e for e in lex if e.pos != "助詞"]
        self.weights = _zipf_weights(len(self.entries))
        # cumulative weights for random.choices
        cum = []
        tot = 0.0
        for w in self.weights:
            tot += w
            cum.append(tot)
        self.cum_weights = cum
        self.phrases = build_phrases()
        self.by_base = {e.base_form: e for e in lex}

    @classmethod
    def get(cls) -> "_Vocab":
        if cls._inst is None:
            cls._inst = cls()
        return cls._inst


def _pick_surface(rng: random.Random, entry) -> str:
    surfaces = entry.surfaces
    if len(surfaces) == 1 or rng.random() < 0.6:
        return surfaces[0]
    return rng.choice(surfaces[1:])


def _make_sentence(rng: random.Random, vocab: _Vocab, n_words: int) -> list[str]:
    """Return token pieces (words + particles + ender) of one sentence."""
    pieces: list[str] = []
    words = rng.choices(vocab.entries, cum_weights=vocab.cum_weights, k=n_words)
    for w in words:
        pieces.append(_pick_surface(rng, w))
        if rng.random() < 0.65:
            pieces.append(rng.choice(PARTICLES))
    # Occasionally append a known set phrase so the meta-lexical path has data.
    if rng.random() < 0.08:
        a, b = rng.choice(vocab.phrases)
        pieces.append(a)
        pieces.append(b)
    pieces.append(rng.choice("。。。！？"))
    return pieces


def _decorate(rng: random.Random, piece: str, vocab: _Vocab) -> str:
    """HTML for one token piece; golden text is the piece itself."""
    esc = _htmllib.escape(piece, quote=False)
    r = rng.random()
    if r < 0.04:
        ent = vocab.by_base.get(piece)
        reading = ent.reading if ent is not None and ent.reading else "よみ"
        return f"<ruby>{esc}<rt>{_htmllib.escape(reading, quote=False)}</rt></ruby>"
    if r < 0.06:
        return f"<ruby>{esc}<rp>(</rp><rt>かな</rt><rp>)</rp></ruby>"
    if r < 0.09:
        return f"<b>{esc}</b>"
    if r < 0.11:
        return f'<a href="https://example.jp/x">{esc}</a>'
    if r < 0.13:
        return f"<em>{esc}</em>"
    if r < 0.145:
        return f'<span class="kw">{esc}</span>'
    return esc


def _make_paragraph(
    rng: random.Random, vocab: _Vocab, n_sentences: int
) -> tuple[str, str]:
    """Return (golden_text, inner_html) for one paragraph."""
    text_parts: list[str] = []
    html_parts: list[str] = []
    for _ in range(n_sentences):
        for piece in _make_sentence(rng, vocab, rng.randint(3, 8)):
            text_parts.append(piece)
            html_parts.append(_decorate(rng, piece, vocab))
    return "".join(text_parts), "".join(html_parts)


def _make_title(rng: random.Random, vocab: _Vocab) -> tuple[str, str]:
    """(golden_text, inner_html) for a title: word pieces, no sentence ender."""
    pieces = _make_sentence(rng, vocab, rng.randint(2, 5))[:-1]
    text = "".join(pieces)
    html_s = "".join(_decorate(rng, p, vocab) for p in pieces)
    return text, html_s


# Target alnum-length buckets spanning the reference length-score ranges
# (factor_scorers.py:141-156): approx paragraph counts to hit each bucket.
_LEN_BUCKET_PARAS = (1, 2, 3, 4, 6, 8, 10, 14)


def gen_page_row(i: int, n_pages: int, seed: int = CORPUS_SEED) -> dict:
    """Generate page row i of n (pure, order-independent, deterministic)."""
    rng = random.Random(f"{seed}:{i}")
    vocab = _Vocab.get()

    src_idx = i % 3
    source = SOURCES[src_idx]
    seq = i // 3

    if source == "blog":
        series = seq // 20
        episode = seq % 20 + 1
        url = (
            f"https://src2.example.jp/series/{series:05d}/episodes/{episode:03d}"
        )
    else:
        url = f"https://src{src_idx}.example.jp/articles/{seq:08d}"

    # warc_ts: deterministic spread over ~4 years before FIXED_NOW so every
    # recency bucket (7/30/90/180/365/1095 days) is populated.
    days_back = rng.random() * 4 * 365
    warc_ts = FIXED_NOW - timedelta(
        days=days_back, seconds=rng.randint(0, 86399)
    )

    # ~4% non-ja rows that must be filtered out by lang.
    lang = "ja"
    r = rng.random()
    if r < 0.02:
        lang = "en"
    elif r < 0.03:
        lang = ""

    # Negative structural cases.
    paywalled = source == "editorial" and rng.random() < 0.04
    empty_body = rng.random() < 0.01
    oversized = rng.random() < 0.002

    # ~2% duplicate text: reuse the content of an earlier page (same source
    # position class so assembly rules agree), distinct url.
    dup_of = None
    if i >= 30 and rng.random() < 0.02:
        dup_of = i - 30  # same i%3 → same source/assembly

    if dup_of is not None:
        donor = gen_page_row(dup_of, n_pages, seed)
        title, paras, content_rng = None, None, None
        golden_text = donor["text"]
        html_doc = _render_html(
            rng, source, donor["_title"], donor["_paras"], lang,
            paywalled=False, empty=False, has_video=donor["_has_video"],
        )
        return {
            "url": url,
            "warc_ts": warc_ts,
            "html": html_doc.encode("utf-8"),
            "text": golden_text,
            "lang": lang,
            "_title": donor["_title"],
            "_paras": donor["_paras"],
            "_has_video": donor["_has_video"],
        }

    title_text, title_html = _make_title(rng, vocab)

    n_paras = rng.choice(_LEN_BUCKET_PARAS)
    if oversized:
        n_paras = 160  # pushes well past 65536 chars
    paras: list[tuple[str, str]] = []
    for _ in range(n_paras):
        paras.append(_make_paragraph(rng, vocab, rng.randint(2, 5)))
    if oversized:
        # inflate each paragraph by repetition to guarantee > MAX_ARTICLE_LEN
        paras = [(t * 8, h * 8) for (t, h) in paras]

    if empty_body:
        paras = []

    has_video = source == "news" and rng.random() < 0.15

    golden = _assemble_text(source, title_text, [t for t, _ in paras])
    if paywalled or empty_body:
        golden = ""  # excluded rows carry empty golden text

    html_doc = _render_html(
        rng, source, (title_text, title_html), paras, lang,
        paywalled=paywalled, empty=empty_body, has_video=has_video,
    )
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html_doc.encode("utf-8"),
        "text": golden,
        "lang": lang,
        "_title": (title_text, title_html),
        "_paras": paras,
        "_has_video": has_video,
    }


def _assemble_text(source: str, title: str, para_texts: list[str]) -> str:
    """The byte-identity contract: per-source body assembly (M5)."""
    if source == "blog":
        # ['title', ''] + paras joined '\n'  (kakuyomu.py:666-685)
        return "\n".join([title, ""] + para_texts)
    # news / editorial: title + sections joined '\n\n'
    return "\n\n".join([title] + para_texts)


def _render_html(
    rng: random.Random,
    source: str,
    title_pair: tuple[str, str],
    paras: list[tuple[str, str]],
    lang: str,
    *,
    paywalled: bool,
    empty: bool,
    has_video: bool,
) -> str:
    _, title_html = title_pair
    head = (
        f'<!DOCTYPE html><html lang="{lang or "ja"}"><head>'
        f"<meta charset=\"utf-8\"><title>x</title></head><body>"
        '<header><nav><a href="/">ホーム</a><span>ナビ</span></nav></header>'
    )
    tail = '<footer><p class="copy">(c) example</p></footer></body></html>'

    if source == "news":
        body = [f'<main><article><h1 class="content--title">{title_html}</h1>']
        if has_video:
            body.append(
                '<div class="content--video"><video src="/v.mp4"></video></div>'
            )
        for _, ph in paras:
            body.append(f'<p class="article-p">{ph}</p>')
        body.append("</article></main>")
    elif source == "editorial":
        body = [f'<main><article><h1 class="article-title">{title_html}</h1>']
        if paywalled:
            body.append('<div class="paywall-notice">この記事は有料会員記事です</div>')
        body.append('<div class="article-body">')
        for k, (_, ph) in enumerate(paras):
            if k > 0 and k % 4 == 0:
                body.append(f"<h2>{ph}</h2>")
            else:
                body.append(f"<p>{ph}</p>")
        body.append("</div></article></main>")
    else:  # blog
        body = [
            f'<main><article><h1 class="episode-title">{title_html}</h1>',
            '<div class="episode-body">',
        ]
        for _, ph in paras:
            body.append(f"<p>{ph}</p>")
        body.append("</div></article></main>")

    if empty:
        # structurally present article but no paragraph content
        if source == "editorial":
            body = [
                f'<main><article><h1 class="article-title">{title_html}</h1>'
                '<div class="article-body"></div></article></main>'
            ]
        elif source == "news":
            body = [
                f'<main><article><h1 class="content--title">{title_html}</h1>'
                "</article></main>"
            ]
        else:
            body = [
                f'<main><article><h1 class="episode-title">{title_html}</h1>'
                '<div class="episode-body"></div></article></main>'
            ]

    return head + "".join(body) + tail


# ---------------------------------------------------------------------------
# Wait: editorial h2 handling must match assembly — the golden text includes
# h2 text in document order (asahi.py:355-370 parses p AND h2 children), so
# no special casing is needed: every para appears once either as <p> or <h2>.
# ---------------------------------------------------------------------------


def gen_pages_batch(indices, n_pages: int, seed: int = CORPUS_SEED) -> dict:
    """Vectorized batch generation for ray.data.range().map_batches."""
    rows = [gen_page_row(int(i), n_pages, seed) for i in indices]
    return {
        "url": [r["url"] for r in rows],
        "warc_ts": [r["warc_ts"] for r in rows],
        "html": [r["html"] for r in rows],
        "text": [r["text"] for r in rows],
        "lang": [r["lang"] for r in rows],
    }


def write_pages_parquet(
    out_dir: str, n_pages: int, seed: int = CORPUS_SEED, *, use_ray: bool = True
) -> str:
    """Materialize the pages table as parquet under out_dir (idempotent).

    With use_ray, generation itself is a Ray Data pipeline (range ->
    map_batches -> write_parquet) so bench-scale corpora build in parallel.
    """
    import os

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    if use_ray:
        import ray.data as rd

        ds = rd.range(n_pages)
        ds = ds.map_batches(
            lambda b: gen_pages_batch(b["id"], n_pages, seed),
            batch_size=256,
            batch_format="numpy",
        )
        ds.write_parquet(out_dir)
    else:
        import pyarrow as pa
        import pyarrow.parquet as pq

        batch = gen_pages_batch(range(n_pages), n_pages, seed)
        table = pa.table(
            {
                "url": pa.array(batch["url"], pa.string()),
                "warc_ts": pa.array(batch["warc_ts"], pa.timestamp("us")),
                "html": pa.array(batch["html"], pa.binary()),
                "text": pa.array(batch["text"], pa.large_string()),
                "lang": pa.array(batch["lang"], pa.string()),
            }
        )
        pq.write_table(table, os.path.join(out_dir, "pages.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def gen_blogs_table(n_blogs: int = 64, seed: int = CORPUS_SEED):
    """Small blog dimension table (JpnArticleBlog analog) — broadcast side."""
    import pandas as pd

    rng = random.Random(f"{seed}:blogs")
    rows = []
    for b in range(n_blogs):
        rows.append(
            {
                "blog_url": f"https://src2.example.jp/series/{b:05d}",
                "title": f"連載{b:05d}",
                "author": f"作者{b % 17:02d}",
                # ratings span the kakuyomu star buckets 5/10/20/30/50/70/100+
                "rating": round(rng.random() ** 2 * 150, 2),
                "rating_count": rng.randint(0, 500),
                "article_count": 20,
                "in_serialization": rng.random() < 0.5,
            }
        )
    return pd.DataFrame(rows)


def blog_url_of(url: str) -> str | None:
    """Derive the blog (series) url from an episode url, else None."""
    if "/episodes/" not in url:
        return None
    return url.split("/episodes/")[0]


def order_nums_of(url: str) -> tuple[int | None, int | None]:
    """(blog_article_order_num, blog_section_order_num) from an episode url."""
    if "/episodes/" not in url:
        return None, None
    ep = int(url.rsplit("/", 1)[1])
    return ep, (ep - 1) % 10 + 1


def source_of(url: str) -> str:
    if url.startswith("https://src0."):
        return "news"
    if url.startswith("https://src1."):
        return "editorial"
    return "blog"
