"""HTML -> text extraction (the trafilatura-equivalent stage), pure Python.

Reproduces the reference extraction semantics with compiled regexes and a
structural-validity check instead of BeautifulSoup (not available here):

- ``strip_ruby_tags``: remove <rt>/<rp> content, unwrap <ruby>
  (reference: myaku/utils/html.py:574-585, same regexes).
- ``parse_valid_child_text`` contract: a text container is valid iff its
  descendants are only in the allowable inline set
  {a,b,blockquote,br,em,i,img,span,strong,sup} — structural descendants make
  it invalid (reference: myaku/utils/html.py:22-75).
- Per-source body assembly (M5): news/editorial sections joined "\\n\\n"
  after the title (nhk_news_web.py:132,168; asahi.py:355-370), blog
  paragraphs joined "\\n" after title+blank (kakuyomu.py:666-685).
- Paywall / empty-body rows are skipped (asahi.py:84-99,157-171).

The same function is used by the serial oracle and by the Ray
``map_batches`` stage, making the byte-identity invariant testable.
"""

from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass

from myaku_ray.corpus import source_of

# Reference regexes (utils/html.py:20-24,574-585).
_RT_CONTENT = re.compile(r"<rt.*?>.*?</rt>", re.S)
_RP_CONTENT = re.compile(r"<rp.*?>.*?</rp>", re.S)
_RUBY_TAG = re.compile(r"</?ruby.*?>", re.S)
_HTML_TAG = re.compile(r"<.*?>", re.S)

ALLOWABLE_TAGS_IN_TEXT = {
    "a", "b", "blockquote", "br", "em", "i", "img", "span", "strong", "sup",
    # ruby family is stripped *before* validation, as in strip_ruby_tags
    "ruby", "rt", "rp",
}

_ANY_TAG = re.compile(r"<\s*/?\s*([a-zA-Z][a-zA-Z0-9-]*)")

_TITLE_RES = {
    "news": re.compile(r'<h1 class="content--title">(.*?)</h1>', re.S),
    "editorial": re.compile(r'<h1 class="article-title">(.*?)</h1>', re.S),
    "blog": re.compile(r'<h1 class="episode-title">(.*?)</h1>', re.S),
}
_NEWS_PARA = re.compile(r'<p class="article-p">(.*?)</p>', re.S)
_EDIT_BODY = re.compile(r'<div class="article-body">(.*?)</div>', re.S)
_EDIT_CHILD = re.compile(r"<(p|h2)>(.*?)</\1>", re.S)
_BLOG_BODY = re.compile(r'<div class="episode-body">(.*?)</div>', re.S)
_BLOG_PARA = re.compile(r"<p>(.*?)</p>", re.S)
_PAYWALL = re.compile(r'class="paywall-notice"')
_VIDEO = re.compile(r"<video\b")


@dataclass
class ExtractResult:
    ok: bool
    text: str = ""
    title: str = ""
    has_video: bool = False
    source: str = ""
    skip_reason: str = ""


def strip_ruby_tags(html_str: str) -> str:
    """Strip rt/rp content and unwrap ruby (utils/html.py:574-585)."""
    html_str = _RT_CONTENT.sub("", html_str)
    html_str = _RP_CONTENT.sub("", html_str)
    return _RUBY_TAG.sub("", html_str)


def parse_valid_child_text(inner_html: str) -> str | None:
    """Tag-strip inner HTML iff it has no structural descendants.

    Returns None when a structural tag is found (invalid child text,
    mirroring parse_valid_child_text raise_on_no_text=False,
    utils/html.py:32-75).
    """
    for m in _ANY_TAG.finditer(inner_html):
        if m.group(1).lower() not in ALLOWABLE_TAGS_IN_TEXT:
            return None
    stripped = _HTML_TAG.sub("", inner_html)
    return _htmllib.unescape(stripped)


def extract_page(html_bytes: bytes, url: str) -> ExtractResult:
    """Extract golden text from one page. Deterministic, pure."""
    source = source_of(url)
    try:
        doc = html_bytes.decode("utf-8")
    except UnicodeDecodeError:
        return ExtractResult(False, source=source, skip_reason="bad-encoding")

    doc = strip_ruby_tags(doc)
    has_video = bool(_VIDEO.search(doc))

    m = _TITLE_RES[source].search(doc)
    if m is None:
        return ExtractResult(False, source=source, skip_reason="no-title")
    title = parse_valid_child_text(m.group(1))
    if title is None:
        return ExtractResult(False, source=source, skip_reason="bad-title")

    if source == "editorial" and _PAYWALL.search(doc):
        return ExtractResult(False, source=source, skip_reason="paywall")

    paras: list[str] = []
    if source == "news":
        for pm in _NEWS_PARA.finditer(doc):
            t = parse_valid_child_text(pm.group(1))
            if t is None:
                return ExtractResult(False, source=source, skip_reason="bad-para")
            paras.append(t)
    elif source == "editorial":
        bm = _EDIT_BODY.search(doc)
        if bm is None:
            return ExtractResult(False, source=source, skip_reason="no-body")
        for cm in _EDIT_CHILD.finditer(bm.group(1)):
            t = parse_valid_child_text(cm.group(2))
            if t is None:
                return ExtractResult(False, source=source, skip_reason="bad-para")
            paras.append(t)
    else:  # blog
        bm = _BLOG_BODY.search(doc)
        if bm is None:
            return ExtractResult(False, source=source, skip_reason="no-body")
        for pm in _BLOG_PARA.finditer(bm.group(1)):
            t = parse_valid_child_text(pm.group(1))
            if t is None:
                return ExtractResult(False, source=source, skip_reason="bad-para")
            paras.append(t)

    if not paras:
        return ExtractResult(False, source=source, skip_reason="empty-body")

    if source == "blog":
        text = "\n".join([title, ""] + paras)
    else:
        text = "\n\n".join([title] + paras)
    return ExtractResult(
        True, text=text, title=title, has_video=has_video, source=source
    )
