"""Extraction + doc-stats + quality-score stages (per-doc, shuffle-free).

``extract_docs_batch`` is the map_batches body for
``pages -> docs``: HTML→text extraction (byte-identity contract), doc_id
assignment, alnum/doclen stats, text_hash for dedup, and the full integer
quality score (reference factor tables, myaku/scorer/factor_scorers.py).

It is a plain function (stateless task), not an actor: all state is
module-level compiled regexes + the broadcast blog-rating dict passed in.
Rows that fail extraction / language / length checks are dropped here,
mirroring the reference guards (index_build.py:124-143, asahi.py:84-99).
"""

from __future__ import annotations

import pyarrow as pa

from myaku_ray.corpus import FIXED_NOW, MAX_ARTICLE_LEN, blog_url_of, order_nums_of
from myaku_ray.html_extract import extract_page
from myaku_ray.normalize import alnum_count, doc_id_for_url, text_hash
from myaku_ray.scoring import article_quality_score

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("title", pa.string()),
        ("text", pa.large_string()),
        ("alnum_count", pa.int64()),
        ("text_hash", pa.string()),
        ("quality_score", pa.int64()),
        ("source", pa.string()),
        ("has_video", pa.bool_()),
    ]
)


def make_extract_fn(blog_ratings: dict[str, float], fixed_now=FIXED_NOW):
    """Build the extraction batch fn with the broadcast blog dim baked in.

    ``blog_ratings`` is the small blogs dimension (blog_url -> rating),
    broadcast once via ray.put by the pipeline driver and resolved here —
    a map-side lookup instead of a shuffle join (J2 in SURVEY.md §2.4).
    """

    def extract_docs_batch(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        langs = batch["lang"].to_pylist()
        warcs = batch["warc_ts"].to_pylist()

        out = {name: [] for name in DOC_SCHEMA.names}
        for url, html, lang, warc in zip(urls, htmls, langs, warcs):
            if lang != "ja":  # language filter (input_hint: non-ja rows dropped)
                continue
            er = extract_page(html, url)
            if not er.ok:
                continue
            if len(er.text) > MAX_ARTICLE_LEN:  # length cap, index_build.py:48
                continue
            alnum = alnum_count(er.text)
            age_days = (fixed_now - warc).days
            border, sorder = order_nums_of(url)
            burl = blog_url_of(url)
            rating = blog_ratings.get(burl) if burl is not None else None
            quality = article_quality_score(
                alnum=alnum,
                age_days=age_days,
                has_video=er.has_video,
                source=er.source,
                blog_rating=rating,
                blog_article_order=border,
                blog_section_order=sorder,
            )
            out["doc_id"].append(doc_id_for_url(url))
            out["url"].append(url)
            out["warc_ts"].append(warc)
            out["title"].append(er.title)
            out["text"].append(er.text)
            out["alnum_count"].append(alnum)
            out["text_hash"].append(text_hash(er.text))
            out["quality_score"].append(quality)
            out["source"].append(er.source)
            out["has_video"].append(er.has_video)

        return pa.Table.from_pydict(out, schema=DOC_SCHEMA)

    return extract_docs_batch
