"""Deterministic update/re-crawl batches over the synthetic page corpus.

Models the reference's incremental crawl inputs (myaku/crawlers/
crawl_track.py:89-129 semantics): a later crawl sees a mix of

- brand-new urls (indices >= the base corpus size),
- re-crawled urls: same url, strictly newer warc_ts, regenerated content
  (site updated its article),
- optionally an injected exact duplicate of an existing doc under a fresh
  url (exercises dedup winner displacement when the new url's doc_id
  hashes below the incumbent winner's).

Everything derives from ``corpus.gen_page_row`` so the update batch is
pure and reproducible; ``write_union_parquet`` materializes the
latest-extractable-version-per-url union table a from-scratch oracle
build must agree with.
"""

from __future__ import annotations

import os
from datetime import timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from myaku_ray.corpus import CORPUS_SEED, gen_page_row

PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)


def _row_ok_for_recrawl(row: dict) -> bool:
    """Re-crawled versions must stay extractable (ja + non-empty text);
    a failed re-extraction leaves the OLD version live (the engine keeps
    serving the indexed article, like the reference skipping a bad crawl),
    which a latest-per-url oracle union cannot express."""
    return row["lang"] == "ja" and len(row["text"]) > 0


def gen_update_batch(
    n_base: int,
    *,
    n_new: int = 0,
    recrawl_indices: list[int] | None = None,
    dup_of_indices: list[int] | None = None,
    seed: int = CORPUS_SEED,
    content_seed: int = CORPUS_SEED + 1,
) -> pa.Table:
    rows: list[dict] = []
    for i in range(n_base, n_base + n_new):
        rows.append(gen_page_row(i, n_base + n_new, seed))
    for idx in recrawl_indices or []:
        orig = gen_page_row(idx, n_base, seed)
        s = content_seed
        fresh = gen_page_row(idx, n_base, s)
        while not _row_ok_for_recrawl(fresh):
            s += 1
            fresh = gen_page_row(idx, n_base, s)
        fresh["url"] = orig["url"]
        fresh["warc_ts"] = orig["warc_ts"] + timedelta(days=60)
        rows.append(fresh)
    for j, idx in enumerate(dup_of_indices or []):
        donor = gen_page_row(idx, n_base, seed)
        dup = dict(donor)
        dup["url"] = f"https://src{idx % 3}.example.jp/articles/dup{j:02d}-{idx:08d}"
        dup["warc_ts"] = donor["warc_ts"] + timedelta(days=1)
        rows.append(dup)
    return pa.table(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": [r["warc_ts"] for r in rows],
            "html": [r["html"] for r in rows],
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        },
        schema=PAGE_SCHEMA,
    )


def write_update_parquet(out_dir: str, batch: pa.Table) -> str:
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(batch, os.path.join(out_dir, "update.parquet"))
    return out_dir


def write_union_parquet(out_path: str, base_dir: str, *batches: pa.Table) -> str:
    """Latest-version-per-url union of base pages + update batches (the
    corpus a from-scratch rebuild/oracle should see)."""
    parts = [pq.read_table(base_dir)] + [b for b in batches]
    all_t = pa.concat_tables(
        [p.select(PAGE_SCHEMA.names).cast(PAGE_SCHEMA) for p in parts]
    )
    
    df = all_t.to_pandas()
    df = (
        df.sort_values(["url", "warc_ts"])
        .drop_duplicates("url", keep="last")
        .sort_index()
    )
    out = pa.Table.from_pandas(df, schema=PAGE_SCHEMA, preserve_index=False)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pq.write_table(out, out_path)
    return out_path
