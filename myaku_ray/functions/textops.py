"""Text-analysis operators over the generic ``documents`` table.

Whitespace tokens (== DuckDB ``string_split(text, ' ')``) keep every op
SQL-checkable: token counting, document frequency, quality scoring
(stopword/length ratios), exact dedup, language profiling.  Ratios are
double divisions of exact integers — bit-identical across engines.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

STOPWORDS = ("the", "a")


def doc_token_stats(sf_dir: str):
    """Per-doc token counts: n_tokens, n_distinct."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        """Fully vectorized: split_pattern + list_value_length for counts;
        distinct-per-doc via dictionary codes + one np.unique over
        (doc, code) keys — no Python loop over rows."""
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        n_tok = pc.list_value_length(toks).cast(pa.int64())
        enc = pc.list_flatten(toks).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        vocab = len(enc.dictionary)
        uniq = np.unique(parents.astype(np.int64) * vocab + codes)
        n_dis = np.bincount(uniq // vocab, minlength=batch.num_rows)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tok,
                "n_distinct": pa.array(n_dis.astype(np.int64)),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


DOC_TOKEN_STATS_SQL = """
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
FROM documents
"""


def _doc_term_tfs(batch: pa.Table):
    """Vectorized per-batch (doc, term, tf) triples: split -> flatten ->
    dictionary-encode, then ONE np.unique over composite (doc, code) keys
    — no Python loop over rows or tokens.  Returns (doc_idx, term_codes,
    tfs, dictionary): doc_idx indexes into the batch, term_codes into the
    dictionary."""
    import pyarrow.compute as pc

    toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = max(len(enc.dictionary), 1)
    uniq, tfs = np.unique(parents * vocab + codes, return_counts=True)
    return uniq // vocab, uniq % vocab, tfs.astype(np.int64), enc.dictionary


def term_doc_freq(sf_dir: str):
    """Corpus term statistics: df (docs containing) + total tf."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "tf": pa.array([], pa.int64())}
            )
        _, codes, tfs, dictionary = _doc_term_tfs(batch)
        return pa.table(
            {"term": dictionary.take(pa.array(codes)), "tf": pa.array(tfs)}
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="df"), Sum("tf", alias_name="total_tf"))
    )


TERM_DOC_FREQ_SQL = """
WITH tf AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS total_tf
FROM tf GROUP BY term
"""


def term_suggestions(sf_dir: str, max_dist: int = 2):
    """Fuzzy "did-you-mean" pairs: vocabulary terms within Levenshtein
    distance <= max_dist of each other, each side carrying its df (the
    rank signal a serving layer would order suggestions by).

    SymSpell-style plan — past the vocab aggregate every stage is
    VOCAB-sized, never corpus-sized, so the op's cost is independent of
    the corpus row count once df is known:
      1. (term, df) via the same explode + groupby(term) plan as
         ``term_doc_freq``;
      2. deletion-neighborhood expansion inside ``map_batches``: each
         term emits every string reachable by deleting <= max_dist of
         its chars (O(len^max_dist) variants per term; the per-term
         Python loop is over the VOCAB, the accepted idiom for
         vocab-sized stages).  Two terms at distance <= d always share
         a <= d-deletion variant (delete each side's unaligned chars of
         an optimal alignment), so candidate recall is exact;
      3. ONE groupby(variant) exchange -> in-bucket (a < b) candidate
         pairs.  Hot buckets are the very short variants ('' pairs all
         <= max_dist-char terms) — alphabet-bounded, the same df**2
         valve ``ngram_jaccard_pairs`` documents;
      4. groupby(pair) dedup (a pair shares many variants) + banded
         exact-Levenshtein verify on each group's single survivor.
    Matches TERM_SUGGESTIONS_SQL row-for-row.
    """
    from myaku_ray.editdist import deletion_variants, levenshtein_capped

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string())})
        _, codes, _, dictionary = _doc_term_tfs(batch)
        return pa.table({"term": dictionary.take(pa.array(codes))})

    vocab = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="df"))
    )

    def variants_of(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        dfs = batch["df"].to_pylist()
        v_out: list[str] = []
        t_out: list[str] = []
        d_out: list[int] = []
        for t, df in zip(terms, dfs):
            seen = deletion_variants(t, max_dist)
            v_out.extend(seen)
            t_out.extend([t] * len(seen))
            d_out.extend([int(df)] * len(seen))
        return pa.table(
            {
                "variant": pa.array(v_out, pa.string()),
                "term": pa.array(t_out, pa.string()),
                "df": pa.array(d_out, pa.int64()),
            }
        )

    _pair_schema = pa.schema(
        [
            ("term", pa.string()),
            ("suggestion", pa.string()),
            ("term_df", pa.int64()),
            ("suggestion_df", pa.int64()),
        ]
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows <= 1:
            return _pair_schema.empty_table()
        rows = sorted(zip(g["term"].to_pylist(), g["df"].to_pylist()))
        a_t, b_t, a_d, b_d = [], [], [], []
        for i in range(len(rows)):
            ti, di = rows[i]
            for j in range(i + 1, len(rows)):
                tj, dj = rows[j]
                a_t.append(ti)
                b_t.append(tj)
                a_d.append(di)
                b_d.append(dj)
        return pa.table(
            {
                "term": pa.array(a_t, pa.string()),
                "suggestion": pa.array(b_t, pa.string()),
                "term_df": pa.array(a_d, pa.int64()),
                "suggestion_df": pa.array(b_d, pa.int64()),
            }
        )

    _out_schema = pa.schema(
        [
            ("term", pa.string()),
            ("suggestion", pa.string()),
            ("dist", pa.int64()),
            ("term_df", pa.int64()),
            ("suggestion_df", pa.int64()),
        ]
    )

    def verify_pair(g: pa.Table) -> pa.Table:
        t = g["term"][0].as_py()
        s = g["suggestion"][0].as_py()
        d = levenshtein_capped(t, s, max_dist)
        if d > max_dist:
            return _out_schema.empty_table()
        return pa.table(
            {
                "term": pa.array([t], pa.string()),
                "suggestion": pa.array([s], pa.string()),
                "dist": pa.array([d], pa.int64()),
                "term_df": g["term_df"].slice(0, 1),
                "suggestion_df": g["suggestion_df"].slice(0, 1),
            }
        )

    return (
        vocab.map_batches(variants_of, batch_format="pyarrow")
        .groupby("variant")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["term", "suggestion"])
        .map_groups(verify_pair, batch_format="pyarrow")
    )


TERM_SUGGESTIONS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), vocab AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY term
)
SELECT a.term AS term, b.term AS suggestion,
  CAST(levenshtein(a.term, b.term) AS BIGINT) AS dist,
  a.df AS term_df, b.df AS suggestion_df
FROM vocab a JOIN vocab b ON a.term < b.term
WHERE levenshtein(a.term, b.term) <= 2
"""


def bigram_counts(sf_dir: str):
    """Corpus sequential-bigram statistics: for every ORDERED adjacent
    token pair, total occurrences (n) and containing-doc count (df) —
    the n-gram LM / collocation-table counterpart of
    ``term_cooccurrence_pmi`` (which counts distinct UNORDERED pairs
    per doc, adjacency ignored).

    Per-batch work is fully vectorized: one dictionary-encode of the
    flattened tokens, an adjacency mask on the parent indices, then one
    np.unique over composite (doc, pair) keys gives per-doc pair tfs —
    n = segment-summed tf, df = distinct-doc row count (each doc lives
    in exactly one batch, so the partials are summable).  The ONE
    groupby exchange carries (w1, w2, partial n, partial df) rows —
    bounded by the batch's distinct-bigram count, never its token
    count.  Matches BIGRAM_COUNTS_SQL row-for-row."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "pn": pa.array([], pa.int64()),
                "pdf": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        if len(parents) < 2:
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = max(len(enc.dictionary), 1)
        adj = parents[1:] == parents[:-1]
        if not adj.any():
            return empty
        w1c = codes[:-1][adj]
        w2c = codes[1:][adj]
        doc = parents[:-1][adj]
        pair = w1c * vocab + w2c
        dockey = doc * (vocab * vocab) + pair
        uniq, tf = np.unique(dockey, return_counts=True)
        pk = uniq % (vocab * vocab)
        order = np.argsort(pk, kind="stable")
        pk_s, tf_s = pk[order], tf[order]
        upk, start = np.unique(pk_s, return_index=True)
        n = np.add.reduceat(tf_s, start).astype(np.int64)
        df = np.diff(np.append(start, len(pk_s))).astype(np.int64)
        return pa.table(
            {
                "w1": enc.dictionary.take(pa.array(upk // vocab)),
                "w2": enc.dictionary.take(pa.array(upk % vocab)),
                "pn": pa.array(n),
                "pdf": pa.array(df),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("pn", alias_name="n"), Sum("pdf", alias_name="df"))
    )


BIGRAM_COUNTS_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), pairs AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
)
SELECT w1, w2, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM pairs GROUP BY w1, w2
"""


def doc_length_band(sf_dir: str, lo_q: float = 0.10, hi_q: float = 0.99):
    """Docs whose length lies inside the corpus-GLOBAL [lo_q, hi_q]
    discrete length quantiles — the percentile-threshold quality gate
    real curation pipelines apply before training.

    Exact at any scale WITHOUT a distributed sort: n_chars is a bounded
    int (the extract stage caps docs at 2^16 chars), so one streaming
    bincount pass — per-batch (value, count) rows, groupby(value) sum —
    yields a RANGE-sized histogram (<= 65k rows on the driver, never
    corpus-sized) from which exact order statistics fall out; the two
    integer thresholds then broadcast into a second streaming filter
    pass.  Threshold rule is DuckDB ``quantile_disc``: the order
    statistic at index ceil(q*n)-1 (verified against DuckDB on both
    interpolation-free and midpoint cases), and thresholds are INTS so
    the boundary comparison cannot float-flake.  Matches
    DOC_LENGTH_BAND_SQL row-for-row."""
    import math

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def hist(batch: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            batch["n_chars"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "value": pa.array(vals.astype(np.int64)),
                "cnt": pa.array(cnts.astype(np.int64)),
            }
        )

    h = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("value")
    )
    values = h["value"].to_numpy()
    cum = h["cnt"].to_numpy().cumsum()
    n = int(cum[-1])

    def disc(q: float) -> int:
        k = max(math.ceil(q * n) - 1, 0)
        return int(values[np.searchsorted(cum, k + 1)])

    lo, hi = disc(lo_q), disc(hi_q)

    def band(batch: pa.Table) -> pa.Table:
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((nc >= lo) & (nc <= hi)))

    return ds.map_batches(band, batch_format="pyarrow")


DOC_LENGTH_BAND_SQL = """
WITH b AS (
  SELECT quantile_disc(n_chars, 0.10) AS lo,
         quantile_disc(n_chars, 0.99) AS hi
  FROM documents
)
SELECT doc_id, n_chars FROM documents, b
WHERE n_chars >= lo AND n_chars <= hi
"""


def doc_quality(sf_dir: str):
    """Quality-scoring signals: stopword ratio, mean token length, shortness."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    stop = set(STOPWORDS)

    def q(batch: pa.Table) -> pa.Table:
        """Vectorized signals: per-token is_in / utf8_length on the
        flattened token array, segment-summed per doc with bincount."""
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=pa.array(sorted(stop))).to_numpy(
            zero_copy_only=False
        )
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        n_stop = np.bincount(parents, weights=is_stop, minlength=n).astype(np.int64)
        total_len = np.bincount(parents, weights=tok_len, minlength=n)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok),
                "n_stopwords": pa.array(n_stop),
                "stopword_ratio": pa.array(n_stop / n_tok, pa.float64()),
                "mean_token_len": pa.array(total_len / n_tok, pa.float64()),
            }
        )

    return ds.map_batches(q, batch_format="pyarrow")


DOC_QUALITY_SQL = """
WITH l AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS BIGINT) AS n_stopwords,
  CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stopword_ratio,
  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS mean_token_len
FROM l
"""


def dedup_exact(sf_dir: str):
    """Exact dedup by content: winner = min doc_id per identical text (A6)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.sha256(t.encode()).hexdigest() for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "h": pa.array(hashes, pa.string())}
        )

    agg = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="keeper_doc_id"), Count(alias_name="n_copies"))
    )
    return agg.select_columns(["keeper_doc_id", "n_copies"])


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS keeper_doc_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


def lang_source_profile(sf_dir: str):
    """Corpus profile per (lang, source): docs + char volume."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
    )
    return ds.groupby(["lang", "source"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    )


LANG_SOURCE_PROFILE_SQL = """
SELECT lang, source, count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
  min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY lang, source
"""


def doc_fingerprints(sf_dir: str):
    """63-bit content fingerprint per doc — the exact-dup / shard-routing
    key at scale.  md5-derived (top 8 digest bytes, sign bit cleared) so
    the DuckDB oracle recomputes it exactly:
    ('0x'||substr(md5(text),1,16))::UBIGINT."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        fps = [
            int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
            & 0x7FFF_FFFF_FFFF_FFFF
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(fps, pa.int64()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


DOC_FINGERPRINTS_SQL = """
SELECT doc_id,
  CAST(('0x' || substr(md5(text), 1, 16))::UBIGINT
       & 9223372036854775807::UBIGINT AS BIGINT) AS fingerprint
FROM documents
"""


# Marker-token profiles for n-gram-profile language ID.  The synthetic
# documents table shares one vocabulary across langs, so the profiles are
# illustrative; the operator shape (per-language profile scoring with a
# deterministic argmax) is the real thing, and the DuckDB oracle mirrors
# it exactly (substring-count arithmetic, alphabetical tie-break).
LANG_PROFILES = {
    "de": ("batch", "slow", "table"),
    "en": ("the", "fast", "row"),
    "fr": ("window", "sparse", "column"),
}


def lang_id_ngram(sf_dir: str):
    """Profile-based language ID: argmax of marker-token counts."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def lid(batch: pa.Table) -> pa.Table:
        """Vectorized: count_substring kernel per marker; argmax keeps
        the FIRST max == alphabetical tie-break."""
        import pyarrow.compute as pc

        texts = batch["text"].combine_chunks()
        langs = sorted(LANG_PROFILES)
        score_mat = np.stack(
            [
                sum(
                    pc.count_substring(texts, m).to_numpy(zero_copy_only=False)
                    for m in LANG_PROFILES[lang]
                ).astype(np.int64)
                for lang in langs
            ],
            axis=1,
        )
        preds = np.asarray(langs, dtype=object)[score_mat.argmax(axis=1)]
        cols = {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(preds.tolist(), pa.string()),
        }
        for i, lang in enumerate(langs):
            cols[f"score_{lang}"] = pa.array(score_mat[:, i], pa.int64())
        return pa.table(cols)

    return ds.map_batches(lid, batch_format="pyarrow")


def _sql_count(marker: str) -> str:
    return (
        f"(length(text) - length(replace(text, '{marker}', ''))) / {len(marker)}"
    )


LANG_ID_NGRAM_SQL = f"""
WITH scored AS (
  SELECT doc_id,
    CAST({' + '.join(_sql_count(m) for m in LANG_PROFILES['de'])} AS BIGINT) AS score_de,
    CAST({' + '.join(_sql_count(m) for m in LANG_PROFILES['en'])} AS BIGINT) AS score_en,
    CAST({' + '.join(_sql_count(m) for m in LANG_PROFILES['fr'])} AS BIGINT) AS score_fr
  FROM documents
)
SELECT doc_id,
  CASE
    WHEN score_de >= score_en AND score_de >= score_fr THEN 'de'
    WHEN score_en >= score_fr THEN 'en'
    ELSE 'fr'
  END AS lang_pred,
  score_de, score_en, score_fr
FROM scored
"""


# Curation thresholds (the composed training-data filter pipeline)
CURATE_MIN_TOKENS = 30
CURATE_MAX_STOPWORD_RATIO = 0.30


def curate_documents(sf_dir: str):
    """End-to-end corpus curation: exact dedup (keep min doc_id) ->
    language filter (en) -> quality gates (length + stopword ratio) ->
    per-source survivor stats.  The composed shape of a training-data
    cleaning pipeline, exactly mirrored in SQL.

    One pass computes hash + quality signals per batch (no row ever read
    twice); the dedup winner resolution is the only shuffle."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    stop = set(STOPWORDS)

    def signals(batch: pa.Table) -> pa.Table:
        """Token stats vectorized (split_pattern + bincount); only the
        content hash stays per-row (hashing is inherently per-doc)."""
        import pyarrow.compute as pc

        texts = batch["text"].combine_chunks()
        toks = pc.split_pattern(texts, " ")
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=pa.array(sorted(stop))).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(parents, weights=is_stop, minlength=batch.num_rows)
        keep_q = (n_tok >= CURATE_MIN_TOKENS) & (
            n_stop / n_tok <= CURATE_MAX_STOPWORD_RATIO
        )
        hs = [
            hashlib.sha256(t.encode()).hexdigest() for t in texts.to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": pa.array(hs, pa.string()),
                "lang": batch["lang"],
                "source": batch["source"],
                "n_tokens": pa.array(n_tok),
                "keep_q": pa.array(keep_q),
            }
        )

    sig = ds.map_batches(signals, batch_format="pyarrow")

    def winners_of_group(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        keep = int(ids.min())
        mask = pa.array(ids == keep)
        return g.filter(mask)

    survivors = (
        sig.groupby("h")
        .map_groups(winners_of_group, batch_format="pyarrow")
        .filter(lambda r: r["lang"] == "en" and r["keep_q"])
    )
    return survivors.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="sum_tokens"),
        Min("doc_id", alias_name="min_doc_id"),
    )


CURATE_DOCUMENTS_SQL = f"""
WITH sig AS (
  SELECT doc_id, text, lang, source,
    len(string_split(text, ' ')) AS n_tokens,
    CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
         AS DOUBLE) / len(string_split(text, ' ')) AS sw_ratio,
    min(doc_id) OVER (PARTITION BY text) AS winner
  FROM documents
)
SELECT source, count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
  min(doc_id) AS min_doc_id
FROM sig
WHERE doc_id = winner AND lang = 'en'
  AND n_tokens >= {CURATE_MIN_TOKENS} AND sw_ratio <= {CURATE_MAX_STOPWORD_RATIO}
GROUP BY source
"""


def top_docs_per_source(sf_dir: str, k: int = 3):
    """Grouped top-k: the k longest docs per source (n_chars DESC,
    doc_id ASC tie-break) — the per-group ranked-selection shape, done
    as a per-group partial top-k (no global sort)."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def topk_of_group(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        nc = g["n_chars"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((ids, -nc))[:k]
        out = g.take(pa.array(np.sort(sel)))
        order = np.lexsort(
            (
                out["doc_id"].to_numpy(zero_copy_only=False),
                -out["n_chars"].to_numpy(zero_copy_only=False),
            )
        )
        out = out.take(pa.array(order))
        return out.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        )

    return ds.groupby("source").map_groups(topk_of_group, batch_format="pyarrow")


TOP_DOCS_PER_SOURCE_SQL = """
SELECT doc_id, source, n_chars,
  CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
       AS BIGINT) AS rank
FROM documents
QUALIFY rank <= 3
"""


def source_length_quantiles(sf_dir: str):
    """Exact per-source n_chars quantiles (p50/p90, discrete lower
    method == DuckDB quantile_disc) + count."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def q_of_group(g: pa.Table) -> pa.Table:
        nc = np.sort(g["n_chars"].to_numpy(zero_copy_only=False))
        n = len(nc)

        def qd(p: float) -> int:
            # quantile_disc: value at ceil(p*n)-th row (1-based), i.e.
            # index ceil(p*n)-1 of the sorted array
            import math

            return int(nc[max(math.ceil(p * n) - 1, 0)])

        return pa.table(
            {
                "source": pa.array([g["source"][0].as_py()], pa.string()),
                "n_docs": pa.array([n], pa.int64()),
                "p50_chars": pa.array([qd(0.5)], pa.int64()),
                "p90_chars": pa.array([qd(0.9)], pa.int64()),
            }
        )

    return ds.groupby("source").map_groups(q_of_group, batch_format="pyarrow")


SOURCE_LENGTH_QUANTILES_SQL = """
SELECT source, count(*) AS n_docs,
  CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_chars,
  CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90_chars
FROM documents GROUP BY source
"""


# GPT-2-style pre-tokenizer shape, simplified to the RE2-portable core:
# letter runs, 1-3 digit chunks (BPE tokenizers split long numbers), and
# non-alnum punctuation runs.  Both sides of the oracle pair execute this
# EXACT pattern on RE2 (Arrow's count_substring_regex and DuckDB's
# regexp_extract_all are both RE2), so counts are engine-identical.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+"


def doc_bpe_tokens(sf_dir: str):
    """Per-doc BPE-ish token counts (the budget estimator a training-data
    pipeline runs before tokenizing 100 TB for real): whitespace-word
    count plus a GPT-2-pre-tokenizer-shaped regex count, fully vectorized
    — one RE2 pass per batch via ``pyarrow.compute``, no Python loop.

    Counts run over the headered form ``source || ': ' || text`` (a web
    corpus carries provenance headers into the token budget); the header's
    digits/punctuation also keep the two counts from being degenerate on
    the all-lowercase synthetic text."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    def counts(batch: pa.Table) -> pa.Table:
        txt = pc.binary_join_element_wise(
            batch["source"].combine_chunks().cast(pa.string()),
            batch["text"].combine_chunks(),
            ": ",
        )
        n_bpe = pc.count_substring_regex(txt, BPE_TOKEN_PATTERN).cast(pa.int64())
        n_ws = pc.list_value_length(pc.split_pattern(txt, " ")).cast(pa.int64())
        n_chars = pc.utf8_length(txt).cast(pa.int64())
        bpe_np = n_bpe.to_numpy(zero_copy_only=False).astype(np.float64)
        ws_np = n_ws.to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": n_bpe,
                "n_ws_tokens": n_ws,
                "n_chars": n_chars,
                # double division of exact ints: bit-identical across engines
                "bpe_per_word": pa.array(bpe_np / ws_np),
            }
        )

    return ds.map_batches(counts, batch_format="pyarrow")


DOC_BPE_TOKENS_SQL = f"""
WITH t AS (
  SELECT doc_id, source || ': ' || text AS txt FROM documents
)
SELECT doc_id,
  CAST(length(regexp_extract_all(txt, '{BPE_TOKEN_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
  CAST(length(string_split(txt, ' ')) AS BIGINT) AS n_ws_tokens,
  CAST(length(txt) AS BIGINT) AS n_chars,
  CAST(length(regexp_extract_all(txt, '{BPE_TOKEN_PATTERN}')) AS DOUBLE)
    / CAST(length(string_split(txt, ' ')) AS DOUBLE) AS bpe_per_word
FROM t
"""


def decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: flag training docs whose text contains
    any benchmark phrase — the leakage gate every eval-aware training
    pipeline runs before export.  The benchmark set here is the distinct
    words of ``part.p_name`` (dictionary-sized small side, read once on
    the driver and broadcast via ``ray.put``); per batch, one vectorized
    ``pyarrow.compute.match_substring`` pass per phrase accumulates the
    distinct-phrase hit count (exact LIKE/contains semantics — a trie
    findall would miss overlapping phrases).  At 10^12 docs the phrase
    loop (P kernel passes per batch) is the documented valve: compile the
    set into one Aho-Corasick/RE2-set automaton per actor in __init__;
    the broadcast and output shapes are unchanged."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    names = sorted(
        {
            w
            for name in pq.read_table(
                f"{sf_dir}/part.parquet", columns=["p_name"]
            )["p_name"].to_pylist()
            for w in name.split(" ")
            if w
        }
    )
    names_ref = ray.put(names)

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def flag(batch: pa.Table) -> pa.Table:
        phrases = ray.get(names_ref)
        txt = batch["text"].combine_chunks()
        n = np.zeros(len(txt), dtype=np.int64)
        for p in phrases:
            n += pc.match_substring(txt, p).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_benchmark_hits": pa.array(n, pa.int64()),
                "contaminated": pa.array(
                    (n > 0).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


DECONTAMINATE_DOCS_SQL = """
WITH bw AS (
  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part
)
SELECT d.doc_id,
  CAST((SELECT COUNT(*) FROM bw WHERE bw.w != ''
        AND contains(d.text, bw.w)) AS BIGINT) AS n_benchmark_hits,
  CAST((SELECT COUNT(*) FROM bw WHERE bw.w != ''
        AND contains(d.text, bw.w)) > 0 AS BIGINT) AS contaminated
FROM documents d
"""


PACK_BUDGET = 2048      # tokens per training chunk
PACK_BUCKETS = 64       # scan buckets (the distributed-prefix-sum grain)


def pack_training_chunks(sf_dir: str, budget: int = PACK_BUDGET):
    """Sequence packing: assign every doc (in global doc_id order) to a
    fixed token-budget training chunk — the step that turns a curated
    corpus into trainer-shaped fixed-length samples.  A doc's chunk is
    ``chunk_id = start // budget`` where ``start`` is the EXCLUSIVE
    cumulative token count before it; ``chunk_offset = start % budget``.

    This is a distributed prefix-sum (classic three-phase scan), not a
    driver loop:
      1. one pass computes (doc_id, n_tokens, bucket) — bucket is an
         ORDER-PRESERVING doc_id value range, so bucket i's ids all
         precede bucket i+1's; the narrow projection (2 ints/doc) is
         materialized once so the text column is read exactly once
      2. per-bucket token sums (a B-row aggregate) are exclusive-scanned
         on the driver — B = PACK_BUCKETS values, never the data
      3. ``groupby(bucket).map_groups`` does the local sort + cumsum,
         offset by its bucket's scanned start
    Only (doc_id, n_tokens) rows cross the exchange; at 10^12 docs the
    valve is raising PACK_BUCKETS (per-group work is corpus/B rows) and
    quantile bucket boundaries if doc_ids cluster (hash/sequential ids
    are near-uniform; the range split assumes that, documented here).
    Token counts reuse doc_bpe_tokens' vectorized BPE-ish regex over the
    headered text (one RE2 pass per batch)."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    def counts(batch: pa.Table) -> pa.Table:
        txt = pc.binary_join_element_wise(
            batch["source"].combine_chunks().cast(pa.string()),
            batch["text"].combine_chunks(),
            ": ",
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pc.count_substring_regex(
                    txt, BPE_TOKEN_PATTERN
                ).cast(pa.int64()),
            }
        )

    # narrow (16 B/doc) projection, read-once then consumed by both the
    # min/max probe, the bucket-sum pass and the per-bucket scan
    narrow = ds.map_batches(counts, batch_format="pyarrow").materialize()

    mm = narrow.aggregate(Min("doc_id"), Max("doc_id"))
    lo, hi = int(mm["min(doc_id)"]), int(mm["max(doc_id)"])
    span = max(hi - lo + 1, 1)
    # order-preserving bucket = high bits of (doc_id - lo): a SHIFT, not
    # a multiply, so full-range int64 hash ids cannot overflow; yields at
    # most PACK_BUCKETS buckets (possibly fewer for narrow spans)
    shift = max(0, (span - 1).bit_length() - PACK_BUCKETS.bit_length() + 1)

    def with_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        b = (ids - lo) >> shift
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    bucketed = narrow.map_batches(with_bucket, batch_format="pyarrow")

    # phase 2: B-row bucket sums -> exclusive scan on the driver
    sums = bucketed.groupby("bucket").aggregate(Sum("n_tokens")).to_pandas()
    full = np.zeros(PACK_BUCKETS, dtype=np.int64)
    full[sums["bucket"].to_numpy(np.int64)] = sums["sum(n_tokens)"].to_numpy(
        np.int64
    )
    starts = np.cumsum(full) - full  # exclusive scan, empty buckets = 0-width
    starts_ref = ray.put(starts)

    # phase 3: local sort + cumsum per bucket, offset by the scan
    def local_scan(group: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(starts_ref)
        g = group.sort_values("doc_id")
        n = g["n_tokens"].to_numpy(np.int64)
        start = st[int(g["bucket"].iloc[0])] + np.cumsum(n) - n
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "n_tokens": n,
                "chunk_id": start // budget,
                "chunk_offset": start % budget,
            }
        )

    return bucketed.groupby("bucket").map_groups(local_scan)


PACK_TRAINING_CHUNKS_SQL = f"""
WITH t AS (
  SELECT doc_id,
    CAST(length(regexp_extract_all(source || ': ' || text,
         '{BPE_TOKEN_PATTERN}')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
    SUM(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS start
  FROM t
)
SELECT doc_id, n_tokens,
  CAST(start // {PACK_BUDGET} AS BIGINT) AS chunk_id,
  CAST(start % {PACK_BUDGET} AS BIGINT) AS chunk_offset
FROM c
"""


def tfidf_top_terms(sf_dir: str, k: int = 5):
    """Per-doc top-k terms by tf-idf — the keyword extractor of a
    training-data pipeline (topic tagging / near-dup explanations).

    Two streaming passes, one broadcast, no per-doc shuffle: pass 1 is
    the df aggregate (vocabulary-sized result — the classic "small side"
    — shipped to every map task once via ``ray.put``); pass 2 scores
    each doc locally and emits only its top k rows, so the output is
    k*N rows and nothing else ever materializes.  Scores are rounded to
    6 decimals and ranked with (score DESC, term ASC) so the ordering is
    engine-exact vs the SQL window-function oracle."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_docs = ds.count()

    df_pdf = term_doc_freq(sf_dir).to_pandas()
    df_ref = ray.put(dict(zip(df_pdf["term"], df_pdf["df"].astype(np.int64))))

    def topk(batch: pa.Table) -> pa.Table:
        """Fully vectorized: (doc, term, tf) triples via dictionary
        encoding, scores in one numpy expression, per-doc top-k via a
        single lexsort + segment-rank — the only Python loop is over the
        batch-local VOCABULARY (df lookup + term sort ranks), not rows.
        Rounding is half-to-even at 1e-6 exactly like ``round``/DuckDB
        on these magnitudes (tie cases are measure-zero log products)."""
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tfidf_r": pa.array([], pa.float64()),
                }
            )
        df_map = ray.get(df_ref)
        doc_idx, codes, tfs, dictionary = _doc_term_tfs(batch)
        vocab_terms = dictionary.to_pylist()
        df_of_code = np.array([df_map[t] for t in vocab_terms], dtype=np.float64)
        # rank of each dictionary code in ascending term order (tie-break)
        term_rank = np.empty(len(vocab_terms), dtype=np.int64)
        term_rank[np.argsort(np.array(vocab_terms, dtype=object))] = np.arange(
            len(vocab_terms)
        )
        score = np.round(tfs * np.log(n_docs / df_of_code[codes]), 6)
        order = np.lexsort((term_rank[codes], -score, doc_idx))
        d_sorted = doc_idx[order]
        starts = np.r_[0, np.flatnonzero(np.diff(d_sorted)) + 1]
        seg_start = np.repeat(starts, np.diff(np.r_[starts, len(d_sorted)]))
        rank = np.arange(len(d_sorted)) - seg_start + 1
        keep = order[rank <= k]
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[doc_idx[keep]], pa.int64()),
                "rank": pa.array(rank[rank <= k], pa.int64()),
                "term": dictionary.take(pa.array(codes[keep])),
                "tfidf_r": pa.array(score[keep], pa.float64()),
            }
        )

    return ds.map_batches(topk, batch_format="pyarrow")


TFIDF_TOP_TERMS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tfc AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), dfc AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
), n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tfc.doc_id, tfc.term,
    round(tfc.tf * ln(CAST(n.n AS DOUBLE) / CAST(dfc.df AS DOUBLE)), 6)
      AS tfidf_r
  FROM tfc JOIN dfc USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tfidf_r,
    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_r DESC, term)
      AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tfidf_r
FROM ranked WHERE rank <= 5
"""


SAMPLE_PCT = 10


def sample_documents(sf_dir: str, pct: int = SAMPLE_PCT):
    """Deterministic ~pct% document sample — the repeatable eval/holdout
    carve-out every training-data pipeline needs.  The sample key is
    md5(doc_id) (content-independent, so near-dup docs don't co-select),
    a pure per-row filter: streams, shuffles nothing, and re-runs —
    including partial re-runs after a resume — always pick the same
    rows.  md5 keeps the DuckDB oracle bit-exact."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "lang", "n_chars"],
    )

    def pick(batch: pa.Table) -> pa.Table:
        from myaku_ray.functions.hashkit import md5_u64

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = (md5_u64(ids, hexchars=8) % 100) < pct
        return batch.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow")


SAMPLE_DOCUMENTS_SQL = f"""
SELECT doc_id, source, lang, n_chars FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
      < {SAMPLE_PCT}
"""


HH_TOPK = 10
HH_CAPACITY = 4096  # per-batch candidate budget (the 1/C frequency bar)


def top_terms_heavy_hitters(sf_dir: str, k: int = HH_TOPK, cap: int = HH_CAPACITY):
    """Exact corpus top-k terms by total tf via a certified heavy-hitters
    sketch — the scale path for "top-k frequent terms" when the full
    ``groupby(term)`` exchange is the bottleneck (streaming-top-k
    literature's two-pass design).

    Pass 1 keeps, per batch, only terms with tf >= ceil(batch_tokens/cap)
    (a term with global frequency > 1/cap MUST clear that bar in at least
    one batch), plus each batch's bar as the upper bound on anything it
    dropped.  Pass 2 exactly recounts ONLY the candidate union (broadcast
    set, map-side filter, vocabulary-sized groupby).  A certificate then
    checks that no non-candidate could beat rank k (sum of per-batch
    bars < k-th candidate count); if the corpus is so flat the bound
    fails, fall back to the exact full aggregate — output is therefore
    EXACT in all cases (and DuckDB-oracled), the sketch only bounds the
    shuffle size."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    _EMPTY = pa.table(
        {
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "bar": pa.array([], pa.int64()),
            "is_summary": pa.array([], pa.bool_()),
        }
    )

    def batch_candidates(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        _, codes, tfs, dictionary = _doc_term_tfs(batch)
        # batch-level term totals
        vocab = max(len(dictionary), 1)
        tot = np.zeros(vocab, dtype=np.int64)
        np.add.at(tot, codes, tfs)
        n_tokens = int(tfs.sum())
        bar = max(-(-n_tokens // cap), 1)  # ceil(n_tokens / cap)
        keep = np.flatnonzero(tot >= bar)
        # one summary row per batch carries its bar, so the driver can
        # form the exact certificate bound even for batches that emitted
        # zero candidates
        terms = dictionary.take(pa.array(keep)).to_pylist() + [""]
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(np.append(tot[keep], 0)),
                "bar": pa.array(
                    np.full(len(keep) + 1, bar, dtype=np.int64)
                ),
                "is_summary": pa.array(
                    [False] * len(keep) + [True]
                ),
            }
        )

    parts = ds.map_batches(batch_candidates, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"term": pd.Series(dtype=object), "total_tf": pd.Series(dtype=np.int64)}
        )
    # a non-candidate was under the bar in EVERY batch, so its true
    # count is < sum of per-batch bars — the certificate bound
    bound = int(parts.loc[parts["is_summary"], "bar"].sum())
    cand = set(parts.loc[~parts["is_summary"], "term"])

    def _exact_fallback() -> pd.DataFrame:
        full = (
            term_doc_freq(sf_dir)
            .to_pandas()[["term", "total_tf"]]
            .sort_values(["total_tf", "term"], ascending=[False, True])
            .reset_index(drop=True)
        )
        return full.head(k).reset_index(drop=True)

    if not cand:
        # the bar was so high no candidate cleared it anywhere — nothing
        # to certify, run the exact aggregate
        return _exact_fallback()
    cand_ref = ray.put(cand)

    def exact_counts(batch: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        if batch.num_rows == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "tf": pa.array([], pa.int64())}
            )
        _, codes, tfs, dictionary = _doc_term_tfs(batch)
        vocab = max(len(dictionary), 1)
        tot = np.zeros(vocab, dtype=np.int64)
        np.add.at(tot, codes, tfs)
        mask = np.array([t in cs for t in dictionary.to_pylist()], dtype=bool)
        keep = np.flatnonzero(mask & (tot > 0))
        return pa.table(
            {"term": dictionary.take(pa.array(keep)), "tf": pa.array(tot[keep])}
        )

    agg = (
        ds.map_batches(exact_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf", alias_name="total_tf"))
        .to_pandas()
        .sort_values(["total_tf", "term"], ascending=[False, True])
        .reset_index(drop=True)
    )
    top = agg.head(k).reset_index(drop=True)
    # certificate: the bound must not reach rank k's count (and if fewer
    # than k candidates survived, the tail is uncertified by definition)
    if len(top) < k or bound >= int(top["total_tf"].iloc[-1]):
        # flat corpus: the sketch cannot certify — exact full aggregate
        return _exact_fallback()
    return top[["term", "total_tf"]]


TOP_TERMS_HH_SQL = f"""
WITH tf AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT term, count(*) AS total_tf
FROM tf GROUP BY term
ORDER BY total_tf DESC, term
LIMIT {HH_TOPK}
"""


CURATE_EXPORT_DIR = "/tmp/myaku_ray_curated"


def curate_export(sf_dir: str, out_dir: str | None = None):
    """Materialize the curated corpus: the same dedup + lang + quality
    gates as ``curate_documents``, but writing the SURVIVOR ROWS to
    hive-partitioned parquet (``source=<s>/``) — the "write the cleaned
    training set" step, with the properties the 100 TB run needs:
    partitioned output (a failed run resumes per partition), an
    idempotency marker keyed on the input row count (re-runs skip the
    write entirely), a manifest derived FROM THE WRITTEN FILES (so the
    checkable output proves the sink, not just the plan), and a
    TWO-PHASE dedup so the text payload never crosses a shuffle: phase 1
    exchanges only (sha256, doc_id) and broadcasts the loser ids, phase
    2 streams text read -> map-side gates -> partitioned sink.  The
    manifest (source, n_docs, sum_tokens) is DuckDB-oracled."""
    import glob as _glob
    import json as _json
    import os as _os

    import pyarrow.parquet as _pq

    out_dir = out_dir or CURATE_EXPORT_DIR
    src = f"{sf_dir}/documents.parquet"
    src_files = (
        sorted(_glob.glob(_os.path.join(src, "**", "*.parquet"), recursive=True))
        if _os.path.isdir(src)
        else [src]
    )
    n_input = sum(_pq.read_metadata(f).num_rows for f in src_files)
    marker = _os.path.join(out_dir, "_SUCCESS")
    # The signature must invalidate on CONTENT change, not just row count:
    # a regenerated documents.parquet with the same cardinality would
    # otherwise serve a stale export.  (size, mtime_ns) per file catches
    # in-place rewrites without reading any data.
    stat_sig = [
        [_os.path.basename(f), _os.path.getsize(f), _os.stat(f).st_mtime_ns]
        for f in src_files
    ]
    want_sig = {"src": src, "n_input": n_input, "files": stat_sig}
    have = None
    if _os.path.exists(marker):
        try:
            have = _json.loads(open(marker).read())
        except Exception:
            have = None
    if have != want_sig:
        import shutil as _shutil

        _shutil.rmtree(out_dir, ignore_errors=True)
        # phase 1 — dedup losers with a HASH-ONLY shuffle: only
        # (sha256, doc_id) crosses the exchange, never the text payload,
        # and the driver holds just the LOSER ids (duplicate mass, small
        # unless the corpus is mostly copies) — the same
        # payload-never-moves design as the flagship build's dedup stage
        ds_h = rd.read_parquet(src, columns=["doc_id", "text"])

        def hash_rows(batch: pa.Table) -> pa.Table:
            hs = [
                hashlib.sha256(t.encode()).hexdigest()
                for t in batch["text"].to_pylist()
            ]
            return pa.table(
                {"doc_id": batch["doc_id"], "h": pa.array(hs, pa.string())}
            )

        def losers_of_group(g: pa.Table) -> pa.Table:
            ids = g["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"doc_id": pa.array(np.sort(ids[ids != ids.min()]))}
            )

        loser_tbl = (
            ds_h.map_batches(hash_rows, batch_format="pyarrow")
            .groupby("h")
            .map_groups(losers_of_group, batch_format="pyarrow")
            .to_arrow_refs()
        )
        import ray as _ray

        losers = np.sort(
            np.concatenate(
                [
                    t["doc_id"].to_numpy(zero_copy_only=False)
                    for t in _ray.get(loser_tbl)
                    if t.num_rows
                ]
                or [np.empty(0, dtype=np.int64)]
            )
        )
        losers_ref = _ray.put(losers)

        # phase 2 — map-side gates + write: drop losers via broadcast
        # np.isin, apply lang/quality gates, write partitioned; the text
        # column streams straight from the read to the sink
        ds = rd.read_parquet(src, columns=["doc_id", "text", "lang", "source"])
        stop = set(STOPWORDS)

        def gate(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            larr = _ray.get(losers_ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(ids, larr)
            keep &= (
                pc.equal(batch["lang"], "en").to_numpy(zero_copy_only=False)
            )
            texts = batch["text"].combine_chunks()
            toks = pc.split_pattern(texts, " ")
            n_tok = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            flat = pc.list_flatten(toks)
            parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
            is_stop = pc.is_in(
                flat, value_set=pa.array(sorted(stop))
            ).to_numpy(zero_copy_only=False)
            n_stop = np.bincount(parents, weights=is_stop, minlength=batch.num_rows)
            keep &= (n_tok >= CURATE_MIN_TOKENS) & (
                n_stop / n_tok <= CURATE_MAX_STOPWORD_RATIO
            )
            out = pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "text": batch["text"],
                    "source": batch["source"],
                    "n_tokens": pa.array(n_tok),
                }
            )
            return out.filter(pa.array(keep))

        ds.map_batches(gate, batch_format="pyarrow").write_parquet(
            out_dir, partition_cols=["source"]
        )
        with open(marker, "w") as f:
            f.write(_json.dumps(want_sig))

    # manifest FROM the written files — proves the sink contents
    manifest = (
        rd.read_parquet(out_dir)
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="sum_tokens"),
        )
    )
    return manifest


CURATE_EXPORT_SQL = f"""
WITH sig AS (
  SELECT doc_id, text, lang, source,
    len(string_split(text, ' ')) AS n_tokens,
    CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
         AS DOUBLE) / len(string_split(text, ' ')) AS sw_ratio,
    min(doc_id) OVER (PARTITION BY text) AS winner
  FROM documents
)
SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM sig
WHERE doc_id = winner AND lang = 'en'
  AND n_tokens >= {CURATE_MIN_TOKENS} AND sw_ratio <= {CURATE_MAX_STOPWORD_RATIO}
GROUP BY source
"""


CMS_DEPTH = 4
CMS_WIDTH = 1024


BLOOM_M = 16384   # filter bits
BLOOM_K = 4       # hashes per key


def bloom_doc_filter(sf_dir: str, m: int = BLOOM_M, k: int = BLOOM_K):
    """Bloom-filter build over doc ids — the membership sketch a crawl /
    dedup tier keeps for 'have we seen this key?' at 10^12 scale (URL
    seen-sets, shard routing).  Map side: each batch sets its keys' k
    bit positions in a LOCAL m-bit bitmap and emits the positions it
    set (result-bounded: <= m rows per batch); merge is a distinct-union
    — pure OR semantics, so the filter state is EXACTLY
    order-independent and the driver holds only bit positions, never
    keys.  Hashing is md5-derived over the string ``"<doc_id>:<i>"``
    (NOT integer ``doc_id*k+i`` arithmetic, which silently wraps in
    int64 for 63-bit url-hash ids and would both break the no-false-
    negative guarantee and overflow the oracle's BIGINT), so the DuckDB
    oracle recomputes the IDENTICAL filter state bit for bit — same
    oracle style as the HLL registers and CMS cells.  Output: the
    sorted set-bit positions."""
    import pyarrow.compute as pc

    from myaku_ray.functions.hashkit import md5_u64_str

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        id_str = pc.cast(batch["doc_id"].combine_chunks(), pa.string())
        bits = np.zeros(m, dtype=bool)
        for i in range(k):
            keys = pc.binary_join_element_wise(id_str, str(i), ":")
            bits[md5_u64_str(keys) % m] = True
        return pa.table(
            {"bit": pa.array(np.flatnonzero(bits).astype(np.int64))}
        )

    out = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    bits = np.unique(out["bit"].to_numpy(np.int64))
    return pd.DataFrame({"bit": bits})


def bloom_contains(bits: "np.ndarray", doc_id: int, m: int = BLOOM_M,
                   k: int = BLOOM_K) -> bool:
    """Membership probe against a built filter (sorted set-bit array):
    true iff ALL k positions are set — no false negatives; false-positive
    rate ~= (1 - e^(-k*n/m))^k."""
    from myaku_ray.functions.hashkit import md5_u64_str

    if len(bits) == 0:
        return False
    keys = pa.array([f"{int(doc_id)}:{i}" for i in range(k)], pa.string())
    pos = md5_u64_str(keys) % m
    idx = np.searchsorted(bits, pos.astype(np.int64))
    idx = np.clip(idx, 0, len(bits) - 1)
    return bool((bits[idx] == pos.astype(np.int64)).all())


BLOOM_DOC_FILTER_SQL = f"""
WITH h AS (
  SELECT DISTINCT CAST(
    (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                         CAST(t.i AS VARCHAR)), 1, 16))::UBIGINT
     % {BLOOM_M}) AS BIGINT) AS bit
  FROM documents d, range({BLOOM_K}) t(i)
)
SELECT bit FROM h ORDER BY bit
"""


def cms_term_counts(sf_dir: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """Count-Min sketch of corpus term frequencies — the mergeable
    frequency sketch (point-query upper bounds over unbounded vocab in
    O(d*w) memory), built so the SKETCH ITSELF is exactly checkable:
    cell hashing is md5-derived integer math, so the DuckDB oracle
    recomputes the identical (row, col, count) matrix and the driver
    hash-matches it.

    Distributed shape: per-batch partial matrices (np.add.at over the
    vectorized (doc, term, tf) triples), merged by cell-wise SUM — what
    crosses the cluster is O(d*w) cells per batch, never term rows.
    The standard CMS guarantees (estimate >= truth; error <= e*N/w with
    prob 1-e^-d) are pytest-gated against exact counts."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "row_id": pa.array([], pa.int64()),
                    "col_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        _, codes, tfs, dictionary = _doc_term_tfs(batch)
        vocab = len(dictionary)
        # per-term totals within the batch (the add.at input)
        tot = np.zeros(vocab, dtype=np.int64)
        np.add.at(tot, codes, tfs)
        terms = dictionary.to_pylist()
        rows_out, cols_out, ns_out = [], [], []
        for j in range(depth):
            cols = np.fromiter(
                (
                    int(hashlib.md5(f"{j}:{t}".encode()).hexdigest()[:8], 16)
                    % width
                    for t in terms
                ),
                dtype=np.int64,
                count=vocab,
            )
            mat = np.zeros(width, dtype=np.int64)
            np.add.at(mat, cols, tot)
            keep = np.flatnonzero(mat > 0)
            rows_out.append(np.full(len(keep), j, dtype=np.int64))
            cols_out.append(keep)
            ns_out.append(mat[keep])
        return pa.table(
            {
                "row_id": pa.array(np.concatenate(rows_out)),
                "col_id": pa.array(np.concatenate(cols_out)),
                "n": pa.array(np.concatenate(ns_out)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["row_id", "col_id"])
        .aggregate(Sum("n", alias_name="n"))
    )


CMS_TERM_COUNTS_SQL = f"""
WITH tf AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
), cells AS (
  SELECT CAST(j AS BIGINT) AS row_id,
    CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || term), 1, 8))::UBIGINT
         % {CMS_WIDTH} AS BIGINT) AS col_id
  FROM tf, range({CMS_DEPTH}) t(j)
)
SELECT row_id, col_id, count(*) AS n
FROM cells GROUP BY row_id, col_id
"""


def cms_point_query(cells, term: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> int:
    """CMS estimate for one term: min over rows of its cell counts."""
    import pandas as _pd

    if not isinstance(cells, _pd.DataFrame):
        cells = cells.to_pandas()
    lut = {(int(r), int(c)): int(n) for r, c, n in
           zip(cells["row_id"], cells["col_id"], cells["n"])}
    est = None
    for j in range(depth):
        col = int(hashlib.md5(f"{j}:{term}".encode()).hexdigest()[:8], 16) % width
        v = lut.get((j, col), 0)
        est = v if est is None else min(est, v)
    return int(est or 0)


def doc_unigram_logppl(sf_dir: str):
    """Per-doc unigram-LM negative mean log-likelihood (log-perplexity)
    — the classic corpus-LM quality filter (docs far from the corpus
    distribution score high).  Two streaming passes: the unigram model
    (term -> total tf) aggregates once and broadcasts (vocabulary-sized
    small side via ``ray.put``); scoring is fully vectorized — per-batch
    (doc, term, tf) triples, one ``np.log`` over the probability array,
    per-doc segment sums via ``bincount``.  Rounded to 6 decimals so
    summation-order float noise (~1e-13 relative) cannot flip the
    DuckDB comparison."""
    tdf = term_doc_freq(sf_dir).to_pandas()
    total = int(tdf["total_tf"].sum())
    p_ref = ray.put(
        dict(zip(tdf["term"], tdf["total_tf"].astype(np.int64)))
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "logppl_r": pa.array([], pa.float64()),
                }
            )
        tf_map = ray.get(p_ref)
        doc_idx, codes, tfs, dictionary = _doc_term_tfs(batch)
        logp = np.log(
            np.array(
                [tf_map[t] for t in dictionary.to_pylist()], dtype=np.float64
            )
            / total
        )
        contrib = tfs * logp[codes]
        n = batch.num_rows
        ll = np.bincount(doc_idx, weights=contrib, minlength=n)
        n_tok = np.bincount(doc_idx, weights=tfs, minlength=n)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "logppl_r": pa.array(np.round(-ll / n_tok, 6)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


DOC_UNIGRAM_LOGPPL_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tot AS (
  SELECT term, count(*) AS c FROM tok GROUP BY term
), n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM tok)
SELECT tok.doc_id,
  round(-sum(ln(CAST(tot.c AS DOUBLE) / n.nn)) / count(*), 6) AS logppl_r
FROM tok JOIN tot USING (term) CROSS JOIN n
GROUP BY tok.doc_id
"""


def doc_ppl_buckets(sf_dir: str):
    """CCNet-style per-language perplexity buckets (Wenzek et al. 2020):
    each language's docs split into head / middle / tail terciles by
    unigram-LM log-perplexity — the classic quality-stratification step
    before sampling training data mostly from the head.

    Scale shape (the ``doc_length_band`` idiom generalized to a float
    score): ONE streaming pass scores every doc (corpus LM broadcast,
    the ``doc_unigram_logppl`` kernel) and reduces per-batch
    ``(lang, logppl_milli)`` histogram partials — logppl in
    milli-units is RANGE-bounded (~0..20k for any real corpus), so the
    driver merge is (langs x value-range)-sized regardless of doc
    count, and the tercile cuts, bucket counts AND per-bucket min/max
    all come from that one histogram: no sort, no second scan, no
    doc-count-sized driver state.  Conventions pinned to DuckDB:
    ``logppl_milli = floor(logppl_r * 1000 + 0.5)`` (the module's
    exact-cents idiom over the already-oracle-equal 6-decimal score)
    and per-lang tercile cut = ascending order statistic at
    ``ceil(q*n)-1`` (quantile_disc).  Bucket = value-threshold compare
    against the cuts, so ties land identically on both sides."""
    tdf = term_doc_freq(sf_dir).to_pandas()
    total = int(tdf["total_tf"].sum())
    p_ref = ray.put(
        dict(zip(tdf["term"], tdf["total_tf"].astype(np.int64)))
    )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "milli": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        tf_map = ray.get(p_ref)
        doc_idx, codes, tfs, dictionary = _doc_term_tfs(batch)
        logp = np.log(
            np.array(
                [tf_map[t] for t in dictionary.to_pylist()], dtype=np.float64
            )
            / total
        )
        contrib = tfs * logp[codes]
        n = batch.num_rows
        ll = np.bincount(doc_idx, weights=contrib, minlength=n)
        n_tok = np.bincount(doc_idx, weights=tfs, minlength=n)
        logppl_r = np.round(-ll / n_tok, 6)
        milli = np.floor(logppl_r * 1000.0 + 0.5).astype(np.int64)
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "milli": milli,
                "n": np.ones(n, dtype=np.int64),
            }
        )
        g = df.groupby(["lang", "milli"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    import math

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["lang", "milli"], as_index=False)["n"]
        .sum()
    )
    rows = []
    for lang, sub in hist.groupby("lang", sort=True):
        sub = sub.sort_values("milli")
        vals = sub["milli"].to_numpy()
        cnts = sub["n"].to_numpy()
        cum = np.cumsum(cnts)
        n_docs = int(cum[-1])
        cuts = []
        for q_num in (1, 2):
            rank = max(0, math.ceil(q_num * n_docs / 3) - 1)
            cuts.append(int(vals[np.searchsorted(cum, rank + 1)]))
        t1, t2 = cuts
        masks = {
            "head": vals <= t1,
            "middle": (vals > t1) & (vals <= t2),
            "tail": vals > t2,
        }
        for bucket in ("head", "middle", "tail"):
            m = masks[bucket]
            if not m.any():
                continue
            rows.append(
                (
                    lang,
                    bucket,
                    int(cnts[m].sum()),
                    int(vals[m].min()),
                    int(vals[m].max()),
                )
            )
    out = pd.DataFrame(
        rows, columns=["lang", "bucket", "n_docs", "min_milli", "max_milli"]
    )
    return out.sort_values(["lang", "bucket"]).reset_index(drop=True)


DOC_PPL_BUCKETS_SQL = f"""
WITH l AS ({DOC_UNIGRAM_LOGPPL_SQL}),
j AS (
  SELECT d.lang,
    CAST(floor(l.logppl_r * 1000.0 + 0.5) AS BIGINT) AS milli
  FROM l JOIN documents d USING (doc_id)
), cuts AS (
  SELECT lang,
    quantile_disc(milli, 1.0/3.0) AS t1,
    quantile_disc(milli, 2.0/3.0) AS t2
  FROM j GROUP BY lang
)
SELECT j.lang,
  CASE WHEN j.milli <= c.t1 THEN 'head'
       WHEN j.milli <= c.t2 THEN 'middle'
       ELSE 'tail' END AS bucket,
  count(*)::BIGINT AS n_docs,
  min(j.milli) AS min_milli,
  max(j.milli) AS max_milli
FROM j JOIN cuts c USING (lang)
GROUP BY j.lang, bucket
ORDER BY j.lang, bucket
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition signals: the quality-filter family every
# LLM-curation pipeline runs (Rae et al. 2021 §A1.1 — fraction of the doc
# made of its top token / of repeated n-grams).  Pure per-doc map, no
# shuffle; exact integer ratios so the DuckDB oracle matches bit-for-bit.
# ---------------------------------------------------------------------------


def doc_repetition_stats(sf_dir: str):
    """Per-doc repetition profile: n_tokens, top-token fraction, fraction
    of trigram occurrences whose trigram repeats within the doc, distinct
    fraction.  Vectorized: one split per batch; per-doc trigram counting
    by one lexsort over (doc, c0, c1, c2) composite rows."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def stats(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        if nrows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "top_token_frac_r": pa.array([], pa.float64()),
                    "dup_trigram_frac_r": pa.array([], pa.float64()),
                    "distinct_frac_r": pa.array([], pa.float64()),
                }
            )
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        n_tok = n_tok.astype(np.int64)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        enc = pc.list_flatten(toks).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = max(len(enc.dictionary), 1)
        # unigram tf -> per-doc max and distinct count
        uniq, tfs = np.unique(parents * vocab + codes, return_counts=True)
        docs_of_uniq = uniq // vocab
        top_tf = np.zeros(nrows, dtype=np.int64)
        np.maximum.at(top_tf, docs_of_uniq, tfs)
        n_dis = np.bincount(docs_of_uniq, minlength=nrows)
        # trigram occurrence counts: composite (doc, c0, c1, c2) rows at
        # token positions whose 3-window stays within one doc
        ok = np.flatnonzero(
            (parents[:-2] == parents[2:]) if len(parents) > 2 else []
        )
        dup_tri = np.zeros(nrows, dtype=np.int64)
        n_tri = np.maximum(n_tok - 2, 0)
        if len(ok):
            comp = np.stack(
                [parents[ok], codes[ok], codes[ok + 1], codes[ok + 2]],
                axis=1,
            )
            order = np.lexsort(
                (comp[:, 3], comp[:, 2], comp[:, 1], comp[:, 0])
            )
            s = comp[order]
            new = np.empty(len(s), dtype=bool)
            new[0] = True
            new[1:] = (s[1:] != s[:-1]).any(axis=1)
            firsts = np.flatnonzero(new)
            cnts = np.diff(np.append(firsts, len(s)))
            rep = np.repeat(cnts, cnts)  # per-occurrence group size
            dup_mask = rep >= 2
            np.add.at(dup_tri, s[dup_mask, 0], 1)
        safe_tok = np.maximum(n_tok, 1)
        safe_tri = np.maximum(n_tri, 1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok),
                "top_token_frac_r": pa.array(
                    np.round(top_tf / safe_tok, 6)
                ),
                "dup_trigram_frac_r": pa.array(
                    np.round(dup_tri / safe_tri, 6)
                ),
                "distinct_frac_r": pa.array(np.round(n_dis / safe_tok, 6)),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


DOC_REPETITION_STATS_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
tf AS (
  SELECT doc_id, max(c) AS top_tf, count(*) AS n_dis FROM (
    SELECT doc_id, term, count(*) AS c FROM (
      SELECT doc_id, unnest(w) AS term FROM toks
    ) GROUP BY doc_id, term
  ) GROUP BY doc_id
),
tric AS (
  SELECT doc_id, g, count(*) AS c FROM (
    SELECT doc_id, unnest(list_transform(
        generate_series(1, greatest(len(w) - 2, 0)),
        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
    FROM toks
  ) GROUP BY doc_id, g
),
tria AS (
  SELECT doc_id,
    sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_tri
  FROM tric GROUP BY doc_id
)
SELECT t.doc_id,
  CAST(len(t.w) AS BIGINT) AS n_tokens,
  round(CAST(tf.top_tf AS DOUBLE) / greatest(len(t.w), 1), 6)
    AS top_token_frac_r,
  round(CAST(coalesce(tria.dup_tri, 0) AS DOUBLE)
        / greatest(len(t.w) - 2, 1), 6) AS dup_trigram_frac_r,
  round(CAST(tf.n_dis AS DOUBLE) / greatest(len(t.w), 1), 6)
    AS distinct_frac_r
FROM toks t
JOIN tf USING (doc_id)
LEFT JOIN tria USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Balanced (stratified) downsampling across sources: two-phase — a
# source-count aggregate (group-count rows only) broadcast to a pure
# per-row md5-threshold filter, so the payload never shuffles and
# re-runs are deterministic.  The per-source keep-rate equalizes
# expected counts to the smallest source.
# ---------------------------------------------------------------------------


def stratified_sample_by_source(sf_dir: str):
    """Deterministic source-balanced sample: every source is downsampled
    to an expected HALF the smallest source's count — doc kept iff its
    32-bit md5 key falls under floor(min_count * 2^31 / source_count),
    an exact integer threshold the DuckDB oracle recomputes (the half
    keeps the filter active even when sources are already balanced)."""
    from myaku_ray.functions.hashkit import md5_u64

    counts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
        .groupby("source")
        .count()
        .to_pandas()
    )
    mn = int(counts["count()"].min())
    thresholds = {
        s: (mn << 31) // int(n)
        for s, n in zip(counts["source"], counts["count()"])
    }
    thr_ref = ray.put(thresholds)

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "lang", "n_chars"],
    )

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        thr = ray.get(thr_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = md5_u64(ids, hexchars=8)
        # vectorized per-source threshold: dictionary-encode the source
        # column once, resolve thresholds per dictionary entry, take
        src = batch["source"].combine_chunks().dictionary_encode()
        vals = np.fromiter(
            (thr[s] for s in src.dictionary.to_pylist()),
            dtype=np.uint64,
            count=len(src.dictionary),
        )
        lim = vals[src.indices.to_numpy(zero_copy_only=False)]
        return batch.filter(pa.array(h < lim))

    return ds.map_batches(pick, batch_format="pyarrow")


STRATIFIED_SAMPLE_SQL = """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
m AS (SELECT min(n) AS mn FROM c)
SELECT d.doc_id, d.source, d.lang, d.n_chars
FROM documents d JOIN c USING (source), m
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
      < (m.mn::UBIGINT * 2147483648::UBIGINT) // c.n::UBIGINT
"""


# ---------------------------------------------------------------------------
# Term co-occurrence PMI: corpus-level association mining (collocation /
# topic signal).  Map side emits in-batch-combined distinct-term pair
# counts (vocabulary-bounded, never token-bounded); one groupby(pair)
# shuffle; df table is vocabulary-sized and broadcast for the final
# result-sized PMI map.
# ---------------------------------------------------------------------------

PMI_MIN_SUPPORT = 25


def term_cooccurrence_pmi(sf_dir: str, min_support: int = PMI_MIN_SUPPORT):
    """Pairs of distinct terms co-occurring in >= min_support docs, with
    pmi_r = round(ln(N * n_ab / (df_a * df_b)), 6).  ln on both engines
    is the same libm call on result-sized data, so round-6 matches."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = ds.count()

    def pair_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "term_a": pa.array([], pa.string()),
                    "term_b": pa.array([], pa.string()),
                    "n_ab": pa.array([], pa.int64()),
                }
            )
        doc_idx, codes, _, dictionary = _doc_term_tfs(batch)
        vocab = max(len(dictionary), 1)
        # per-doc sorted distinct codes -> all unordered pairs, counted
        # in one bincount over code_a * vocab + code_b composite keys
        order = np.lexsort((codes, doc_idx))
        d_s, c_s = doc_idx[order], codes[order]
        starts = np.flatnonzero(
            np.concatenate([[True], d_s[1:] != d_s[:-1]])
        )
        lens = np.diff(np.append(starts, len(d_s)))
        keys: list[np.ndarray] = []
        for st, ln_ in zip(starts, lens):
            seg = c_s[st : st + ln_]
            if ln_ < 2:
                continue
            iu = np.triu_indices(ln_, k=1)
            keys.append(seg[iu[0]] * vocab + seg[iu[1]])
        if not keys:
            return pa.table(
                {
                    "term_a": pa.array([], pa.string()),
                    "term_b": pa.array([], pa.string()),
                    "n_ab": pa.array([], pa.int64()),
                }
            )
        allk = np.concatenate(keys)
        uniq, cnt = np.unique(allk, return_counts=True)
        ca, cb = uniq // vocab, uniq % vocab
        ta = dictionary.take(pa.array(ca))
        tb = dictionary.take(pa.array(cb))
        # pair order must be LEXICOGRAPHIC (the SQL's a.term < b.term),
        # not dictionary-code order — swap where needed
        import pyarrow.compute as pc

        swap = pc.greater(ta, tb)
        return pa.table(
            {
                "term_a": pc.if_else(swap, tb, ta),
                "term_b": pc.if_else(swap, ta, tb),
                "n_ab": pa.array(cnt.astype(np.int64)),
            }
        )

    pairs = (
        ds.map_batches(pair_counts, batch_format="pyarrow")
        .groupby(["term_a", "term_b"])
        .aggregate(Sum("n_ab", alias_name="n_ab"))
        .to_pandas()
    )
    pairs = pairs[pairs["n_ab"] >= min_support].reset_index(drop=True)

    df_tbl = term_doc_freq(sf_dir).to_pandas()
    df_map = dict(zip(df_tbl["term"], df_tbl["df"].astype(int)))

    na = pairs["term_a"].map(df_map).to_numpy(dtype=np.int64)
    nb = pairs["term_b"].map(df_map).to_numpy(dtype=np.int64)
    nab = pairs["n_ab"].to_numpy(dtype=np.int64)
    # same expression order as the SQL: double(N) * n_ab / (df_a * df_b);
    # math.log == DuckDB ln (both glibc) on this result-sized table
    pmi = [
        round(math.log(float(n_docs) * int(x) / (int(a) * int(b))), 6)
        for x, a, b in zip(nab, na, nb)
    ]
    return pd.DataFrame(
        {
            "term_a": pairs["term_a"],
            "term_b": pairs["term_b"],
            "n_ab": nab,
            "pmi_r": np.array(pmi, dtype=np.float64),
        }
    )


TERM_COOCCURRENCE_PMI_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
),
df AS (SELECT term, count(*) AS n FROM dt GROUP BY term),
nn AS (SELECT count(*) AS n FROM documents),
pr AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
  HAVING count(*) >= {PMI_MIN_SUPPORT}
)
SELECT pr.term_a, pr.term_b, pr.n_ab,
  round(ln(CAST(nn.n AS DOUBLE) * pr.n_ab / (fa.n * fb.n)), 6) AS pmi_r
FROM pr, nn
JOIN df fa ON fa.term = pr.term_a
JOIN df fb ON fb.term = pr.term_b
"""


# ---------------------------------------------------------------------------
# DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 4096
DSIR_TARGET_LANG = "en"


# driver-merge bound for the bucket totals: each ~1k-doc batch emits one
# dense DSIR_BUCKETS-row partial, so the driver merge holds roughly
# ceil(n_docs/1024) x DSIR_BUCKETS rows; past this bound the merge falls
# back to Ray's groupby exchange (same switch idiom as dedup_exact/Q18,
# equality-gated in tests/test_r4_session7.py)
DSIR_DRIVER_MERGE_ROWS = 50_000_000


def dsir_importance_weights(sf_dir: str, *, driver_merge_rows: int = DSIR_DRIVER_MERGE_ROWS):
    """Per-doc hashed-feature importance weight toward a target domain
    — the DSIR data-selection signal: log p_target(doc) - log p_raw(doc)
    under bag-of-hashed-unigram models with add-1 smoothing over
    DSIR_BUCKETS buckets (target domain = lang == DSIR_TARGET_LANG).

    The text is tokenized + feature-hashed ONCE: the first pass
    materializes a per-doc sparse histogram (doc_id, is_tgt, list<f>,
    list<c>) — strictly smaller than the text it summarizes
    (min(distinct terms, DSIR_BUCKETS) int64 pairs per doc) and
    list-typed, so a block boundary can never split a document.  The
    bucket-total reduction and the scoring pass both read that
    intermediate instead of re-tokenizing the corpus (tokenize+md5 IS
    the cost at scale; the old shape paid it twice).  Totals merge
    dense B-sized per-batch partials on the driver below
    ``driver_merge_rows``, else through Ray's groupby.  The log-ratio
    vector broadcasts (``ray.put``, B floats) and scoring is a flat
    per-doc dot product (list_flatten + bincount by parent).  Rounded
    to 6 decimals so summation-order float noise cannot flip the
    DuckDB comparison.  Bucket tallies ride float64 bincount weights:
    exact below 2**53 total tokens per bucket (~9e15 — beyond a
    100 TB corpus)."""
    import math

    import pyarrow.compute as pc

    from myaku_ray.functions.hashkit import md5_u64_str

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def featurize(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        if nrows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "is_tgt": pa.array([], pa.bool_()),
                    "f": pa.array([], pa.large_list(pa.int64())),
                    "c": pa.array([], pa.large_list(pa.int64())),
                }
            )
        doc_idx, codes, tfs, dictionary = _doc_term_tfs(batch)
        f_of_code = (md5_u64_str(dictionary) % DSIR_BUCKETS).astype(np.int64)
        keys = doc_idx * DSIR_BUCKETS + f_of_code[codes]
        uk, inv = np.unique(keys, return_inverse=True)
        c = np.bincount(inv, weights=tfs).astype(np.int64)
        row = uk // DSIR_BUCKETS
        f_id = uk % DSIR_BUCKETS
        per_doc = np.bincount(row, minlength=nrows)
        offsets = np.zeros(nrows + 1, dtype=np.int64)
        np.cumsum(per_doc, out=offsets[1:])
        off = pa.array(offsets)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "is_tgt": pc.equal(
                    batch["lang"], pa.scalar(DSIR_TARGET_LANG)
                ),
                "f": pa.LargeListArray.from_arrays(off, pa.array(f_id)),
                "c": pa.LargeListArray.from_arrays(off, pa.array(c)),
            }
        )

    hist = ds.map_batches(featurize, batch_format="pyarrow").materialize()

    def totals(batch: pa.Table) -> pa.Table:
        fa = batch["f"].combine_chunks()
        f_flat = pc.list_flatten(fa).to_numpy(zero_copy_only=False)
        c_flat = pc.list_flatten(batch["c"].combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        parent = pc.list_parent_indices(fa).to_numpy(zero_copy_only=False)
        tgt = batch["is_tgt"].to_numpy(zero_copy_only=False)
        m = tgt[parent] if len(parent) else np.zeros(0, dtype=bool)
        raw_c = np.bincount(f_flat, weights=c_flat, minlength=DSIR_BUCKETS)
        tgt_c = np.bincount(
            f_flat[m], weights=c_flat[m], minlength=DSIR_BUCKETS
        )
        return pa.table(
            {
                "f": pa.array(np.arange(DSIR_BUCKETS, dtype=np.int64)),
                "raw_c": pa.array(raw_c.astype(np.int64)),
                "tgt_c": pa.array(tgt_c.astype(np.int64)),
            }
        )

    n_docs = hist.count()
    est_rows = math.ceil(max(n_docs, 1) / 1024) * DSIR_BUCKETS
    if est_rows <= driver_merge_rows:
        counts = (
            hist.map_batches(totals, batch_format="pyarrow")
            .to_pandas()
            .groupby("f")[["raw_c", "tgt_c"]]
            .sum()
            .reindex(range(DSIR_BUCKETS), fill_value=0)
        )
    else:
        counts = (
            hist.map_batches(totals, batch_format="pyarrow")
            .groupby("f")
            .aggregate(
                Sum("raw_c", alias_name="raw_c"),
                Sum("tgt_c", alias_name="tgt_c"),
            )
            .to_pandas()
            .set_index("f")
            .reindex(range(DSIR_BUCKETS), fill_value=0)
        )
    raw = counts["raw_c"].to_numpy().astype(np.float64)
    tgt = counts["tgt_c"].to_numpy().astype(np.float64)
    r = np.log((tgt + 1.0) / (tgt.sum() + DSIR_BUCKETS)) - np.log(
        (raw + 1.0) / (raw.sum() + DSIR_BUCKETS)
    )
    r_ref = ray.put(r)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "logw_r": pa.array([], pa.float64()),
                }
            )
        rv = ray.get(r_ref)
        fa = batch["f"].combine_chunks()
        f_flat = pc.list_flatten(fa).to_numpy(zero_copy_only=False)
        c_flat = pc.list_flatten(batch["c"].combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        parent = pc.list_parent_indices(fa).to_numpy(zero_copy_only=False)
        contrib = c_flat * rv[f_flat]
        logw = np.bincount(parent, weights=contrib, minlength=batch.num_rows)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "logw_r": pa.array(np.round(logw, 6)),
            }
        )

    return hist.map_batches(score, batch_format="pyarrow")


DSIR_IMPORTANCE_SQL = f"""
WITH words AS (
  SELECT doc_id, lang,
    ('0x' || substr(md5(term), 1, 16))::UBIGINT % {DSIR_BUCKETS} AS f
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents)
),
raw AS (SELECT f, count(*)::BIGINT AS c FROM words GROUP BY f),
tgt AS (SELECT f, count(*)::BIGINT AS c FROM words
        WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY f),
tot AS (SELECT (SELECT sum(c) FROM raw) AS R,
               (SELECT coalesce(sum(c), 0) FROM tgt) AS T),
ratio AS (
  SELECT raw.f,
    ln((coalesce(tgt.c, 0) + 1)::DOUBLE / (tot.T + {DSIR_BUCKETS})) -
    ln((raw.c + 1)::DOUBLE / (tot.R + {DSIR_BUCKETS})) AS r
  FROM raw LEFT JOIN tgt USING (f), tot
)
SELECT w.doc_id, round(sum(ratio.r), 6) AS logw_r
FROM words w JOIN ratio ON ratio.f = w.f
GROUP BY w.doc_id
"""


# ---------------------------------------------------------------------------
# RAG/context chunking: fixed-size overlapping windows per document
# ---------------------------------------------------------------------------

CHUNK_WIDTH = 120
CHUNK_STRIDE = 80


def doc_chunk_overlap(sf_dir: str):
    """Split every document into fixed-width character chunks with
    overlapping stride (the RAG / context-window preprocessing step):
    a chunk starts at every multiple of ``CHUNK_STRIDE`` below the text
    length and spans ``CHUNK_WIDTH`` characters (shorter at the tail).

    Purely map-side — no shuffle at any scale: each batch emits its own
    chunk rows, and the expansion factor is bounded by
    ``ceil(max_doc_len / CHUNK_STRIDE)``.  The slicing is vectorized per
    CHUNK INDEX, not per row: iteration ``i`` slices every doc with
    ``len > i*stride`` in one ``utf8_slice_codeunits`` kernel call, so
    the Python loop runs ~``max_len/stride`` times per batch (single
    digits here), never once per row.  Chunk identity is the usual
    md5-prefix u64 (hashkit kernel == DuckDB md5), so downstream
    chunk-level dedup/decontamination can key on ``chunk_hash``.
    """
    import pyarrow.compute as pc

    from myaku_ray.functions.hashkit import md5_u64_str

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        lens = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_doc, out_idx, out_len, out_hash = [], [], [], []
        i = 0
        while True:
            start = i * CHUNK_STRIDE
            mask = lens > start
            if not mask.any():
                break
            sel = pa.array(mask)
            sliced = pc.utf8_slice_codeunits(
                text.filter(sel), start=start, stop=start + CHUNK_WIDTH
            )
            out_doc.append(doc_ids[mask])
            out_idx.append(np.full(int(mask.sum()), i, dtype=np.int64))
            out_len.append(
                pc.utf8_length(sliced).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            out_hash.append(md5_u64_str(sliced))
            i += 1
        if not out_doc:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk_len": pa.array([], pa.int64()),
                    "chunk_hash": pa.array([], pa.uint64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc)),
                "chunk_idx": pa.array(np.concatenate(out_idx)),
                "chunk_len": pa.array(np.concatenate(out_len)),
                "chunk_hash": pa.array(np.concatenate(out_hash)),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow")


DOC_CHUNK_OVERLAP_SQL = f"""
WITH c AS (
  SELECT d.doc_id, d.text,
    unnest(generate_series(0, (length(d.text)-1)//{CHUNK_STRIDE})) AS chunk_idx
  FROM documents d
  -- DuckDB // truncates toward zero, so an empty text would get
  -- (0-1)//S = 0 and emit one empty chunk the Ray side (correctly)
  -- skips; gate it out explicitly
  WHERE length(d.text) > 0)
SELECT doc_id, chunk_idx,
  CAST(length(substr(text, CAST(chunk_idx*{CHUNK_STRIDE}+1 AS BIGINT), {CHUNK_WIDTH})) AS BIGINT) AS chunk_len,
  ('0x' || substr(md5(substr(text, CAST(chunk_idx*{CHUNK_STRIDE}+1 AS BIGINT), {CHUNK_WIDTH})), 1, 16))::UBIGINT AS chunk_hash
FROM c
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis & Spirakis A-Res)
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 100


def weighted_sample_docs(sf_dir: str, k: int = WEIGHTED_SAMPLE_K):
    """Deterministic weighted sample WITHOUT replacement: the k docs
    with the largest A-Res key ``ln(u)/w`` where ``u`` is the doc's
    md5-uniform and ``w`` its char length — the exact distributed
    equivalent of drawing k docs with probability proportional to
    weight (Efraimidis & Spirakis 2006), and the weighted counterpart
    of the unweighted md5-threshold ``sample_documents``.

    Purely streaming: each batch keeps its own k best (no shuffle), the
    driver merges result-sized partials.  Both the md5 and the ln-key
    ride hashkit's embedded-DuckDB kernels, so every double is
    bit-identical to the SQL oracle.
    """
    from myaku_ray.functions.hashkit import ares_key, md5_u64

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        key = ares_key(md5_u64(ids), w)
        order = np.lexsort((ids, -key))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "n_chars": pa.array(
                    batch["n_chars"].to_numpy(zero_copy_only=False)[order]
                ),
                "ares_key": pa.array(key[order], pa.float64()),
            }
        )

    allc = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    allc = allc.sort_values(
        ["ares_key", "doc_id"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    allc["rank"] = np.arange(1, len(allc) + 1, dtype=np.int64)
    return allc


WEIGHTED_SAMPLE_SQL = f"""
WITH s AS (
  SELECT doc_id, n_chars,
    ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT AS DOUBLE)+0.5)/18446744073709551616.0)
      / CAST(n_chars AS DOUBLE) AS ares_key
  FROM documents)
SELECT doc_id, n_chars, ares_key,
  CAST(row_number() OVER (ORDER BY ares_key DESC, doc_id) AS BIGINT) AS rank
FROM s
ORDER BY ares_key DESC, doc_id
LIMIT {WEIGHTED_SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Keyword extraction: terms over-represented in one source (exact
# cross-product association, no float statistic anywhere)
# ---------------------------------------------------------------------------

DISTINCTIVE_TOPK = 5


def distinctive_terms_per_source(sf_dir: str, k: int = DISTINCTIVE_TOPK):
    """Top-k terms most associated with each source — keyword
    extraction over the corpus.  Association uses the 2x2 contingency
    table's EXACT integer cross-product ``a*d - b*c`` (a = source docs
    with the term, b = source docs without, c = other docs with,
    d = other docs without) — monotone in the odds-ratio direction,
    with none of chi-square's float math to diverge by an ulp.  int64
    envelope: doc counts up to ~3e9 keep both products under 2^63
    (asserted loudly).

    Plan: per-batch DISTINCT (doc, term) pairs via dictionary codes +
    one np.unique (the doc_token_stats kernel — no row loop), counted
    into ONE groupby(source, term) exchange of partials; the final
    score/rank runs on the driver over the vocab x sources aggregate —
    vocab-sized, the same bound as the tf-idf df table.
    """
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    def pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        enc = pc.list_flatten(toks).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        vocab = len(enc.dictionary)
        keys = parents * vocab + codes
        uniq = np.unique(keys)
        row = uniq // vocab
        code = uniq % vocab
        terms = enc.dictionary.take(pa.array(code))
        src = batch["source"].combine_chunks().take(pa.array(row))
        t = pa.table(
            {
                "source": src,
                "term": terms,
                "a": pa.array(np.ones(len(uniq), dtype=np.int64)),
            }
        )
        return t.group_by(["source", "term"]).aggregate(
            [("a", "sum")]
        ).rename_columns(["source", "term", "a"])

    st = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["source", "term"])
        .aggregate(Sum("a", alias_name="a"))
        .to_pandas()
    )
    n_s = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n_s"))
        .to_pandas()
    )
    n_total = int(n_s["n_s"].sum())
    assert n_total < 3_000_000_000, (
        "distinctive-terms int64 envelope exceeded — scale counts down"
    )
    df_t = st.groupby("term", as_index=False)["a"].sum().rename(
        columns={"a": "df"}
    )
    m = st.merge(df_t, on="term").merge(n_s, on="source")
    a = m["a"].to_numpy()
    b = m["n_s"].to_numpy() - a
    c = m["df"].to_numpy() - a
    d = (n_total - m["n_s"].to_numpy()) - c
    m["score"] = a * d - b * c
    m = m.sort_values(
        ["source", "score", "term"], ascending=[True, False, True]
    )
    out = m.groupby("source", as_index=False).head(k).copy()
    out["rank"] = out.groupby("source").cumcount() + 1
    out["rank"] = out["rank"].astype(np.int64)
    return out[["source", "rank", "term", "a", "score"]].reset_index(drop=True)


DISTINCTIVE_TERMS_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, source, unnest(string_split(text, ' ')) AS term
  FROM documents),
st AS (SELECT source, term, count(*) AS a FROM dt GROUP BY source, term),
tt AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
ns AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
n AS (SELECT count(*) AS n_total FROM documents),
scored AS (
  SELECT st.source, st.term, st.a,
    st.a*((n.n_total - ns.n_s) - (tt.df - st.a))
      - (ns.n_s - st.a)*(tt.df - st.a) AS score
  FROM st JOIN tt USING (term) JOIN ns USING (source) CROSS JOIN n),
ranked AS (
  SELECT source, term, a, score,
    CAST(row_number() OVER (
      PARTITION BY source ORDER BY score DESC, term) AS BIGINT) AS rank
  FROM scored)
SELECT source, rank, term, a, score
FROM ranked
WHERE rank <= {DISTINCTIVE_TOPK}
"""


# ---------------------------------------------------------------------------
# Tokenizer-design signal: smallest vocabulary covering X% of token mass
# ---------------------------------------------------------------------------

VOCAB_COVERAGE_PCT = 90


def vocab_coverage(sf_dir: str, pct: int = VOCAB_COVERAGE_PCT):
    """Smallest tf-descending vocabulary prefix covering >= ``pct``% of
    the corpus token mass — the vocabulary-size-vs-coverage signal a
    tokenizer design sweep needs.  Rank order is (tf DESC, term ASC)
    and the threshold is EXACT integer arithmetic
    (``cum_before * 100 < pct * total`` keeps a term), so no float
    boundary can flip membership.

    Plan: per-batch (term, tf) partials via the dictionary-code kernel
    feed ONE groupby(term) exchange; the finale (sort + cumsum) runs on
    the driver over the vocab-sized aggregate — the same bound as the
    tf-idf df table.
    """
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        enc = pc.list_flatten(toks).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        tf = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table(
            {
                "term": enc.dictionary,
                "tf": pa.array(tf.astype(np.int64)),
            }
        )

    vocab = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf", alias_name="tf"))
        .to_pandas()
    )
    if len(vocab) == 0:
        return pd.DataFrame(
            {
                "vocab_size": pd.Series([0], dtype="int64"),
                "covered_tf": pd.Series([0], dtype="int64"),
                "total_tf": pd.Series([0], dtype="int64"),
            }
        )
    vocab = vocab.sort_values(
        ["tf", "term"], ascending=[False, True]
    ).reset_index(drop=True)
    tf = vocab["tf"].to_numpy()
    total = int(tf.sum())
    cum_before = np.cumsum(tf) - tf
    keep = cum_before * 100 < pct * total
    return pd.DataFrame(
        {
            "vocab_size": pd.Series([int(keep.sum())], dtype="int64"),
            "covered_tf": pd.Series([int(tf[keep].sum())], dtype="int64"),
            "total_tf": pd.Series([total], dtype="int64"),
        }
    )


VOCAB_COVERAGE_SQL = f"""
WITH c AS (
  SELECT term, count(*)::BIGINT AS tf
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY term),
o AS (
  SELECT tf,
    sum(tf) OVER (ORDER BY tf DESC, term ROWS UNBOUNDED PRECEDING) - tf
      AS cum_before,
    (SELECT sum(tf) FROM c) AS total
  FROM c)
SELECT count(*)::BIGINT AS vocab_size,
       coalesce(sum(tf), 0)::BIGINT AS covered_tf,
       coalesce(any_value(total), 0)::BIGINT AS total_tf
FROM o WHERE cum_before * 100 < {VOCAB_COVERAGE_PCT} * total
"""


# ---------------------------------------------------------------------------
# Curation funnel: doc counts surviving each gate, in gate order
# ---------------------------------------------------------------------------


def curation_funnel(sf_dir: str):
    """The curation FUNNEL report: how many documents survive each
    successive gate of the ``curate_documents`` pipeline — total ->
    exact-dedup winner -> language -> quality.  The numbers a data
    curator reads before touching any threshold.

    Same gate definitions as ``curate_documents`` (one signals pass,
    ONE content-hash exchange for winner resolution); after the winner
    flag exists the funnel reduces to four counters summed from
    per-batch partials — nothing but 4-int rows reach the driver."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
    )
    stop = set(STOPWORDS)

    def signals(batch: pa.Table) -> pa.Table:
        texts = batch["text"].combine_chunks()
        toks = pc.split_pattern(texts, " ")
        n_tok = (
            pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(
            flat, value_set=pa.array(sorted(stop))
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(
            parents, weights=is_stop, minlength=batch.num_rows
        )
        keep_q = (n_tok >= CURATE_MIN_TOKENS) & (
            n_stop / n_tok <= CURATE_MAX_STOPWORD_RATIO
        )
        hs = [
            hashlib.sha256(t.encode()).hexdigest() for t in texts.to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": pa.array(hs, pa.string()),
                "lang_ok": pc.equal(batch["lang"], pa.scalar("en")),
                "keep_q": pa.array(keep_q),
            }
        )

    def winner_flag(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        return g.append_column(
            "winner", pa.array(ids == int(ids.min()))
        )

    def counters(batch: pa.Table) -> pa.Table:
        w = batch["winner"].to_numpy(zero_copy_only=False)
        l = batch["lang_ok"].to_numpy(zero_copy_only=False)
        q = batch["keep_q"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_total": pa.array([np.int64(len(w))]),
                "n_dedup": pa.array([np.int64(w.sum())]),
                "n_lang": pa.array([np.int64((w & l).sum())]),
                "n_quality": pa.array([np.int64((w & l & q).sum())]),
            }
        )

    parts = (
        ds.map_batches(signals, batch_format="pyarrow")
        .groupby("h")
        .map_groups(winner_flag, batch_format="pyarrow")
        .map_batches(counters, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    return pd.DataFrame(
        {
            "stage": pd.Series([1, 2, 3, 4], dtype="int64"),
            "gate": ["total", "exact_dedup", "lang", "quality"],
            "n_docs": pd.Series(
                [
                    int(parts["n_total"]),
                    int(parts["n_dedup"]),
                    int(parts["n_lang"]),
                    int(parts["n_quality"]),
                ],
                dtype="int64",
            ),
        }
    )


CURATION_FUNNEL_SQL = f"""
WITH sig AS (
  SELECT doc_id, lang,
    len(string_split(text, ' ')) AS n_tokens,
    CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
         AS DOUBLE) / len(string_split(text, ' ')) AS sw_ratio,
    min(doc_id) OVER (PARTITION BY text) AS winner
  FROM documents),
f AS (
  SELECT (doc_id = winner) AS w, (lang = 'en') AS l,
    (n_tokens >= {CURATE_MIN_TOKENS}
     AND sw_ratio <= {CURATE_MAX_STOPWORD_RATIO}) AS q
  FROM sig)
SELECT stage, gate, n_docs FROM (
  SELECT 1::BIGINT AS stage, 'total' AS gate, count(*)::BIGINT AS n_docs
  FROM f
  UNION ALL
  SELECT 2::BIGINT, 'exact_dedup', count(*) FILTER (WHERE w)::BIGINT FROM f
  UNION ALL
  SELECT 3::BIGINT, 'lang', count(*) FILTER (WHERE w AND l)::BIGINT FROM f
  UNION ALL
  SELECT 4::BIGINT, 'quality',
    count(*) FILTER (WHERE w AND l AND q)::BIGINT FROM f
) ORDER BY stage
"""


# ---------------------------------------------------------------------------
# Token-mass inequality: exact-integer Gini over per-doc token counts
# ---------------------------------------------------------------------------


def token_mass_gini(sf_dir: str):
    """How unevenly token mass is spread across documents — the Gini
    coefficient of per-doc token counts, the skew-at-a-glance number a
    curator checks before sharding or packing.  Convention (pinned vs
    DuckDB in a driver experiment): ascending 1-based ranks,
    ``gini = (2*Σ i*x_(i) - (n+1)*Σx) / (n*Σx)`` — tie order is
    irrelevant because equal values contribute equally under any
    permutation.

    Plan: per-doc token counts are bounded (doc length cap), so ONE
    scan reduces to per-batch COUNTING HISTOGRAMS (sparse (value,
    count) rows) merged on the driver — histogram-sized, never
    corpus-sized; no distributed sort.  The rank-weighted sum is then
    computed per histogram block in arbitrary-precision Python ints
    (a 100-TB corpus overflows int64 in Σ i*x_i; the histogram finale
    does not care), and only the final rounded ratio is a float."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def hist(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"v": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        n_tok = (
            pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        c = np.bincount(n_tok)
        nz = np.flatnonzero(c)
        return pa.table(
            {
                "v": pa.array(nz.astype(np.int64)),
                "c": pa.array(c[nz].astype(np.int64)),
            }
        )

    h = (
        ds.map_batches(hist, batch_format="pyarrow")
        .to_pandas()
        .groupby("v")["c"]
        .sum()
        .sort_index()
    )
    n = int(h.sum())
    if n == 0:
        return pd.DataFrame(
            {
                "n_docs": pd.Series([], dtype="int64"),
                "total_tokens": pd.Series([], dtype="int64"),
                "gini_r": pd.Series([], dtype="float64"),
            }
        )
    sv = 0
    siv = 0
    start = 0  # ranks consumed so far (python ints: no overflow at any n)
    for v, c in h.items():
        v, c = int(v), int(c)
        sv += v * c
        siv += v * (c * start + c * (c + 1) // 2)
        start += c
    num = 2 * siv - (n + 1) * sv
    den = n * sv
    return pd.DataFrame(
        {
            "n_docs": pd.Series([n], dtype="int64"),
            "total_tokens": pd.Series([sv], dtype="int64"),
            "gini_r": pd.Series([round(num / den, 6)], dtype="float64"),
        }
    )


TOKEN_MASS_GINI_SQL = """
WITH d AS (SELECT len(string_split(text, ' ')) AS v FROM documents),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS i FROM d),
t AS (SELECT sum(v) AS sv, count(*) AS n, sum(i * v) AS siv FROM r)
SELECT n::BIGINT AS n_docs, sv::BIGINT AS total_tokens,
  round((2*siv - (n+1)*sv)::DOUBLE / (n*sv), 6) AS gini_r
FROM t
"""


# ---------------------------------------------------------------------------
# Deterministic source-interleaved training order (no global sort)
# ---------------------------------------------------------------------------


def interleave_by_source(sf_dir: str):
    """Deterministic round-robin training order over sources: docs are
    ranked (doc_id ASC) within their source, and the global position
    interleaves rank-1 docs of every source, then rank-2, ... — the
    curriculum/data-mixing order a trainer consumes so no source
    dominates any window of the stream.

    The position is computed ARITHMETICALLY, not by a global sort:
    ``pos(rk, src) = Σ_s min(count_s, rk-1) + |{s' < src :
    count_s' >= rk}|`` with the source-count table (source-vocabulary-
    sized) broadcast — so the only exchange is the groupby(source)
    that co-locates each source's rows for ranking.  Exact ints end to
    end; returned unsorted (position is a column; consumers
    ``sort('position')`` or shard by range)."""
    counts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    src_names = counts["source"].tolist()
    src_counts = counts["n"].to_numpy().astype(np.int64)
    c_ref = ray.put((src_names, src_counts))

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        names, cnts = ray.get(c_ref)
        src = g["source"].iloc[0]
        si = names.index(src)
        g = g.sort_values("doc_id").reset_index(drop=True)
        rk = np.arange(1, len(g) + 1, dtype=np.int64)
        # pairs with strictly smaller rank, over every source
        pos = np.zeros(len(g), dtype=np.int64)
        for c in cnts:
            pos += np.minimum(c, rk - 1)
        # same rank, earlier source ordinal
        for c in cnts[:si]:
            pos += (c >= rk).astype(np.int64)
        return pd.DataFrame(
            {
                "position": pos,
                "doc_id": g["doc_id"].to_numpy(),
                "source": g["source"].to_numpy(),
            }
        )

    return ds.groupby("source").map_groups(rank_group)


INTERLEAVE_BY_SOURCE_SQL = """
WITH r AS (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
  FROM documents)
SELECT CAST(row_number() OVER (ORDER BY rk, source) - 1 AS BIGINT)
  AS position, doc_id, source
FROM r
"""


# ---------------------------------------------------------------------------
# Interpolated bigram-LM log-perplexity: the sequence-aware corpus-LM
# quality filter (Jelinek-Mercer smoothing over the corpus's own bigram /
# unigram tables) — catches shuffled-token and boilerplate docs that the
# order-free unigram filter scores as fluent.
# ---------------------------------------------------------------------------

BIGRAM_LM_LAMBDA = 0.75


def doc_bigram_logppl(sf_dir: str):
    """Per-doc negative mean log-likelihood under the interpolated
    bigram LM  p(w2|w1) = λ·c(w1,w2)/c(w1·) + (1-λ)·c(w2)/N  (c(w1·) =
    bigram-left occurrences, N = corpus tokens).  Docs with fewer than
    2 tokens have no bigram and are excluded (the SQL join does the
    same).

    Three streaming passes: the bigram table reuses ``bigram_counts``
    (ONE distinct-pair exchange) and broadcasts once via ``ray.put``
    together with its left-marginal and the unigram totals — the model
    is distinct-bigram-sized, the documented scale valve being a count
    floor / hash-sharded model (same family as TFIDF's vocab
    broadcast); scoring is one pruned scan, fully vectorized (hash
    ``pd.Index.get_indexer`` lookups, one np.log, per-doc bincount
    segment sums).  Interpolation arithmetic mirrors the SQL term
    order — (λ·c2)/c1 + ((1-λ)·cu)/N — and rounds to 6 decimals so
    summation-order float noise cannot flip the DuckDB comparison
    (doc_unigram_logppl precedent)."""
    import pyarrow.compute as pc

    bg = bigram_counts(sf_dir).to_pandas()
    lf = bg.groupby("w1", as_index=False)["n"].sum()
    tdf = term_doc_freq(sf_dir).to_pandas()
    n_total = float(tdf["total_tf"].sum())

    # integer bigram keys gid(w1)*V + gid(w2) over the global vocab —
    # per-occurrence lookups stay pure int64 arithmetic (only each
    # batch's DISTINCT tokens pass through a string indexer); V^2 must
    # fit int64, the same >3e9-vocab cliff as bigram_counts' pair codes
    uni_idx = pd.Index(tdf["term"])
    v = len(uni_idx)
    uni_n = tdf["total_tf"].to_numpy().astype(np.float64)
    bg_key = pd.Index(
        uni_idx.get_indexer(bg["w1"]).astype(np.int64) * v
        + uni_idx.get_indexer(bg["w2"]).astype(np.int64)
    )
    bg_n = bg["n"].to_numpy().astype(np.float64)
    lf_key = pd.Index(uni_idx.get_indexer(lf["w1"]).astype(np.int64))
    lf_n = lf["n"].to_numpy().astype(np.float64)
    model_ref = ray.put((uni_idx, uni_n, bg_key, bg_n, lf_key, lf_n, v))

    lam = BIGRAM_LM_LAMBDA
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "bigram_logppl_r": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        uni, unn, bgi, bgn, lfi, lfn, v = ray.get(model_ref)
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        if len(parents) < 2:
            return empty
        enc = pc.list_flatten(toks).dictionary_encode()
        gid_of_code = uni.get_indexer(enc.dictionary.to_pylist()).astype(
            np.int64
        )
        gid = gid_of_code[
            enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ]
        adj = parents[1:] == parents[:-1]
        if not adj.any():
            return empty
        g1 = gid[:-1][adj]
        g2 = gid[1:][adj]
        doc = parents[:-1][adj]
        c2 = bgn[bgi.get_indexer(g1 * v + g2)]
        c1 = lfn[lfi.get_indexer(g1)]
        cu = unn[g2]
        p = (lam * c2) / c1 + ((1.0 - lam) * cu) / n_total
        contrib = -np.log(p)
        n = batch.num_rows
        ll = np.bincount(doc, weights=contrib, minlength=n)
        cnt = np.bincount(doc, minlength=n)
        has = cnt > 0
        return pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks().take(
                    pa.array(np.flatnonzero(has))
                ),
                "bigram_logppl_r": pa.array(
                    np.round(ll[has] / cnt[has], 6)
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


DOC_BIGRAM_LOGPPL_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), flat AS (
  SELECT doc_id, unnest(t) AS term FROM toks
), nt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM flat),
uni AS (SELECT term, count(*) AS cu FROM flat GROUP BY term),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
), bg AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2),
lf AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1)
SELECT p.doc_id,
  round(-sum(ln(
    ({BIGRAM_LM_LAMBDA} * CAST(bg.c2 AS DOUBLE)) / lf.c1
    + ({1.0 - BIGRAM_LM_LAMBDA} * CAST(uni.cu AS DOUBLE)) / nt.nn
  )) / count(*), 6) AS bigram_logppl_r
FROM pairs p
JOIN bg USING (w1, w2) JOIN lf USING (w1)
JOIN uni ON uni.term = p.w2 CROSS JOIN nt
GROUP BY p.doc_id
"""


# ---------------------------------------------------------------------------
# Incremental (snapshot-delta) exact dedup — the continuous-crawl shape:
# dedup NEW documents against an EXISTING corpus without rereading it per
# batch.  The split is derived from doc_id (existing = doc_id <= 3/5 of
# max), standing in for the crawl watermark pipelines/update.py keeps.
# ---------------------------------------------------------------------------

INCR_SPLIT_NUM, INCR_SPLIT_DEN = 3, 5


def dedup_incremental(sf_dir: str):
    """New-delta exact dedup against an existing snapshot: a new doc
    survives iff its content fingerprint collides with NO existing doc
    AND it is the min-doc_id copy within the delta (the dedup_exact
    winner rule applied delta-side).

    Scale shape: per-batch vectorized fingerprinting
    (hashkit.md5_u64_str — bit-identical to the DuckDB oracle), then
    ONE groupby(h) exchange carrying three int64 columns per row — the
    existing corpus is never broadcast and text never crosses the
    exchange, so at 100 TB the shuffle moves 24 B/doc.  At 10^12 docs
    the same plan holds; only the hash-group exchange scales."""
    from myaku_ray.functions.hashkit import md5_u64_str

    meta = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).max("doc_id")
    split = int(meta) * INCR_SPLIT_NUM // INCR_SPLIT_DEN
    big = np.iinfo(np.int64).max

    def fp(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = (md5_u64_str(batch["text"]) & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(
            np.int64
        )
        is_new = ids > split
        return pa.table(
            {
                "h": pa.array(h, pa.int64()),
                # Min() skips the sentinel only if no new doc is in the
                # group; filtered below
                "new_id": pa.array(np.where(is_new, ids, big), pa.int64()),
                "is_old": pa.array((~is_new).astype(np.int64), pa.int64()),
                "is_new": pa.array(is_new.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(fp, batch_format="pyarrow")
        .groupby("h")
        .aggregate(
            Min("new_id", alias_name="keeper_doc_id"),
            Sum("is_old", alias_name="n_old"),
            Sum("is_new", alias_name="n_new_copies"),
        )
    )

    def survivors(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.equal(batch["n_old"], 0), pc.greater(batch["n_new_copies"], 0)
        )
        t = batch.filter(keep)
        return t.select(["keeper_doc_id", "n_new_copies"])

    return agg.map_batches(survivors, batch_format="pyarrow")


DEDUP_INCREMENTAL_SQL = f"""
WITH s AS (
  SELECT (max(doc_id) * {INCR_SPLIT_NUM}) // {INCR_SPLIT_DEN} AS split
  FROM documents
),
h AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(text), 1, 16))::UBIGINT
         & 9223372036854775807::UBIGINT AS BIGINT) AS h,
    doc_id > (SELECT split FROM s) AS is_new
  FROM documents
)
SELECT min(CASE WHEN is_new THEN doc_id END) AS keeper_doc_id,
       count(CASE WHEN is_new THEN 1 END) AS n_new_copies
FROM h GROUP BY h
HAVING count(CASE WHEN NOT is_new THEN 1 END) = 0
   AND count(CASE WHEN is_new THEN 1 END) > 0
"""


# ---------------------------------------------------------------------------
# Compression-ratio quality signal (RedPajama/Dolma-style): highly
# compressible text is repetitive/templated; near-incompressible text is
# noise.  zlib level pinned so the stored golden is reproducible.
#
# ENVIRONMENT DEPENDENCY (round-4 ADVICE): the stored golden bakes the
# exact compressed byte counts of CPython's bundled madler zlib at level
# 6.  zlib output is NOT guaranteed identical across implementations —
# a host whose Python links zlib-ng / cloudflare-zlib can produce
# different (still valid) byte counts, failing the golden and
# test_doc_compression_ratio_serial_parity.  That failure means
# ENVIRONMENT DRIFT, not an engine bug: regenerate the golden on the new
# host (`python tools/gen_op_goldens.py`) — the driver compares engine
# vs golden computed by the SAME zlib build, so the check stays exact.
# ---------------------------------------------------------------------------

ZRATIO_LEVEL = 6


def doc_compression_ratio(sf_dir: str):
    """Per-doc zlib compressibility: (doc_id, n_raw, n_zlib,
    ratio_milli) with ratio_milli = 1000 * n_zlib // n_raw — exact
    integers end to end.  Pure per-doc map (one C zlib call per doc,
    the dedup_exact hashing idiom), no shuffle, so the plan is a single
    streaming pass at any corpus size.  Stored golden = serial zlib
    pass over the same rows (tools/gen_op_goldens.py)."""
    import zlib

    def ratio(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        raw = np.fromiter(
            (len(t.encode("utf-8")) for t in texts), np.int64, len(texts)
        )
        comp = np.fromiter(
            (
                len(zlib.compress(t.encode("utf-8"), ZRATIO_LEVEL))
                for t in texts
            ),
            np.int64,
            len(texts),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_raw": pa.array(raw, pa.int64()),
                "n_zlib": pa.array(comp, pa.int64()),
                "ratio_milli": pa.array(
                    1000 * comp // np.maximum(raw, 1), pa.int64()
                ),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(ratio, batch_format="pyarrow")
