"""myaku_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch rebuild of the data-processing capabilities of the reference
Myaku engine (/root/reference, NickMcL/Myaku) expressed Ray-Data-first:

- HTML -> text extraction as ``map_batches`` over zero-copy Arrow batches
  (reference semantics: myaku/utils/html.py:22-75,574-585).
- Morphological-style tokenization with lemma + width-normalized term keys in
  stateful actor pools (reference: myaku/japanese_analysis.py:964-1059).
- Posting lists built via salted ``groupby`` shuffles, delta-encoded docID
  gaps with varint block compression, per-block max scores, merged into
  immutable segment files (reference index: myaku/datastore/database.py:312-323).
- Top-k retrieval with block-max WAND over the segments, rank order
  ``(score, warc_ts, doc_id)`` descending mirroring ArticleRankKey
  (reference: myaku/datatypes.py:134-148).
- Quality scoring reproducing the reference's factor tables
  (myaku/scorer/factor_scorers.py) as the additive rank modifier.

Nothing here is a port: the execution engine is ``ray.data.Dataset``
pipelines throughout.
"""

__version__ = "0.1.0"
