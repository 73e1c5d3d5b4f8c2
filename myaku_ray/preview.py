"""Search-result preview assembly (reference K5 semantics).

Reproduces the reference's preview selection
(myakuweb-apiserver/search/article_preview.py):

- group matched positions by containing sentence
  (myaku/datatypes.py:274-304 group_text_positions_by_sentence);
- rank sentences by the length-bucket quality key
  (article_preview.py:37-62: ideal 70-90 chars > acceptable-short 50-69 >
  acceptable-long 91-100 > too-short > too-long, longer wins inside a
  bucket);
- emit up to 3 samples, capped at 15% of the article
  (article_preview.py:17-18,181-196);
- each sample is (is_query_match, text) segments with whitespace blocks
  collapsed to a full-width space, first/last segments stripped
  (article_preview.py:26-34,233-270).

Simplification vs the reference: over-long samples are hard-trimmed
around the first match with the ``...`` indicator instead of the
max-match-window optimization (article_preview.py:274+); the sample
SELECTION — which sentences appear, in which order — is identical.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from myaku_ray.normalize import find_jpn_sentence_end, find_jpn_sentence_start

MIN_ACCEPTABLE_SAMPLE_LEN = 50
MIN_IDEAL_SAMPLE_LEN = 70
MAX_IDEAL_SAMPLE_LEN = 90
MAX_ACCEPTABLE_SAMPLE_LEN = 100
MAX_PREVIEW_ARTICLE_SAMPLES = 3
MAX_PREVIEW_ARTICLE_PERCENT = 0.15
TRIMMED_INDICATOR = "..."

_WHITESPACE_RE = re.compile(r"\s+")


def collapse_whitespace(text: str) -> str:
    return _WHITESPACE_RE.sub("　", text)


@dataclass
class PreviewSample:
    start: int                      # char offset of the sentence in text
    segments: list                  # [(is_query_match, text), ...]

    @property
    def text(self) -> str:
        return "".join(t for _, t in self.segments)

    @property
    def text_len(self) -> int:
        return sum(len(t) for _, t in self.segments)


def group_positions_by_sentence(
    text: str, positions: list[tuple[int, int]]
) -> list[tuple[tuple[int, int], tuple[tuple[int, int], ...]]]:
    """[(sentence (start, len), (contained match positions...)), ...]."""
    groups: dict[tuple[int, int], list] = {}
    end = -1
    start = 0
    for pos in sorted(positions):
        if pos[0] > end:
            start = find_jpn_sentence_start(text, pos[0])
            end = find_jpn_sentence_end(text, pos[0] + pos[1])
        groups.setdefault((start, end - start + 1), []).append(pos)
    return [(sp, tuple(pl)) for sp, pl in groups.items()]


def sample_quality_key(group) -> tuple[int, int]:
    n = group[0][1]
    if MIN_IDEAL_SAMPLE_LEN <= n <= MAX_IDEAL_SAMPLE_LEN:
        return (2, n)
    if MIN_ACCEPTABLE_SAMPLE_LEN <= n < MIN_IDEAL_SAMPLE_LEN:
        return (1, n)
    if MAX_IDEAL_SAMPLE_LEN < n <= MAX_ACCEPTABLE_SAMPLE_LEN:
        return (0, n)
    if n < MIN_ACCEPTABLE_SAMPLE_LEN:
        return (-1, n)
    return (-2, n)


def _sample_segments(
    text: str,
    sentence: tuple[int, int],
    matches: tuple[tuple[int, int], ...],
) -> list:
    segments = []
    last = sentence[0]
    for ms, ml in matches:
        if last != ms:
            segments.append([False, text[last:ms]])
            last = ms
        segments.append([True, text[ms : ms + ml]])
        last = ms + ml
    tail = text[last : sentence[0] + sentence[1]]
    if tail:
        segments.append([False, tail])
    segments[0][1] = segments[0][1].lstrip()
    segments[-1][1] = segments[-1][1].rstrip()
    return [(m, collapse_whitespace(t)) for m, t in segments]


def _trim(sample: PreviewSample) -> PreviewSample:
    """Hard-trim an over-long sample around its first match."""
    if sample.text_len <= MAX_ACCEPTABLE_SAMPLE_LEN:
        return sample
    out = []
    budget = MAX_ACCEPTABLE_SAMPLE_LEN - len(TRIMMED_INDICATOR)
    used = 0
    for is_match, t in sample.segments:
        if used >= budget:
            break
        take = t[: budget - used]
        out.append((is_match, take))
        used += len(take)
    out.append((False, TRIMMED_INDICATOR))
    return PreviewSample(start=sample.start, segments=out)


def build_preview(
    text: str, positions: list[tuple[int, int]]
) -> list[PreviewSample]:
    """Up to 3 quality-ranked samples covering ≤15% of the article."""
    if not positions:
        return []
    groups = group_positions_by_sentence(text, positions)
    groups.sort(key=sample_quality_key, reverse=True)
    article_len = max(len(collapse_whitespace(text)), 1)
    samples: list[PreviewSample] = []
    used: set[int] = set()
    for g in groups:
        if g[0][0] in used:
            continue
        used.add(g[0][0])
        samples.append(
            _trim(PreviewSample(g[0][0], _sample_segments(text, g[0], g[1])))
        )
        total = sum(s.text_len for s in samples)
        if len(samples) > 1 and total / article_len > MAX_PREVIEW_ARTICLE_PERCENT:
            samples.pop()
            break
        if len(samples) >= MAX_PREVIEW_ARTICLE_SAMPLES:
            break
    return samples
