"""Search-result preview assembly (reference K5 semantics).

Reproduces the reference's preview pipeline
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
  (article_preview.py:26-34,233-270);
- over-long samples TRIM around the max-query-match window with the
  reference's three placement strategies (full-left/remainder-right,
  full-right/remainder-left, left-right balance) and ``...`` indicators
  (article_preview.py:272-479);
- under-long samples EXPAND by whole neighboring sentences toward the
  70-90 ideal (paragraph-continuation first, then any sentence), falling
  back to partial force-expansion (article_preview.py:481-827).

Deliberate deviations (documented, not silent):
- no separate title text, so the title-boundary expansion rules are
  parameterized by ``title_len`` (0 = no title; our corpus stores body
  text only);
- the reference's ``_append_segments_left_right_balance`` takes a SINGLE
  character from the left neighbor (``text[-k]`` — missing slice colon,
  article_preview.py:419-421); we take the k-char slice the surrounding
  code clearly intends;
- the reference's ``_force_expand_right_up_to_max`` loops on
  ``_can_expand_left`` and trims ``segs[0]`` (article_preview.py:763-774
  — copy-paste of the left variant); we expand right and trim the tail.
"""

from __future__ import annotations

import re
from collections import deque
from dataclasses import dataclass

from myaku_ray.normalize import find_jpn_sentence_end, find_jpn_sentence_start

MIN_ACCEPTABLE_SAMPLE_LEN = 50
MIN_IDEAL_SAMPLE_LEN = 70
MAX_IDEAL_SAMPLE_LEN = 90
MAX_ACCEPTABLE_SAMPLE_LEN = 100
MAX_PREVIEW_ARTICLE_SAMPLES = 3
MAX_PREVIEW_ARTICLE_PERCENT = 0.15
TRIMMED_INDICATOR = "..."
MIN_CHARS_BETWEEN_MATCH_AND_TRIM = 8

_WHITESPACE_RE = re.compile(r"\s+")


def collapse_whitespace(text: str) -> str:
    return _WHITESPACE_RE.sub("　", text)


@dataclass
class PreviewSample:
    start: int                      # char offset of the sample in text
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


def _seglen(segments) -> int:
    return sum(len(t) for _, t in segments)


class _PreviewBuilder:
    """Stateful builder matching SearchResultArticlePreview's flow."""

    def __init__(self, text: str, positions, title_len: int = 0) -> None:
        self.text = text
        self.title_len = title_len
        groups = group_positions_by_sentence(text, positions)
        groups.sort(key=sample_quality_key, reverse=True)
        self.groups = groups
        self.pos_map = {g[0][0]: g[1] for g in groups}
        self.used: set[int] = set()

    # -- segments ---------------------------------------------------------

    def _sample_segments(self, sentence, matches) -> list:
        text = self.text
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

    # -- trim (article_preview.py:272-479) --------------------------------

    def _max_query_match_bounds(self, segs) -> tuple[int, int]:
        """Contiguous segment window from a match segment holding the most
        match segments within MAX_ACCEPTABLE_SAMPLE_LEN chars."""
        max_matches = -1
        max_start, max_end = 0, len(segs)
        for i, (is_match, _t) in enumerate(segs):
            if not is_match:
                continue
            matches = 0
            section_len = 0
            last_match = i
            for j in range(i, len(segs)):
                section_len += len(segs[j][1])
                if section_len >= MAX_ACCEPTABLE_SAMPLE_LEN:
                    break
                if segs[j][0]:
                    last_match = j
                    matches += 1
            if matches > max_matches:
                max_matches = matches
                max_start, max_end = i, last_match + 1
        return max_start, max_end

    def _trim(self, sample: PreviewSample) -> PreviewSample:
        segs = sample.segments
        mstart, mend = self._max_query_match_bounds(segs)
        trimmed = deque(segs[mstart:mend])
        trimmed_len = _seglen(trimmed)
        start = sample.start + _seglen(segs[0:mstart])

        chars_from_start = _seglen(segs[0:mstart])
        chars_to_end = _seglen(segs[mend:])
        left_added = 0
        if trimmed_len >= MAX_ACCEPTABLE_SAMPLE_LEN:
            pass  # window alone exceeds the cap — ship it untrimmed-of-itself
        elif (
            trimmed_len + chars_from_start + MIN_CHARS_BETWEEN_MATCH_AND_TRIM
            <= MAX_ACCEPTABLE_SAMPLE_LEN
        ):
            # whole head fits: keep it, fill the remainder from the tail
            trimmed.extendleft(reversed(segs[0:mstart]))
            cur = _seglen(trimmed)
            if cur < MAX_ACCEPTABLE_SAMPLE_LEN:
                trimmed.append(
                    (False, segs[mend][1][: MAX_ACCEPTABLE_SAMPLE_LEN - cur])
                )
            trimmed.append((False, TRIMMED_INDICATOR))
            left_added = len(trimmed[0][1])
        elif (
            trimmed_len + chars_to_end + MIN_CHARS_BETWEEN_MATCH_AND_TRIM
            <= MAX_ACCEPTABLE_SAMPLE_LEN
        ):
            # whole tail fits: keep it, fill the remainder from the head
            trimmed.extend(segs[mend:])
            cur = _seglen(trimmed)
            if cur < MAX_ACCEPTABLE_SAMPLE_LEN:
                trimmed.appendleft(
                    (
                        False,
                        segs[mstart - 1][1][
                            -1 * (MAX_ACCEPTABLE_SAMPLE_LEN - cur):
                        ],
                    )
                )
                left_added = len(trimmed[0][1])
            trimmed.appendleft((False, TRIMMED_INDICATOR))
        else:
            # balance: split the remainder between both neighbors
            remaining = MAX_ACCEPTABLE_SAMPLE_LEN - trimmed_len
            left_take = remaining // 2 + remaining % 2
            trimmed.appendleft(
                (False, segs[mstart - 1][1][-left_take:] if left_take else "")
            )
            left_added = len(trimmed[0][1])
            trimmed.appendleft((False, TRIMMED_INDICATOR))
            trimmed.append((False, segs[mend][1][: remaining // 2]))
            trimmed.append((False, TRIMMED_INDICATOR))

        return PreviewSample(start=start - left_added, segments=list(trimmed))

    # -- expand (article_preview.py:481-827) ------------------------------

    def _should_expand(self, segs, expand_segs) -> bool:
        cur = _seglen(segs)
        new = cur + _seglen(expand_segs)
        if MIN_IDEAL_SAMPLE_LEN <= new <= MAX_IDEAL_SAMPLE_LEN:
            return True
        if MIN_IDEAL_SAMPLE_LEN <= cur <= MAX_IDEAL_SAMPLE_LEN:
            return False
        if cur < MIN_IDEAL_SAMPLE_LEN and new < MIN_IDEAL_SAMPLE_LEN:
            return True
        if cur > MAX_IDEAL_SAMPLE_LEN and new > MAX_IDEAL_SAMPLE_LEN:
            return False
        return not (MIN_IDEAL_SAMPLE_LEN - cur < new - MAX_IDEAL_SAMPLE_LEN)

    def _can_expand_left(self, pos) -> bool:
        if pos[0] == 0:
            return False
        left_start = find_jpn_sentence_start(self.text, pos[0] - 1)
        if pos[0] >= self.title_len and left_start < self.title_len:
            return False
        return left_start not in self.used

    def _can_expand_right(self, pos) -> bool:
        pos_end = pos[0] + pos[1]
        if pos_end == len(self.text):
            return False
        if pos[0] < self.title_len:
            right_end = find_jpn_sentence_start(self.text, pos_end)
            while right_end > 0 and self.text[right_end] == "\n":
                right_end -= 1
            if right_end >= self.title_len:
                return False
        return pos_end not in self.used

    def _paragraph_continues_left(self, pos) -> bool:
        return pos[0] != 0 and not self.text[pos[0] - 1].isspace()

    def _paragraph_continues_right(self, pos) -> bool:
        pos_end = pos[0] + pos[1]
        return pos_end != len(self.text) and not self.text[pos_end].isspace()

    def _left_sentence_segs(self, pos):
        left_start = find_jpn_sentence_start(self.text, pos[0] - 1)
        found = self.pos_map.get(left_start, ())
        return (
            self._sample_segments((left_start, pos[0] - left_start), found),
            left_start,
        )

    def _right_sentence_segs(self, pos):
        right_start = pos[0] + pos[1]
        right_end = find_jpn_sentence_end(self.text, right_start)
        found = self.pos_map.get(right_start, ())
        return (
            self._sample_segments(
                (right_start, right_end - right_start + 1), found
            ),
            right_end,
        )

    def _expand_left(self, sample, pos, only_if_paragraph_continues):
        segs = deque(sample.segments)
        while self._can_expand_left(pos) and (
            not only_if_paragraph_continues
            or self._paragraph_continues_left(pos)
        ):
            left_segs, left_start = self._left_sentence_segs(pos)
            if not self._should_expand(segs, left_segs):
                break
            segs.extendleft(reversed(left_segs))
            pos = (left_start, pos[1] + pos[0] - left_start)
            self.used.add(left_start)
        sample.start = pos[0]
        sample.segments = list(segs)
        return sample, pos

    def _expand_right(self, sample, pos, only_if_paragraph_continues):
        segs = list(sample.segments)
        while self._can_expand_right(pos) and (
            not only_if_paragraph_continues
            or self._paragraph_continues_right(pos)
        ):
            right_start = pos[0] + pos[1]
            right_segs, right_end = self._right_sentence_segs(pos)
            if not self._should_expand(segs, right_segs):
                break
            segs.extend(right_segs)
            pos = (pos[0], pos[1] + right_end - right_start + 1)
            self.used.add(right_start)
        sample.segments = segs
        return sample, pos

    def _force_expand_left(self, sample, pos):
        segs = deque(sample.segments)
        while self._can_expand_left(pos):
            left_segs, left_start = self._left_sentence_segs(pos)
            excess = 0
            for seg in reversed(left_segs):
                segs.appendleft(seg)
                cur = _seglen(segs)
                if cur >= MAX_ACCEPTABLE_SAMPLE_LEN:
                    excess = cur - MAX_ACCEPTABLE_SAMPLE_LEN
                    m, t = segs[0]
                    segs[0] = (m, t[excess:])
                    break
            if _seglen(segs) >= MAX_ACCEPTABLE_SAMPLE_LEN:
                if excess > 0:
                    segs.appendleft((False, TRIMMED_INDICATOR))
                break
            pos = (left_start, pos[1] + pos[0] - left_start)
            self.used.add(left_start)
        sample.start = pos[0]
        sample.segments = list(segs)
        return sample, pos

    def _force_expand_right(self, sample, pos):
        segs = list(sample.segments)
        while self._can_expand_right(pos):
            right_start = pos[0] + pos[1]
            right_segs, right_end = self._right_sentence_segs(pos)
            excess = 0
            for seg in right_segs:
                segs.append(seg)
                cur = _seglen(segs)
                if cur >= MAX_ACCEPTABLE_SAMPLE_LEN:
                    excess = cur - MAX_ACCEPTABLE_SAMPLE_LEN
                    m, t = segs[-1]
                    segs[-1] = (m, t[: len(t) - excess])
                    break
            if _seglen(segs) >= MAX_ACCEPTABLE_SAMPLE_LEN:
                if excess > 0:
                    segs.append((False, TRIMMED_INDICATOR))
                break
            pos = (pos[0], pos[1] + right_end - right_start + 1)
            self.used.add(right_start)
        sample.segments = segs
        return sample, pos

    def _expand(self, sample, pos) -> PreviewSample:
        sample, pos = self._expand_left(sample, pos, True)
        sample, pos = self._expand_right(sample, pos, True)
        if _seglen(sample.segments) >= MIN_ACCEPTABLE_SAMPLE_LEN:
            return sample
        sample, pos = self._expand_left(sample, pos, False)
        sample, pos = self._expand_right(sample, pos, False)
        if _seglen(sample.segments) >= MIN_ACCEPTABLE_SAMPLE_LEN:
            return sample
        sample, pos = self._force_expand_left(sample, pos)
        if _seglen(sample.segments) >= MIN_ACCEPTABLE_SAMPLE_LEN:
            return sample
        sample, _pos = self._force_expand_right(sample, pos)
        return sample

    # -- assembly ---------------------------------------------------------

    def _create_sample(self, sentence, matches) -> PreviewSample:
        sample = PreviewSample(
            sentence[0], self._sample_segments(sentence, matches)
        )
        self.used.add(sentence[0])
        if sample.text_len > MAX_ACCEPTABLE_SAMPLE_LEN:
            return self._trim(sample)
        sample = self._expand(sample, sentence)
        return sample

    def build(self) -> list[PreviewSample]:
        article_len = max(len(collapse_whitespace(self.text)), 1)
        samples: list[PreviewSample] = []
        for g in self.groups:
            if g[0][0] in self.used:
                continue
            samples.append(self._create_sample(g[0], g[1]))
            total = sum(s.text_len for s in samples)
            if (
                len(samples) > 1
                and total / article_len > MAX_PREVIEW_ARTICLE_PERCENT
            ):
                samples.pop()
                break
            if len(samples) >= MAX_PREVIEW_ARTICLE_SAMPLES:
                break
        return samples


def build_preview(
    text: str, positions: list[tuple[int, int]], title_len: int = 0
) -> list[PreviewSample]:
    """Up to 3 quality-ranked samples covering ≤15% of the article, each
    trimmed/expanded toward the 70-90-char ideal per the reference rules."""
    if not positions:
        return []
    return _PreviewBuilder(text, positions, title_len).build()
