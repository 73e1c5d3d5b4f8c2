"""Preview (K5) sample-selection semantics."""

from myaku_ray.preview import (
    MAX_ACCEPTABLE_SAMPLE_LEN,
    MAX_PREVIEW_ARTICLE_PERCENT,
    MAX_PREVIEW_ARTICLE_SAMPLES,
    build_preview,
    collapse_whitespace,
    group_positions_by_sentence,
    sample_quality_key,
)


def _mk_text(sentences):
    return "".join(s + "。" for s in sentences)


def test_group_by_sentence():
    text = "短い文。" + "あ" * 80 + "。次の文です。"
    # matches in sentence 1 and 3
    positions = [(0, 2), (86, 2)]
    groups = group_positions_by_sentence(text, positions)
    assert len(groups) == 2
    (s1, m1), (s2, m2) = sorted(groups)
    assert s1[0] == 0 and m1 == ((0, 2),)
    assert m2 == ((86, 2),)


def test_quality_key_prefers_ideal_length():
    ideal = ((0, 80), ())
    short = ((0, 20), ())
    long_ = ((0, 300), ())
    acceptable = ((0, 55), ())
    ranked = sorted(
        [short, long_, ideal, acceptable], key=sample_quality_key, reverse=True
    )
    assert ranked[0] == ideal
    assert ranked[1] == acceptable
    assert ranked[-1] == long_


def test_sample_cap_and_percent():
    # many matching sentences; preview must cap at 3 samples and <=15%
    sentences = ["これは" + "て" * 70 + "すと" for _ in range(40)]
    text = _mk_text(sentences)
    positions = []
    off = 0
    for s in sentences:
        positions.append((off, 3))
        off += len(s) + 1
    samples = build_preview(text, positions)
    assert 1 <= len(samples) <= MAX_PREVIEW_ARTICLE_SAMPLES
    total = sum(s.text_len for s in samples)
    assert (
        len(samples) == 1
        or total / len(collapse_whitespace(text)) <= MAX_PREVIEW_ARTICLE_PERCENT
    )


def test_segments_mark_matches_and_trim():
    """Reference trim: fill to MAX_ACCEPTABLE around the max-match window,
    then add the ... indicator on each trimmed side (the indicator is ON
    TOP of the 100 chars, article_preview.py:338-356)."""
    text = "まえがき" + "み" * 150 + "キーワード" + "の" * 20 + "。"
    positions = [(154, 5)]
    samples = build_preview(text, positions)
    assert len(samples) == 1
    s = samples[0]
    ind = s.text.count("...")
    assert 1 <= ind <= 2
    assert s.text_len - 3 * ind <= MAX_ACCEPTABLE_SAMPLE_LEN
    # the whole tail fits (25 chars + match), so the trim keeps it and
    # fills the remainder from the head: indicator lands at the FRONT
    assert s.text.startswith("...")
    assert "キーワード" in s.text
    assert (True, "キーワード") in s.segments


def test_whitespace_collapsed():
    text = "単語  と\n\n単語。"
    samples = build_preview(text, [(0, 2)])
    assert "\n" not in samples[0].text
    assert "　" in samples[0].text


def test_trim_full_left_keeps_head_fills_tail():
    """Short head + match + long tail: the head fits within MAX, so the
    trim keeps it whole, fills from the tail, and puts ... at the end."""
    from myaku_ray.preview import build_preview

    text = "はじめ" + "キーワード" + "わ" * 150 + "。"
    samples = build_preview(text, [(3, 5)])
    assert len(samples) == 1
    s = samples[0]
    assert s.text.startswith("はじめキーワード")
    assert s.text.endswith("...")
    assert s.text_len - 3 == MAX_ACCEPTABLE_SAMPLE_LEN


def test_trim_balance_indicators_both_sides():
    """Match in the middle of a huge sentence: remainder splits between
    both neighbors with ... on each side."""
    from myaku_ray.preview import build_preview

    text = "ま" * 200 + "キーワード" + "の" * 200 + "。"
    samples = build_preview(text, [(200, 5)])
    s = samples[0]
    assert s.text.startswith("...")
    assert s.text.endswith("...")
    assert "キーワード" in s.text
    assert s.text_len - 6 <= MAX_ACCEPTABLE_SAMPLE_LEN


def test_expand_pulls_neighbor_sentences_toward_ideal():
    """A short match sentence expands with neighboring sentences toward
    the 70-90 ideal (article_preview.py:481-545)."""
    from myaku_ray.preview import (
        MAX_IDEAL_SAMPLE_LEN, MIN_ACCEPTABLE_SAMPLE_LEN, build_preview,
    )

    sents = ["あ" * 30 + "。", "キーワードだ。", "い" * 30 + "。", "う" * 30 + "。"]
    text = "".join(sents)
    samples = build_preview(text, [(31, 5)])
    assert len(samples) == 1
    s = samples[0]
    assert MIN_ACCEPTABLE_SAMPLE_LEN <= s.text_len <= MAX_IDEAL_SAMPLE_LEN + 10
    assert "キーワード" in s.text
    # expanded sample spans more than the 7-char match sentence
    assert s.text_len > 20


def test_expanded_sentences_not_reused_by_later_samples():
    """A sentence consumed by expansion cannot appear again as a later
    sample (the reference's _used_sentences bookkeeping)."""
    from myaku_ray.preview import build_preview

    # two match sentences adjacent: the first sample expands over the
    # second sentence, so only ONE sample must be emitted
    text = "キーワードはこれ。" + "キーワードもある。" + "お" * 400 + "。"
    samples = build_preview(text, [(0, 5), (9, 5)])
    starts = [s.start for s in samples]
    assert len(starts) == len(set(starts))
    joined = "".join(s.text for s in samples)
    assert joined.count("キーワードはこれ") == 1
    assert joined.count("キーワードもある") == 1
