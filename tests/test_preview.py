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
    text = "まえがき" + "み" * 150 + "キーワード" + "の" * 20 + "。"
    positions = [(154, 5)]
    samples = build_preview(text, positions)
    assert len(samples) == 1
    s = samples[0]
    assert s.text_len <= MAX_ACCEPTABLE_SAMPLE_LEN
    assert s.text.endswith("...")


def test_whitespace_collapsed():
    text = "単語  と\n\n単語。"
    samples = build_preview(text, [(0, 2)])
    assert "\n" not in samples[0].text
    assert "　" in samples[0].text
