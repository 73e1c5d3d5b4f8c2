"""Unit tests for normalization primitives (reference parity semantics)."""

from myaku_ray.normalize import (
    alnum_count,
    find_jpn_sentence_end,
    find_jpn_sentence_start,
    normalize_char_width,
    text_hash,
)


def test_h2z_katakana():
    # half-width katakana -> full-width, voiced marks combined
    assert normalize_char_width("ｱｲｳｴｵ") == "アイウエオ"
    assert normalize_char_width("ｶﾞｷﾞｸﾞ") == "ガギグ"
    assert normalize_char_width("ﾊﾟﾋﾟﾌﾟ") == "パピプ"
    assert normalize_char_width("ﾃﾞｽﾄｯﾌﾟ") == "デストップ"
    # half-width kana punctuation
    assert normalize_char_width("｡｢｣､･") == "。「」、・"


def test_z2h_ascii_digit():
    # full-width latin/digits/symbols -> half-width
    assert normalize_char_width("ＡＢＣａｂｃ") == "ABCabc"
    assert normalize_char_width("０１２３") == "0123"
    assert normalize_char_width("！？") == "!?"
    assert normalize_char_width("　") == " "  # ideographic space


def test_mixed_and_idempotent():
    s = "ﾊﾟｿｺﾝでＰｙｔｈｏｎ３を学ぶ"
    out = normalize_char_width(s)
    assert out == "パソコンでPython3を学ぶ"
    assert normalize_char_width(out) == out
    # hiragana and kanji untouched
    assert normalize_char_width("日本語のテスト") == "日本語のテスト"


def test_alnum_count():
    assert alnum_count("abc 123!") == 6
    assert alnum_count("日本語です。") == 5  # 。 is not alnum
    assert alnum_count("") == 0


def test_text_hash_is_sha256_hex():
    import hashlib

    t = "テスト text"
    assert text_hash(t) == hashlib.sha256(t.encode()).hexdigest()


def test_sentence_bounds():
    text = "これは文。次の文？！最後\n"
    # pos inside first sentence
    assert find_jpn_sentence_start(text, 2) == 0
    assert find_jpn_sentence_end(text, 2) == 4  # the 。
    # pos inside second sentence: ends at ！ (consecutive-ender collapse)
    start2 = find_jpn_sentence_start(text, 6)
    assert start2 == 5
    assert find_jpn_sentence_end(text, 6) == 9  # ？！ collapses to the ！
