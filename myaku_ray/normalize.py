"""Character/text normalization primitives shared by indexing and query paths.

Reproduces the reference semantics without external deps:

- ``normalize_char_width``: half-width katakana -> full-width katakana, then
  full-width latin/digit/symbol -> half-width (reference:
  myaku/utils/__init__.py:415-423, implemented there with jaconv
  ``h2z(kana=True)`` + ``z2h(ascii=True, digit=True)``).  Applied to BOTH
  index term keys (myaku/datatypes.py:399-405) and query strings
  (myakuweb-apiserver/search/views.py:305-310) so they meet in the middle.
- ``alnum_count``: number of alphanumeric chars (myaku/utils/__init__.py:410-412)
  — the doc-length statistic.
- ``text_hash``: SHA-256 hex of full text (myaku/datatypes.py:210-222) — the
  exact-dedup key.
- Sentence boundary finders over ``。？！?!\\n`` with consecutive-ender
  collapse (myaku/utils/__init__.py:39-46,262-321) — used for previews.

All functions are pure and deterministic; the serial oracle and the Ray
pipeline share them, which is what makes byte-/rank-identity testable.
"""

from __future__ import annotations

import hashlib

# ---------------------------------------------------------------------------
# Width normalization (jaconv-equivalent translation tables, built once).
# ---------------------------------------------------------------------------

# Half-width katakana block U+FF61..U+FF9F -> full-width equivalents.
_H2Z_SINGLE = {
    "｡": "。", "｢": "「", "｣": "」", "､": "、", "･": "・",
    "ｦ": "ヲ", "ｧ": "ァ", "ｨ": "ィ", "ｩ": "ゥ", "ｪ": "ェ", "ｫ": "ォ",
    "ｬ": "ャ", "ｭ": "ュ", "ｮ": "ョ", "ｯ": "ッ", "ｰ": "ー",
    "ｱ": "ア", "ｲ": "イ", "ｳ": "ウ", "ｴ": "エ", "ｵ": "オ",
    "ｶ": "カ", "ｷ": "キ", "ｸ": "ク", "ｹ": "ケ", "ｺ": "コ",
    "ｻ": "サ", "ｼ": "シ", "ｽ": "ス", "ｾ": "セ", "ｿ": "ソ",
    "ﾀ": "タ", "ﾁ": "チ", "ﾂ": "ツ", "ﾃ": "テ", "ﾄ": "ト",
    "ﾅ": "ナ", "ﾆ": "ニ", "ﾇ": "ヌ", "ﾈ": "ネ", "ﾉ": "ノ",
    "ﾊ": "ハ", "ﾋ": "ヒ", "ﾌ": "フ", "ﾍ": "ヘ", "ﾎ": "ホ",
    "ﾏ": "マ", "ﾐ": "ミ", "ﾑ": "ム", "ﾒ": "メ", "ﾓ": "モ",
    "ﾔ": "ヤ", "ﾕ": "ユ", "ﾖ": "ヨ",
    "ﾗ": "ラ", "ﾘ": "リ", "ﾙ": "ル", "ﾚ": "レ", "ﾛ": "ロ",
    "ﾜ": "ワ", "ﾝ": "ン", "ﾞ": "゛", "ﾟ": "゜",
}

# Base half-width char + voiced mark U+FF9E -> combined full-width char.
_H2Z_VOICED = {
    "ｶ": "ガ", "ｷ": "ギ", "ｸ": "グ", "ｹ": "ゲ", "ｺ": "ゴ",
    "ｻ": "ザ", "ｼ": "ジ", "ｽ": "ズ", "ｾ": "ゼ", "ｿ": "ゾ",
    "ﾀ": "ダ", "ﾁ": "ヂ", "ﾂ": "ヅ", "ﾃ": "デ", "ﾄ": "ド",
    "ﾊ": "バ", "ﾋ": "ビ", "ﾌ": "ブ", "ﾍ": "ベ", "ﾎ": "ボ",
    "ｳ": "ヴ",
}

# Base half-width char + semi-voiced mark U+FF9F -> combined full-width char.
_H2Z_SEMIVOICED = {
    "ﾊ": "パ", "ﾋ": "ピ", "ﾌ": "プ", "ﾍ": "ペ", "ﾎ": "ポ",
}

# Full-width ASCII U+FF01..U+FF5E -> half-width U+21..U+7E, plus the
# ideographic space U+3000 -> ' ' (matches jaconv's z2h ascii table).
_Z2H_ASCII = {chr(0xFF01 + i): chr(0x21 + i) for i in range(0x5E)}
_Z2H_ASCII["　"] = " "
_Z2H_TABLE = str.maketrans(_Z2H_ASCII)

_HALFWIDTH_KANA_MIN = "｡"
_HALFWIDTH_KANA_MAX = "ﾟ"


def h2z_kana(text: str) -> str:
    """Convert half-width katakana to full-width, combining voiced marks."""
    # Fast path: no half-width kana at all (the overwhelmingly common case).
    has_hw = False
    for ch in text:
        if _HALFWIDTH_KANA_MIN <= ch <= _HALFWIDTH_KANA_MAX:
            has_hw = True
            break
    if not has_hw:
        return text

    out: list[str] = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if _HALFWIDTH_KANA_MIN <= ch <= _HALFWIDTH_KANA_MAX:
            nxt = text[i + 1] if i + 1 < n else ""
            if nxt == "ﾞ" and ch in _H2Z_VOICED:
                out.append(_H2Z_VOICED[ch])
                i += 2
                continue
            if nxt == "ﾟ" and ch in _H2Z_SEMIVOICED:
                out.append(_H2Z_SEMIVOICED[ch])
                i += 2
                continue
            out.append(_H2Z_SINGLE.get(ch, ch))
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def z2h_ascii_digit(text: str) -> str:
    """Convert full-width latin/digit/symbol chars to half-width."""
    return text.translate(_Z2H_TABLE)


def normalize_char_width(text: str) -> str:
    """Normalize char widths: katakana -> full-width, latin/digit -> half-width.

    Mirrors reference ``normalize_char_width`` (myaku/utils/__init__.py:415-423).
    """
    return z2h_ascii_digit(h2z_kana(text))


# ---------------------------------------------------------------------------
# Doc statistics
# ---------------------------------------------------------------------------

def alnum_count(text: str) -> int:
    """Count alphanumeric characters (myaku/utils/__init__.py:410-412)."""
    return sum(c.isalnum() for c in text)


def text_hash(text: str) -> str:
    """SHA-256 hex digest of the text (myaku/datatypes.py:210-222)."""
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def doc_id_for_url(url: str) -> int:
    """Deterministic 63-bit doc id derived from the url.

    Independent of block/partition order so re-runs and resumed runs assign
    identical ids (resumability requirement, SURVEY.md §4).  63 bits so the
    value is positive in both Arrow int64 and DuckDB BIGINT.
    """
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big") & 0x7FFF_FFFF_FFFF_FFFF


# ---------------------------------------------------------------------------
# Sentence boundaries (preview/snippet support)
# ---------------------------------------------------------------------------

JPN_SENTENCE_ENDERS = ("。", "？", "！", "?", "!", "\n")


def find_jpn_sentence_start(text: str, pos: int) -> int:
    """Start index of the sentence containing pos (utils/__init__.py:262-284)."""
    while (
        pos > 0
        and text[pos] in JPN_SENTENCE_ENDERS
        and text[pos - 1] in JPN_SENTENCE_ENDERS
    ):
        pos -= 1
    prev = max(text.rfind(ch, 0, pos) for ch in JPN_SENTENCE_ENDERS)
    if prev == -1:
        return 0
    return prev + 1


def _full_sentence_ender(text: str, ender_pos: int) -> int:
    pos = ender_pos
    while (
        pos < len(text) - 1
        and text[pos] in JPN_SENTENCE_ENDERS
        and text[pos + 1] in JPN_SENTENCE_ENDERS
    ):
        pos += 1
    return pos


def find_jpn_sentence_end(text: str, pos: int) -> int:
    """End index of the sentence containing pos (utils/__init__.py:287-321)."""
    ends = []
    for ch in JPN_SENTENCE_ENDERS:
        idx = text.find(ch, pos)
        if idx == -1:
            ends.append(len(text) - 1)
        else:
            ends.append(_full_sentence_ender(text, idx))
    return min(ends)
