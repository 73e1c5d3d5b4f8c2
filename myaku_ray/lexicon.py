"""Deterministic embedded lexicon: corpus vocabulary + tokenizer dictionary.

The sandbox has no MeCab/ipadic/JMdict (SURVEY.md §7.0), so the tokenizer
dictionary is a deterministic, seeded, self-contained lexicon that plays the
role of ipadic-NEologd + JMdict in the reference
(myaku/japanese_analysis.py:424-618,728-852).  The synthetic page corpus is
generated FROM this lexicon, so the dictionary fully covers the corpus and
term statistics (Zipf skew, near-universal particles) are realistic.

Entry model mirrors the reference's lexical-item shape
(myaku/datatypes.py:307-425): each lemma has a ``base_form`` (the normalized
term key, myaku/datatypes.py:399-405), a ``reading`` (katakana), a coarse POS,
and one or more ``surface`` variants (conjugations, katakana/half-width
variants, full-width latin variants) that all map back to the base form —
the analog of MeCab producing base forms for conjugated surfaces.

Everything is derived from ``LEXICON_SEED`` with ``random.Random`` only; no
wall-clock, no external files.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from functools import lru_cache

from myaku_ray.normalize import normalize_char_width

LEXICON_SEED = 0xA11CE

# Syllable pools (gojuon; no rare digraphs to keep generation simple).
_HIRA = list(
    "あいうえおかきくけこさしすせそたちつてとなにぬねのはひふへほ"
    "まみむめもやゆよらりるれろわ"
    "がぎぐげござじずぜぞだでどばびぶべぼぱぴぷぺぽ"
)
_KATA = list(
    "アイウエオカキクケコサシスセソタチツテトナニヌネノハヒフヘホ"
    "マミムメモヤユヨラリルレロワ"
    "ガギグゲゴザジズゼゾダデドバビブベボパピプペポ"
)
# Map full-width katakana -> half-width sequence (for half-width variants).
_KATA_TO_HW = {
    "ア": "ｱ", "イ": "ｲ", "ウ": "ｳ", "エ": "ｴ", "オ": "ｵ",
    "カ": "ｶ", "キ": "ｷ", "ク": "ｸ", "ケ": "ｹ", "コ": "ｺ",
    "サ": "ｻ", "シ": "ｼ", "ス": "ｽ", "セ": "ｾ", "ソ": "ｿ",
    "タ": "ﾀ", "チ": "ﾁ", "ツ": "ﾂ", "テ": "ﾃ", "ト": "ﾄ",
    "ナ": "ﾅ", "ニ": "ﾆ", "ヌ": "ﾇ", "ネ": "ﾈ", "ノ": "ﾉ",
    "ハ": "ﾊ", "ヒ": "ﾋ", "フ": "ﾌ", "ヘ": "ﾍ", "ホ": "ﾎ",
    "マ": "ﾏ", "ミ": "ﾐ", "ム": "ﾑ", "メ": "ﾒ", "モ": "ﾓ",
    "ヤ": "ﾔ", "ユ": "ﾕ", "ヨ": "ﾖ",
    "ラ": "ﾗ", "リ": "ﾘ", "ル": "ﾙ", "レ": "ﾚ", "ロ": "ﾛ",
    "ワ": "ﾜ", "ン": "ﾝ", "ー": "ｰ",
    "ガ": "ｶﾞ", "ギ": "ｷﾞ", "グ": "ｸﾞ", "ゲ": "ｹﾞ", "ゴ": "ｺﾞ",
    "ザ": "ｻﾞ", "ジ": "ｼﾞ", "ズ": "ｽﾞ", "ゼ": "ｾﾞ", "ゾ": "ｿﾞ",
    "ダ": "ﾀﾞ", "ヂ": "ﾁﾞ", "ヅ": "ﾂﾞ", "デ": "ﾃﾞ", "ド": "ﾄﾞ",
    "バ": "ﾊﾞ", "ビ": "ﾋﾞ", "ブ": "ﾌﾞ", "ベ": "ﾍﾞ", "ボ": "ﾎﾞ",
    "パ": "ﾊﾟ", "ピ": "ﾋﾟ", "プ": "ﾌﾟ", "ペ": "ﾍﾟ", "ポ": "ﾎﾟ",
}
_KANJI = list(
    "日月火水木金土山川田人子女男学校生先私会社国語文字読書新聞"
    "時間分年週朝昼夜食飲見行来帰話聞買売作思考知電車駅道町村市"
    "大小高安長短白黒赤青空海風雨雪花草林森石犬猫鳥魚肉野菜茶酒"
    "手足目耳口頭心体力気元病院薬医者仕事勉強運動音楽映画写真絵"
)
_HIRA_PLAIN = list("あいうえおかきくけこさしすせそたちつてとなにぬねのはひふへほまみむめもやゆよらりるれろわ")

PARTICLES = ["は", "が", "の", "に", "を", "と", "で", "も", "へ", "や", "から", "まで"]

# Verb conjugation suffix patterns keyed by the verb's final base char.
_VERB_CONJ = {
    "る": ["る", "た", "て", "ない", "ます", "ました"],
    "く": ["く", "いた", "いて", "かない", "きます"],
    "す": ["す", "した", "して", "さない", "します"],
    "む": ["む", "んだ", "んで", "まない", "みます"],
    "う": ["う", "った", "って", "わない", "います"],
}


@dataclass(frozen=True)
class LexEntry:
    """One dictionary lemma with its surface variants."""

    base_form: str            # normalized term key (the posting key)
    reading: str              # katakana reading
    pos: str                  # coarse POS: 名詞/動詞/形容詞/助詞/記号/外来語
    surfaces: tuple = field(default_factory=tuple)  # all surface forms


def _kata_reading(rng: random.Random, length: int) -> str:
    return "".join(rng.choice(_KATA[:45]) for _ in range(length))


@lru_cache(maxsize=1)
def build_lexicon() -> list[LexEntry]:
    """Build the full deterministic lexicon (~2k lemmas + particles)."""
    rng = random.Random(LEXICON_SEED)
    entries: list[LexEntry] = []
    seen_surfaces: set[str] = set()

    def add(base: str, reading: str, pos: str, surfaces: list[str]) -> bool:
        # Reject entries whose base surface collides with an existing surface
        # (keeps the longest-match segmentation stable and unambiguous).
        uniq = []
        for s in surfaces:
            if s not in seen_surfaces and s not in uniq:
                uniq.append(s)
        if not uniq or surfaces[0] in seen_surfaces:
            return False
        for s in uniq:
            seen_surfaces.add(s)
        entries.append(LexEntry(base, reading, pos, tuple(uniq)))
        return True

    # Particles first — they win ties and appear in ~every sentence.
    for p in PARTICLES:
        add(p, p, "助詞", [p])

    # ~700 hiragana native nouns (2-4 syllables).
    made = 0
    while made < 700:
        w = "".join(rng.choice(_HIRA) for _ in range(rng.randint(2, 4)))
        if add(w, _kata_reading(rng, len(w)), "名詞", [w]):
            made += 1

    # ~500 kanji compound nouns (2-3 chars) with hiragana-reading variants.
    made = 0
    while made < 500:
        w = "".join(rng.choice(_KANJI) for _ in range(rng.randint(2, 3)))
        reading = _kata_reading(rng, rng.randint(2, 5))
        if add(w, reading, "名詞", [w]):
            made += 1

    # ~350 katakana loanwords; surfaces include the half-width variant so
    # h2z width-normalization is exercised end-to-end.
    made = 0
    while made < 350:
        w = "".join(rng.choice(_KATA) for _ in range(rng.randint(3, 5)))
        hw = "".join(_KATA_TO_HW[c] for c in w)
        if add(w, w, "外来語", [w, hw]):
            made += 1

    # ~300 verbs: kanji stem + ending, conjugated surfaces all mapping to the
    # base (dictionary) form — the MeCab base_form analog.
    made = 0
    endings = list(_VERB_CONJ)
    while made < 300:
        stem = rng.choice(_KANJI) + rng.choice(_HIRA_PLAIN)
        end = rng.choice(endings)
        base = stem + end
        surfaces = [stem + suf for suf in _VERB_CONJ[end]]
        if add(base, _kata_reading(rng, 3), "動詞", surfaces):
            made += 1

    # ~100 adjectives: stem + い with い/かった/くない variants.
    made = 0
    while made < 100:
        stem = rng.choice(_KANJI)
        base = stem + "い"
        surfaces = [base, stem + "かった", stem + "くない"]
        if add(base, _kata_reading(rng, 3), "形容詞", surfaces):
            made += 1

    # ~50 ASCII/latin tech terms; full-width variants normalize to the
    # half-width base via z2h (normalize_char_width M6).
    made = 0
    while made < 50:
        w = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(2, 5)))
        w = w.upper() if rng.random() < 0.5 else w
        fw = "".join(chr(ord(c) + 0xFEE0) for c in w)
        if add(w, w, "名詞", [w, fw]):
            made += 1

    return entries


@lru_cache(maxsize=1)
def build_phrases() -> list[tuple[str, ...]]:
    """Multi-lemma set phrases for the meta-lexical-item path.

    The reference finds extra lexical items by sliding an n-gram window over
    base forms and looking the tuple up in JMdict
    (myaku/japanese_analysis.py:248-369).  Here: 60 deterministic 2-lemma
    phrases drawn from the noun entries; when two adjacent tokens' base forms
    match a phrase, an extra posting for the joined phrase is emitted.
    """
    rng = random.Random(LEXICON_SEED + 1)
    lex = [e for e in build_lexicon() if e.pos == "名詞" and len(e.base_form) >= 2]
    phrases = set()
    while len(phrases) < 60:
        a, b = rng.sample(lex, 2)
        phrases.add((a.base_form, b.base_form))
    return sorted(phrases)


# Conjugated-form names by suffix, per verb-ending class (aligned with
# _VERB_CONJ's suffix lists) and for adjectives — the MecabLexicalItemInterp
# (conjugated_type, conjugated_form) analog (myaku/datatypes.py:329-342).
_VERB_FORM_NAMES = {
    "る": ("基本形", "過去形", "て形", "否定形", "丁寧形", "丁寧過去形"),
    "く": ("基本形", "過去形", "て形", "否定形", "丁寧形"),
    "す": ("基本形", "過去形", "て形", "否定形", "丁寧形"),
    "む": ("基本形", "過去形", "て形", "否定形", "丁寧形"),
    "う": ("基本形", "過去形", "て形", "否定形", "丁寧形"),
}
_ADJ_SUFFIX_FORMS = {"い": "基本形", "かった": "過去形", "くない": "否定形"}


def _conj_of(e: "LexEntry", surface: str) -> tuple[str | None, str | None]:
    """(conjugated_type, conjugated_form) of one surface variant, derived
    from the suffix so dropped-collision surfaces cannot misalign names."""
    if e.pos == "動詞":
        end = e.base_form[-1]
        stem = e.base_form[:-1]
        suffix = surface[len(stem):]
        names = _VERB_FORM_NAMES[end]
        try:
            form = names[_VERB_CONJ[end].index(suffix)]
        except ValueError:
            form = None
        return f"{end}活用", form
    if e.pos == "形容詞":
        stem = e.base_form[:-1]
        return "形容詞活用", _ADJ_SUFFIX_FORMS.get(surface[len(stem):])
    return None, None


@lru_cache(maxsize=1)
def surface_map() -> dict[str, tuple[str, str, str, str | None, str | None]]:
    """surface -> (base_form, reading, pos, conj_type, conj_form) for every
    surface variant."""
    m: dict[str, tuple[str, str, str, str | None, str | None]] = {}
    for e in build_lexicon():
        for s in e.surfaces:
            ct, cf = _conj_of(e, s)
            m.setdefault(
                s, (normalize_char_width(e.base_form), e.reading, e.pos, ct, cf)
            )
    return m


@lru_cache(maxsize=1)
def phrase_entry_ids() -> dict[tuple[str, ...], str]:
    """phrase tuple -> deterministic JMdict-style entry sequence id (the
    jmdict_interp_entry_id analog, myaku/japanese_analysis.py:355-366)."""
    return {
        p: str(1_000_000 + i) for i, p in enumerate(build_phrases())
    }


@lru_cache(maxsize=1)
def max_surface_len() -> int:
    return max(len(s) for s in surface_map())


# ---------------------------------------------------------------------------
# Alternate-form groups (DEFINITE_ALT_FORMS / POSSIBLE_ALT_FORMS)
#
# The reference reserves base_form_definite_group / base_form_possible_group
# index fields and the DEFINITE_ALT_FORMS / POSSIBLE_ALT_FORMS QueryType
# members but never implements the search (myaku/datastore/__init__.py:26-68,
# database.py:164-174).  Here the groups are implemented end to end: a
# synthetic JMdict-entry table layered ON TOP of the existing lexicon (the
# corpus, segmentation and every existing golden are untouched — groups are
# pure query-side metadata), where each "entry" is one lexical item with
# several alternate spellings (base forms) — the 落ち込む/落ちこむ analog.
# A base form shared by two entries is an AMBIGUOUS spelling (the かえる
# case): a possible alternate form of the other spellings in each entry, but
# a definite alternate form of none of them.
#
# Semantics (myaku/datastore/__init__.py docstring):
#   exact(q)    = {q}
#   possible(q) = {b : some entry contains both q and b}
#   definite(q) = {b in possible(q) : EVERY entry containing b contains q}
# ---------------------------------------------------------------------------

_ALT_SEED = LEXICON_SEED + 2


@lru_cache(maxsize=1)
def alt_form_entries() -> list[tuple[str, ...]]:
    """Synthetic JMdict entries: each a sorted tuple of alternate base-form
    spellings of one lexical item.  ~200 noun entries (kanji spelling +
    kana spelling) and ~40 verb entries (two base-form spellings); 50 of
    the noun kana spellings are additionally inserted into a SECOND entry,
    making them ambiguous (possible-but-not-definite alternates).  All
    forms are normalized term keys.  Entry count is dictionary-sized
    (JMdict-scale at worst) — broadcastable, never shuffled."""
    rng = random.Random(_ALT_SEED)
    lex = build_lexicon()

    def _is_kanji(w: str) -> bool:
        return all("一" <= c <= "鿿" for c in w)

    def _is_hira(w: str) -> bool:
        return all("぀" <= c <= "ゟ" for c in w)

    kanji_nouns = [e.base_form for e in lex if e.pos == "名詞" and _is_kanji(e.base_form)]
    hira_nouns = [e.base_form for e in lex if e.pos == "名詞" and _is_hira(e.base_form)]
    verbs = [e.base_form for e in lex if e.pos == "動詞"]

    n_noun_groups = 200
    kanji_sel = rng.sample(kanji_nouns, n_noun_groups)
    hira_sel = rng.sample(hira_nouns, n_noun_groups)
    groups: list[set[str]] = [
        {normalize_char_width(k), normalize_char_width(h)}
        for k, h in zip(kanji_sel, hira_sel)
    ]
    # 50 ambiguous kana spellings: group a's kana also joins group b.
    amb = rng.sample(range(n_noun_groups), 100)
    for a, b in zip(amb[:50], amb[50:]):
        groups[b].add(normalize_char_width(hira_sel[a]))

    # 40 verb entries: two verb base forms as alternate spellings.
    verb_sel = rng.sample(verbs, 80)
    for i in range(0, 80, 2):
        groups.append(
            {normalize_char_width(verb_sel[i]), normalize_char_width(verb_sel[i + 1])}
        )

    return [tuple(sorted(g)) for g in groups]


@lru_cache(maxsize=1)
def _form_entry_map() -> dict[str, tuple[int, ...]]:
    """base form -> ids of entries containing it (vocab-sized)."""
    m: dict[str, list[int]] = {}
    for gi, forms in enumerate(alt_form_entries()):
        for f in forms:
            m.setdefault(f, []).append(gi)
    return {f: tuple(v) for f, v in m.items()}


def expand_alt_forms(term: str, query_type: str = "exact") -> list[str]:
    """Expand a normalized term key to its alternate-form member set under
    a query type ('exact' | 'definite' | 'possible').  Sorted; always
    contains ``term`` (EXACT matches are a subset of both alt types)."""
    if query_type == "exact":
        return [term]
    if query_type not in ("definite", "possible"):
        raise ValueError(f"unknown query_type: {query_type!r}")
    fm = _form_entry_map()
    ents = fm.get(term)
    if not ents:
        return [term]
    q_ents = set(ents)
    entries = alt_form_entries()
    cands = {f for gi in ents for f in entries[gi]}
    if query_type == "definite":
        cands = {f for f in cands if set(fm[f]) <= q_ents}
    cands.add(term)
    return sorted(cands)
