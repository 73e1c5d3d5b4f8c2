"""Tokenizer golden tests: segmentation, lemma mapping, offsets, phrases."""

from myaku_ray.lexicon import build_lexicon, build_phrases, surface_map
from myaku_ray.normalize import normalize_char_width
from myaku_ray.tokenizer import Tokenizer, get_tokenizer


def test_lexicon_shape():
    lex = build_lexicon()
    assert len(lex) >= 1900
    pos = {e.pos for e in lex}
    assert {"名詞", "動詞", "形容詞", "助詞", "外来語"} <= pos
    # surfaces unique across entries
    seen = set()
    for e in lex:
        for s in e.surfaces:
            assert s not in seen
            seen.add(s)


def test_particle_tokenization_and_offsets():
    tok = get_tokenizer()
    # pick two known lemmas deterministically
    lex = [e for e in build_lexicon() if e.pos == "名詞"]
    a, b = lex[0].surfaces[0], lex[1].surfaces[0]
    text = f"{a}は{b}を。"
    tokens = tok.tokenize(text)
    surfaces = [t.surface for t in tokens]
    assert surfaces == [a, "は", b, "を"]  # 。 dropped as symbol
    # char offsets exact
    assert tokens[0].start == 0 and tokens[0].length == len(a)
    assert tokens[1].start == len(a)
    assert tokens[2].start == len(a) + 1


def test_conjugated_surface_maps_to_base_form():
    tok = get_tokenizer()
    verbs = [e for e in build_lexicon() if e.pos == "動詞" and len(e.surfaces) > 2]
    v = verbs[0]
    conj = v.surfaces[1]  # e.g. the た-form
    assert conj != v.base_form
    items = tok.find_lexical_items(conj + "。")
    terms = {i["term"] for i in items}
    assert normalize_char_width(v.base_form) in terms


def test_width_normalized_term_keys():
    tok = get_tokenizer()
    kata = [e for e in build_lexicon() if e.pos == "外来語" and len(e.surfaces) > 1]
    e = kata[0]
    full, half = e.surfaces[0], e.surfaces[1]
    t_full = {i["term"] for i in tok.find_lexical_items(full)}
    t_half = {i["term"] for i in tok.find_lexical_items(half)}
    # half-width surface resolves to the same (full-width) term key
    assert t_full == t_half


def test_meta_phrase_posting_emitted():
    tok = get_tokenizer()
    a, b = build_phrases()[0]
    items = tok.find_lexical_items(f"{a}{b}。")
    terms = {i["term"] for i in items}
    assert a + b in terms  # the extra meta posting
    assert a in terms and b in terms  # plus the individual tokens


def test_reduce_positions_and_tf():
    tok = get_tokenizer()
    lex = [e for e in build_lexicon() if e.pos == "名詞"]
    w = lex[5].surfaces[0]
    text = f"{w}と{w}。{w}！"
    (item,) = [i for i in tok.find_lexical_items(text) if i["term"] == normalize_char_width(w)]
    assert item["tf"] == 3
    starts = [p[0] for p in item["positions"]]
    assert starts == sorted(starts)
    assert len(set(item["positions"])) == 3


def test_unknown_latin_run_groups():
    tok = Tokenizer()
    items = tok.find_lexical_items("xyzzy123。")
    # one unknown-run token, lower-cased half-width base
    assert any(i["term"] == "xyzzy123" for i in items)


def test_find_term_tfs_matches_lexical_items():
    """Build-side fast path produces identical (term, tf) pairs."""
    from myaku_ray.corpus import gen_page_row

    tok = get_tokenizer()
    for i in range(0, 120, 7):
        text = gen_page_row(i, 200)["text"]
        if not text:
            continue
        want = {it["term"]: it["tf"] for it in tok.find_lexical_items(text)}
        got = tok.find_term_tfs(text)
        assert got == want, i


def test_fast_tfs_equals_slow_on_corpus_sample():
    """The fused finditer tf path must equal the longest-match-loop
    reference on real corpus texts (incl. width variants, unknown runs,
    phrases, paywalled-ish noise)."""
    from myaku_ray.corpus import gen_page_row
    from myaku_ray.html_extract import extract_page
    from myaku_ray.tokenizer import get_tokenizer

    tok = get_tokenizer()
    assert tok._fast_ok
    checked = 0
    for i in range(0, 300):
        row = gen_page_row(i, 300)
        if row["lang"] != "ja":
            continue
        er = extract_page(row["html"], row["url"])
        if not er.ok:
            continue
        assert tok.find_term_tfs(er.text) == tok._find_term_tfs_slow(er.text), i
        checked += 1
    assert checked > 100


def test_fast_tfs_edge_cases():
    from myaku_ray.tokenizer import get_tokenizer

    tok = get_tokenizer()
    for text in (
        "",
        " ",
        "xyzzy",            # pure unknown latin run
        "ＡＢＣ",            # full-width latin run
        "。、！",            # symbols only
        "のははの",          # particles only
    ):
        assert tok.find_term_tfs(text) == tok._find_term_tfs_slow(text), repr(text)
