"""Lexical-interpretation payload parity (possible_interps /
interp_position_map), mirroring the reference's golden FLI assertions
(myaku/tests/end_to_end/test_crawl.py:856-1650 checks these field by
field; data model: myaku/datatypes.py:307-342,428-505; BSON layout:
myaku/datastore/document_convert.py:156-171)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from myaku_ray.lexicon import build_lexicon, build_phrases, phrase_entry_ids
from myaku_ray.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def tok():
    return Tokenizer()


def _fli(items, term):
    m = {it["term"]: it for it in items}
    assert term in m, (term, sorted(m)[:10])
    return m[term]


def test_verb_two_conjugations_interp_position_map(tok):
    """A verb found under two conjugated surfaces yields ONE FLI with TWO
    MeCab interps, and interp_position_map records each interp's own
    positions (they differ from the union)."""
    verb = next(
        e for e in build_lexicon() if e.pos == "動詞" and len(e.surfaces) >= 3
    )
    s_dict, s_past = verb.surfaces[0], verb.surfaces[1]
    text = s_dict + "は" + s_past
    items = tok.find_lexical_items(text)
    fli = _fli(items, verb.base_form)

    assert fli["tf"] == 2
    assert fli["positions"] == [
        (0, len(s_dict)), (len(s_dict) + 1, len(s_past))
    ]
    interps = fli["possible_interps"]
    assert len(interps) == 2
    for it in interps:
        assert it["interp_sources"] == ["MECAB"]
        assert it["jmdict_interp_entry_id"] is None
        assert it["mecab_interp"]["parts_of_speech"] == ["動詞"]
        assert it["mecab_interp"]["conjugated_type"] == verb.base_form[-1] + "活用"
    assert interps[0]["mecab_interp"]["conjugated_form"] == "基本形"
    assert interps[1]["mecab_interp"]["conjugated_form"] == "過去形"
    # each interp covers only its own occurrence -> both appear in the map
    assert fli["interp_position_map"] == {
        "0": [(0, len(s_dict))],
        "1": [(len(s_dict) + 1, len(s_past))],
    }


def test_width_variants_share_one_interp(tok):
    """Katakana loanword + its half-width variant: same base form, same
    interpretation -> ONE interp covering all positions, map is None
    (convert_interp_pos_map_to_doc emits null then)."""
    kata = next(
        e for e in build_lexicon() if e.pos == "外来語" and len(e.surfaces) > 1
    )
    full, half = kata.surfaces[0], kata.surfaces[1]
    text = full + "と" + half
    fli = _fli(tok.find_lexical_items(text), kata.base_form)
    assert fli["tf"] == 2
    assert len(fli["possible_interps"]) == 1
    assert fli["interp_position_map"] is None
    it = fli["possible_interps"][0]
    assert it["mecab_interp"]["parts_of_speech"] == ["外来語"]
    assert it["mecab_interp"]["conjugated_type"] is None


def test_meta_phrase_jmdict_interp(tok):
    """A 2-lemma set phrase emits an extra FLI whose single interp is the
    JMdict-analog (entry id, no mecab_interp) — the meta-lexical-item
    path (myaku/japanese_analysis.py:319-369)."""
    phrase = build_phrases()[0]
    a, b = phrase
    text = a + b
    items = tok.find_lexical_items(text)
    fli = _fli(items, a + b)
    assert fli["pos"] == "連語"
    assert len(fli["possible_interps"]) == 1
    it = fli["possible_interps"][0]
    assert it["interp_sources"] == ["JMDICT_MECAB_DECOMP"]
    assert it["mecab_interp"] is None
    assert it["jmdict_interp_entry_id"] == phrase_entry_ids()[phrase]
    assert fli["positions"] == [(0, len(a) + len(b))]
    # the component lemmas keep their own MECAB FLIs
    for comp in (a, b):
        comp_fli = _fli(items, comp)
        assert comp_fli["possible_interps"][0]["interp_sources"] == ["MECAB"]


def test_find_term_tfs_agrees_with_interp_flis(tok):
    """tf parity between the build fast path and the interp-carrying FLI
    path must survive the interp extension."""
    verb = next(e for e in build_lexicon() if e.pos == "動詞")
    phrase = build_phrases()[0]
    text = verb.surfaces[0] + "は" + phrase[0] + phrase[1] + "。" + verb.surfaces[-1]
    items = tok.find_lexical_items(text)
    tfs = tok.find_term_tfs(text)
    assert tfs == {it["term"]: it["tf"] for it in items}


def test_fli_stage_arrow_schema(ray_session):
    """FliStage carries the interp payload through a distributed
    map_batches with the typed Arrow schema."""
    import ray.data as rd

    from myaku_ray.lexicon import build_lexicon
    from myaku_ray.stages.tokenize import FLI_SCHEMA, FliStage

    verb = next(
        e for e in build_lexicon() if e.pos == "動詞" and len(e.surfaces) >= 3
    )
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    verb.surfaces[0] + "は" + verb.surfaces[1],
                    verb.surfaces[0],
                ]
            ),
        }
    )
    out = (
        rd.from_arrow(docs)
        .map_batches(FliStage, batch_format="pyarrow", concurrency=1)
        .take_all()
    )
    t = pa.Table.from_pylist(out)
    assert set(FLI_SCHEMA.names) <= set(t.column_names)
    rows = {r["term"]: r for r in out if r["doc_id"] == 1}
    vf = rows[verb.base_form]
    assert len(vf["possible_interps"]) == 2
    assert vf["interp_position_map"][0] is not None
    # doc 2: single occurrence -> one interp, null map entry
    rows2 = {r["term"]: r for r in out if r["doc_id"] == 2}
    assert rows2[verb.base_form]["interp_position_map"][0] is None


def test_interp_profile_matches_stored_golden(ray_session):
    """The distributed FLI interp-payload digest equals the stored golden
    computed by the serial tokenizer (tools/gen_pages_golden.py)."""
    import duckdb
    import pandas as pd

    from myaku_ray.functions.fulltext import pages_fli_interp_profile
    from myaku_ray.functions.pages_golden import PAGES_FLI_INTERP_PROFILE_SQL

    got = pages_fli_interp_profile("/root/testdata/sf0.001").to_pandas()
    want = duckdb.sql(PAGES_FLI_INTERP_PROFILE_SQL).df()
    key = ["term_pos", "interp_pos", "conj_type", "conj_form", "sources"]
    got = got[sorted(got.columns)].sort_values(key).reset_index(drop=True)
    want = (
        want[sorted(want.columns)]
        .sort_values(key)
        .reset_index(drop=True)
        .astype(got.dtypes.to_dict())
    )
    pd.testing.assert_frame_equal(got, want)
