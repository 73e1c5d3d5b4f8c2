"""Alt-form group table + expansion semantics (no Ray needed).

QueryType contract (myaku/datastore/__init__.py:26-68): exact(q) = {q};
possible(q) = forms sharing any entry with q; definite(q) = possible forms
whose EVERY entry also contains q (the 落ち込む/落ちこむ vs かえる rules).
"""

from myaku_ray.lexicon import (
    _form_entry_map,
    alt_form_entries,
    build_lexicon,
    expand_alt_forms,
    surface_map,
)


def test_groups_deterministic_and_well_formed():
    ents = alt_form_entries()
    assert ents == alt_form_entries()
    assert len(ents) == 240
    base_forms = {e.base_form for e in build_lexicon()}
    for forms in ents:
        assert 2 <= len(forms) <= 3
        assert list(forms) == sorted(set(forms))
        for f in forms:
            assert f in base_forms or f in surface_map()


def test_expansion_nesting_and_identity():
    fm = _form_entry_map()
    for f in list(fm)[:300]:
        e = set(expand_alt_forms(f))
        d = set(expand_alt_forms(f, "definite"))
        p = set(expand_alt_forms(f, "possible"))
        assert e == {f}
        assert e <= d <= p
        # every definite alt's entries are a subset of q's entries
        q_ents = set(fm[f])
        for b in d - e:
            assert set(fm[b]) <= q_ents


def test_ambiguous_kana_is_possible_not_definite():
    fm = _form_entry_map()
    ents = alt_form_entries()
    amb = [f for f, v in fm.items() if len(v) > 1]
    assert len(amb) == 50
    for a in amb[:10]:
        # a belongs to 2 entries; pick a form unique to one of them
        for gi in fm[a]:
            partner = next(
                (f for f in ents[gi] if f != a and len(fm[f]) == 1), None
            )
            if partner is None:
                continue
            assert a in expand_alt_forms(partner, "possible")
            assert a not in expand_alt_forms(partner, "definite")
            # asymmetry: from the ambiguous form, the partner IS definite
            # only if partner's entries are a subset of a's (true: 1 <= 2)
            assert partner in expand_alt_forms(a, "definite")


def test_group_free_terms_expand_to_singleton():
    fm = _form_entry_map()
    free = next(
        e.base_form for e in build_lexicon() if e.base_form not in fm
    )
    for qt in ("exact", "definite", "possible"):
        assert expand_alt_forms(free, qt) == [free]


def test_unknown_query_type_raises():
    import pytest

    with pytest.raises(ValueError):
        expand_alt_forms("の", "fuzzy")


def test_loser_cache_invalidates_on_dedup_rerun(tmp_path):
    """A long-lived worker's loser cache must not serve a previous
    build's loser set after the dedup stage is re-run at the same path
    (keyed by the stage marker's mtime)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from myaku_ray.pipelines.build import _loser_ids_for

    d = tmp_path / "dedup"
    d.mkdir()

    def write(ids):
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64())}),
            str(d / "part.parquet"),
        )
        with open(d / "_SUCCESS", "w") as f:
            f.write("ok")

    write([3, 1, 2])
    assert _loser_ids_for(str(d)).tolist() == [1, 2, 3]
    time.sleep(0.01)
    write([9, 7])
    os.utime(d / "_SUCCESS")  # ensure a distinct mtime on coarse clocks
    assert _loser_ids_for(str(d)).tolist() == [7, 9]
