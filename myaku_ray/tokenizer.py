"""Deterministic dictionary-driven tokenizer (MeCab/JMdict stand-in).

Reproduces the SHAPE of the reference analysis pipeline
(myaku/japanese_analysis.py:172-211,248-369,964-1059):

1. Split text into blocks by lines, tracking char offsets incl. ``\\n``
   (reference ``:185-210``).
2. Longest-match segmentation against the embedded lexicon (the MeCab parse
   analog), producing tokens with surface, base form, reading, POS and
   **character** offsets (reference positions are char offsets,
   myaku/datatypes.py:115-131).
3. Drop symbol tokens (POS 記号; reference ``:371-384``).
4. Meta lexical items: slide a 2-gram window over base forms; tuples present
   in the phrase dictionary emit an extra posting (reference ``:248-369``).
5. ``reduce_found_lexical_items``: group by (base_form) within the document,
   union positions (myaku/datatypes.py:428-505) — a LOCAL combine, no
   shuffle, because the (term, doc) grouping key never crosses documents.

Unknown runs of alphanumeric chars become single tokens with
``base_form = normalize_char_width(run).lower()`` (the unknown-word path).
The tokenizer state (surface dict, max token length) is loaded once per
actor in the Ray stage (``stages/tokenize.py``), mirroring the reference's
singleton-per-process tagger (myaku/utils/__init__.py:746-787).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from myaku_ray.lexicon import (
    build_phrases,
    max_surface_len,
    phrase_entry_ids,
    surface_map,
)
from myaku_ray.normalize import normalize_char_width

_SYMBOL_POS = "記号"


def _is_latin_alnum(ch: str) -> bool:
    """ASCII or full-width-ASCII letter/digit (groups into one unknown run)."""
    o = ord(ch)
    return (
        (0x30 <= o <= 0x39)
        or (0x41 <= o <= 0x5A)
        or (0x61 <= o <= 0x7A)
        or (0xFF10 <= o <= 0xFF19)
        or (0xFF21 <= o <= 0xFF3A)
        or (0xFF41 <= o <= 0xFF5A)
    )


class Token(NamedTuple):
    surface: str
    base_form: str
    reading: str
    pos: str
    start: int     # char offset in full text
    length: int    # char length of the surface
    conj_type: str | None = None   # MecabLexicalItemInterp.conjugated_type
    conj_form: str | None = None   # MecabLexicalItemInterp.conjugated_form


def _trie_regex(words) -> str:
    """Trie-factored alternation: shared prefixes collapse into nested
    groups and every word-end becomes a GREEDY optional continuation, so
    the regex engine returns the LONGEST dictionary match at each
    position without alternation backtracking (a flat 4.6k-way
    alternation is ~5x slower than the Python loop; the trie form scans
    at C speed)."""
    import re as _re

    trie: dict = {}
    for w in words:
        d = trie
        for ch in w:
            d = d.setdefault(ch, {})
        d[""] = True

    def emit(d: dict) -> str:
        end = "" in d
        subs = [_re.escape(ch) + emit(d[ch]) for ch in sorted(k for k in d if k)]
        if not subs:
            return ""
        body = subs[0] if len(subs) == 1 else "(?:" + "|".join(subs) + ")"
        # wrap the WHOLE continuation: `?` on a bare concatenation would
        # bind only the last atom and lose words on single-child chains
        return "(?:" + body + ")?" if end else body

    return emit(trie)


class Tokenizer:
    """Stateful tokenizer; construct once per worker/actor."""

    def __init__(self) -> None:
        self._surfaces = surface_map()
        self._max_len = max_surface_len()
        self._phrases = set(build_phrases())
        self._phrase_ids = phrase_entry_ids()
        # candidate match lengths per first char, longest first — the
        # longest-match scan only probes lengths that exist for that
        # first char instead of every length down from the global max
        by_first: dict[str, set[int]] = {}
        for s in self._surfaces:
            by_first.setdefault(s[0], set()).add(len(s))
        self._lens_by_first: dict[str, tuple[int, ...]] = {
            c: tuple(sorted(lens, reverse=True)) for c, lens in by_first.items()
        }
        import re as _re

        self._pat = _re.compile(_trie_regex(list(self._surfaces)))
        # The finditer fast path resumes AFTER a swallowed match's end,
        # which is only safe when no surface mixes latin-alnum and
        # non-latin chars (a swallowed match starts latin, so an all-or-
        # nothing script rule guarantees it cannot extend past the run).
        self._fast_ok = all(
            (not _is_latin_alnum(s[0])) or all(_is_latin_alnum(c) for c in s)
            for s in self._surfaces
        )
        # One all-consuming token pattern for the findall tf kernel:
        # trie surfaces first (exact-position dictionary match wins, as
        # in the finditer path), then maximal latin-alnum runs (which
        # therefore swallow dictionary matches STARTING INSIDE them —
        # the same precedence the finditer path implements via its
        # `s < pos` skip), then single word chars (unknown CJK etc.).
        # The latin class is exactly the _is_latin_alnum set.
        _latin_cls = "0-9A-Za-z０-９Ａ-Ｚａ-ｚ"
        self._combined = _re.compile(
            f"(?:{_trie_regex(list(self._surfaces))})|[{_latin_cls}]+|[^\\W_]"
        )
        # ALL-CONSUMING variant for the positions kernel: every char of
        # the input lands in exactly one match, so token offsets are the
        # running sum of match lengths and `findall` (no match objects)
        # replaces `finditer`.  Two extra alternatives: (4) gap runs —
        # non-word chars MINUS the first chars of symbol dictionary
        # surfaces (those must stay visible to the trie alternative, and
        # if the trie then fails there, (5) catches the char singly);
        # (5) `.` catch-all.  Alternation order preserves the original
        # pattern's precedence exactly: (4)/(5) only match where
        # `_combined` matched nothing.
        _sym_firsts = sorted(
            {s[0] for s in self._surfaces if _re.match(r"[\W_]", s[0])}
        )
        _esc = "".join(_re.escape(c) for c in _sym_firsts)
        self._combined_all = _re.compile(
            f"(?:{_trie_regex(list(self._surfaces))})|[{_latin_cls}]+"
            f"|[^\\W_]|[^\\w{_esc}]+|.",
            _re.DOTALL,
        )
        self._word_char = _re.compile(r"[^\W_]")
        # --- array-native positions kernel state (find_term_positions_
        # arrays): persistent surface -> small-int code map with numpy
        # property mirrors, so the per-OCCURRENCE work is one C-level
        # dict get (np.fromiter(map(dict.__getitem__, toks))) plus numpy
        # fancy indexing — no per-token Python branch, no tuple
        # construction.  Codes are per-tokenizer-instance (per actor)
        # and capped: unknown latin/digit runs grow the vocabulary
        # unboundedly over a corpus, so past _VC_CAP the maps reset
        # (pure memoization — results are unaffected).
        self._phrase_firsts = {a for a, _b in self._phrases}
        self._phrase_seconds = {b for _a, b in self._phrases}
        self._vc_codes: dict[str, int] = {}
        self._vc_base: list[str] = []          # code -> base form
        self._vc_bids: dict[str, int] = {}     # base/term -> group id
        self._vc_terms: list[str] = []         # bid -> term string
        cap = 4096
        self._vc_len_arr = np.zeros(cap, np.int64)
        self._vc_bid_arr = np.zeros(cap, np.int64)
        self._vc_emit_arr = np.zeros(cap, bool)
        self._vc_tok_arr = np.zeros(cap, bool)
        self._vc_defer_arr = np.zeros(cap, bool)
        self._vc_first_arr = np.zeros(cap, bool)   # base in phrase firsts
        self._vc_second_arr = np.zeros(cap, bool)  # base in phrase seconds

    _VC_CAP = 400_000

    def _vc_reset(self) -> None:
        self._vc_codes = {}
        self._vc_base = []
        self._vc_bids = {}
        self._vc_terms = []
        cap = 4096
        self._vc_len_arr = np.zeros(cap, np.int64)
        self._vc_bid_arr = np.zeros(cap, np.int64)
        self._vc_emit_arr = np.zeros(cap, bool)
        self._vc_tok_arr = np.zeros(cap, bool)
        self._vc_defer_arr = np.zeros(cap, bool)
        self._vc_first_arr = np.zeros(cap, bool)
        self._vc_second_arr = np.zeros(cap, bool)

    def _vc_bid(self, term: str) -> int:
        bid = self._vc_bids.get(term)
        if bid is None:
            bid = self._vc_bids[term] = len(self._vc_terms)
            self._vc_terms.append(term)
        return bid

    def _vc_classify(self, s_: str) -> None:
        """Assign ``s_`` a code and fill its property-array row."""
        code = len(self._vc_base)
        if code >= len(self._vc_len_arr):
            new_cap = max(code + 1, 2 * len(self._vc_len_arr))
            for name in (
                "_vc_len_arr", "_vc_bid_arr", "_vc_emit_arr",
                "_vc_tok_arr", "_vc_defer_arr", "_vc_first_arr",
                "_vc_second_arr",
            ):
                old = getattr(self, name)
                new = np.zeros(new_cap, old.dtype)
                new[: len(old)] = old
                setattr(self, name, new)
        e = self._surfaces.get(s_)
        base = ""
        emit = tok = defer = False
        if e is not None:
            base, _r, p, _ct, _cf = e
            emit, tok = p != _SYMBOL_POS, True
        elif _is_latin_alnum(s_[0]):
            base = normalize_char_width(s_).lower()
            emit = tok = True
        elif s_.isalnum():
            if len(s_) != 1:
                defer = True  # regex word class vs str.isalnum mismatch
            else:
                base = normalize_char_width(s_)
                emit = tok = True
        elif len(s_) == 1 and self._word_char.match(s_):
            defer = True  # exotic \w char str.isalnum rejects
        # else: gap run (emit = tok = False)
        self._vc_codes[s_] = code
        self._vc_base.append(base)
        self._vc_len_arr[code] = len(s_)
        self._vc_bid_arr[code] = self._vc_bid(base) if tok and emit else -1
        self._vc_emit_arr[code] = emit
        self._vc_tok_arr[code] = tok
        self._vc_defer_arr[code] = defer
        self._vc_first_arr[code] = tok and base in self._phrase_firsts
        self._vc_second_arr[code] = tok and base in self._phrase_seconds

    _EMPTY_I64 = None  # set lazily to a shared empty array

    def find_term_positions_arrays(self, text: str):
        """Array-native positions kernel: ``(terms, counts, starts,
        lens)`` where ``terms[i]`` owns the flat slice
        ``starts/lens[counts[:i].sum() : counts[:i+1].sum()]`` — the
        exact groups of ``find_term_positions`` with zero per-occurrence
        Python objects (round-4 ask #5's single-scan kernel).

        One all-consuming ``findall`` (offsets = running sum of match
        lengths), surfaces resolved to persistent per-actor codes
        (``np.fromiter(map(dict.__getitem__, ...))`` — one C dict get
        per token), all properties via fancy indexing, phrase 2-grams
        via vectorized first/second masks with an exact dict check only
        on the (rare) candidates.  Token-stream groups are ascending by
        construction; only groups also fed by the phrase stream re-sort
        + dedup (FLI set-union semantics).  Parity with
        ``find_lexical_items`` is pytest-gated; the tokenize stage feeds
        these arrays straight into the positional record encoder."""
        if not self._fast_ok:
            return self._positions_arrays_slow(text)
        toks = self._combined_all.findall(text)
        n = len(toks)
        empty = np.empty(0, np.int64)
        if n == 0:
            return [], empty, empty, empty
        codes_map = self._vc_codes
        missing = set(toks).difference(codes_map)
        if missing:
            if len(codes_map) + len(missing) > self._VC_CAP:
                self._vc_reset()
                missing = set(toks)
            for s_ in missing:
                self._vc_classify(s_)
        codes = np.fromiter(
            map(codes_map.__getitem__, toks), np.int64, count=n
        )
        if self._vc_defer_arr[codes].any():
            return self._positions_arrays_slow(text)
        lens = self._vc_len_arr[codes]
        starts = np.empty(n, np.int64)
        starts[0] = 0
        np.cumsum(lens[:-1], out=starts[1:])

        emitm = self._vc_emit_arr[codes]
        ekeys = self._vc_bid_arr[codes[emitm]]
        estarts = starts[emitm]
        elens = lens[emitm]

        # phrase 2-grams over the token stream (gaps transparent,
        # symbol-dict tokens participate as `prev`)
        pkeys = pstarts = plens = None
        if self._phrases:
            tokm = self._vc_tok_arr[codes]
            tcodes = codes[tokm]
            if len(tcodes) > 1:
                cand = (
                    self._vc_first_arr[tcodes[:-1]]
                    & self._vc_second_arr[tcodes[1:]]
                )
                if cand.any():
                    idxs = np.flatnonzero(cand)
                    base = self._vc_base
                    phrases = self._phrases
                    keep = []
                    kbids = []
                    for i in idxs.tolist():
                        key = (base[tcodes[i]], base[tcodes[i + 1]])
                        if key in phrases:
                            keep.append(i)
                            kbids.append(self._vc_bid(key[0] + key[1]))
                    if keep:
                        ki = np.asarray(keep, np.int64)
                        tstarts = starts[tokm]
                        tlens = lens[tokm]
                        pkeys = np.asarray(kbids, np.int64)
                        pstarts = tstarts[ki]
                        plens = tstarts[ki + 1] + tlens[ki + 1] - pstarts

        if pkeys is None:
            if len(ekeys) == 0:
                return [], empty, empty, empty
            # stable sort by group keeps stream order = ascending starts
            keys, st, ln = ekeys, estarts, elens
            order = np.argsort(keys, kind="stable")
            keys = keys[order]
            st = st[order]
            ln = ln[order]
        else:
            # phrase rows may interleave / duplicate vs a same-term
            # token stream: ONE global (key, start, len) lexsort puts
            # every group in canonical sorted-tuple order and makes
            # duplicates adjacent (FLI set-union semantics), with no
            # per-group Python work
            keys = np.concatenate([ekeys, pkeys])
            st = np.concatenate([estarts, pstarts])
            ln = np.concatenate([elens, plens])
            order = np.lexsort((ln, st, keys))
            keys = keys[order]
            st = st[order]
            ln = ln[order]
            dup = (
                (keys[1:] == keys[:-1])
                & (st[1:] == st[:-1])
                & (ln[1:] == ln[:-1])
            )
            if dup.any():
                keep = np.concatenate(([True], ~dup))
                keys = keys[keep]
                st = st[keep]
                ln = ln[keep]
        bounds = np.empty(0, np.int64)
        if len(keys) > 1:
            bounds = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        g_lo = np.concatenate(([0], bounds))
        g_hi = np.concatenate((bounds, [len(keys)]))
        vterms = self._vc_terms
        terms_out = [vterms[k] for k in keys[g_lo].tolist()]
        return terms_out, (g_hi - g_lo), st, ln

    def _positions_arrays_slow(self, text: str):
        """Reference-path fallback (exotic chars / non-single-script
        lexicon): arrays derived from find_lexical_items."""
        items = self.find_lexical_items(text)
        terms = [it["term"] for it in items]
        counts = np.asarray([len(it["positions"]) for it in items], np.int64)
        total = int(counts.sum())
        starts = np.empty(total, np.int64)
        lens = np.empty(total, np.int64)
        i = 0
        for it in items:
            for s, ln in it["positions"]:
                starts[i] = s
                lens[i] = ln
                i += 1
        return terms, counts, starts, lens

    def tokenize(self, text: str) -> list[Token]:
        """Segment text into dictionary tokens with char offsets."""
        surfaces = self._surfaces
        lens_by_first = self._lens_by_first
        tokens: list[Token] = []
        n = len(text)
        i = 0
        while i < n:
            ch = text[i]
            # Whitespace / punctuation: skip (symbol filter M13).
            if ch.isspace():
                i += 1
                continue
            # Longest dictionary match first, probing only lengths that
            # exist for this first char.
            hit = None
            cand_lens = lens_by_first.get(ch)
            if cand_lens is not None:
                remaining = n - i
                for ln in cand_lens:
                    if ln > remaining:
                        continue
                    cand = text[i : i + ln]
                    ent = surfaces.get(cand)
                    if ent is not None:
                        hit = (cand, ent, ln)
                        break
            if hit is not None:
                cand, (base, reading, pos, ct, cf), ln = hit
                tokens.append(Token(cand, base, reading, pos, i, ln, ct, cf))
                i += ln
                continue
            # Unknown word. Latin/digit chars (either width) group into one
            # maximal run (the MeCab unknown-word analog); other unknown
            # alnum chars (kana/kanji not in dict) become single-char tokens;
            # anything else is a symbol and is dropped.
            if _is_latin_alnum(ch):
                j = i + 1
                while j < n and _is_latin_alnum(text[j]):
                    j += 1
                run = text[i:j]
                base = normalize_char_width(run).lower()
                tokens.append(Token(run, base, "", "未知語", i, j - i))
                i = j
            elif ch.isalnum():
                tokens.append(
                    Token(ch, normalize_char_width(ch), "", "未知語", i, 1)
                )
                i += 1
            else:
                # symbol char — dropped
                i += 1
        return tokens

    def find_lexical_items(self, text: str) -> list[dict]:
        """Tokenize + meta-phrase pass + per-doc combine.

        Returns one posting dict per distinct base_form in the document:
        ``{"term", "positions": [(start, len), ...], "tf", "reading",
        "pos", "possible_interps", "interp_position_map"}`` with positions
        in ascending start order (the reference unions positions as a set
        then the golden docs show them sorted).

        Interp semantics mirror reduce_found_lexical_items
        (myaku/datatypes.py:428-505): ``possible_interps`` holds the
        distinct interpretations (first-seen order) — a MeCab-analog
        interp per distinct (POS, conj_type, conj_form) the base form was
        found under, or a JMdict-analog interp for meta phrases —
        and ``interp_position_map`` maps the INDEX of each interp whose
        position set differs from the union to its own sorted positions
        (None when every interp covers all positions), exactly the
        convert_interp_pos_map_to_doc layout
        (myaku/datastore/document_convert.py:156-171).
        """
        tokens = self.tokenize(text)
        # base_form -> {interp_key: position set}; dicts keep first-seen order
        found: dict[str, dict[tuple, set]] = {}
        meta: dict[str, tuple[str, str]] = {}  # base -> (reading, pos)

        def emit(
            base: str, reading: str, pos: str, start: int, length: int,
            interp: tuple,
        ) -> None:
            found.setdefault(base, {}).setdefault(interp, set()).add(
                (start, length)
            )
            meta.setdefault(base, (reading, pos))

        prev = None
        for tok in tokens:
            if tok.pos != _SYMBOL_POS:
                interp = (("MECAB",), (tok.pos,), tok.conj_type, tok.conj_form, None)
                emit(tok.base_form, tok.reading, tok.pos, tok.start,
                     tok.length, interp)
            # meta 2-gram phrase lookup over adjacent base forms
            if prev is not None and (prev.base_form, tok.base_form) in self._phrases:
                start = prev.start
                length = tok.start + tok.length - prev.start
                jid = self._phrase_ids[(prev.base_form, tok.base_form)]
                interp = (("JMDICT_MECAB_DECOMP",), None, None, None, jid)
                emit(prev.base_form + tok.base_form, "", "連語", start,
                     length, interp)
            prev = tok

        def interp_dict(key: tuple) -> dict:
            sources, poses, ct, cf, jid = key
            return {
                "interp_sources": list(sources),
                "mecab_interp": (
                    {
                        "parts_of_speech": list(poses),
                        "conjugated_type": ct,
                        "conjugated_form": cf,
                    }
                    if poses is not None
                    else None
                ),
                "jmdict_interp_entry_id": jid,
            }

        out = []
        for base in sorted(found):
            interp_map = found[base]
            union: set = set()
            for ps in interp_map.values():
                union.update(ps)
            positions = sorted(union)
            pos_map = {
                str(i): sorted(ps)
                for i, ps in enumerate(interp_map.values())
                if ps != union
            }
            reading, pos = meta[base]
            out.append(
                {
                    "term": base,
                    "positions": positions,
                    "tf": len(positions),
                    "reading": reading,
                    "pos": pos,
                    "possible_interps": [
                        interp_dict(k) for k in interp_map
                    ],
                    "interp_position_map": pos_map or None,
                }
            )
        return out


    def find_term_tfs(self, text: str) -> dict[str, int]:
        """Build-side fast path: term -> tf, no position materialization.

        Equivalent to ``{it['term']: it['tf'] for it in
        find_lexical_items(text)}`` — occurrences have distinct start
        offsets, so tf == occurrence count (verified by a parity test);
        the per-occurrence (start, len) sets exist only for query-side
        previews and golden tests.

        Implementation: ONE all-consuming ``findall`` pass (trie surfaces
        | latin runs | single word chars — see ``_combined`` in
        ``__init__`` for the precedence argument), then all per-token
        Python work collapses to the DISTINCT surfaces via ``Counter``
        and the phrase 2-gram check to distinct ADJACENT surface pairs
        via ``Counter(zip(toks, toks[1:]))`` — the sequential scan runs
        entirely in C, and Zipf token distributions make the distinct
        sets much smaller than the streams.  ~1.8x the longest-match
        loop, ~1.1x the previous fused-finditer pass (the regex scan is
        now the floor: ~85% of kernel time is inside ``findall``)
        (the longest-match loop remains the reference implementation in ``tokenize`` and
        the fallback when the lexicon violates the single-script surface
        invariant, or when the regex word-char class disagrees with
        ``str.isalnum`` on some exotic matched char)."""
        if not self._fast_ok:
            return self._find_term_tfs_slow(text)
        from collections import Counter

        toks = self._combined.findall(text)
        counts: dict[str, int] = {}
        surfaces = self._surfaces
        base_map: dict[str, str] = {}
        for s_, cnt in Counter(toks).items():
            e = surfaces.get(s_)
            if e is not None:
                base, _r, p, _ct, _cf = e
                base_map[s_] = base
                if p != _SYMBOL_POS:
                    counts[base] = counts.get(base, 0) + cnt
            elif _is_latin_alnum(s_[0]):
                b = normalize_char_width(s_).lower()
                base_map[s_] = b
                counts[b] = counts.get(b, 0) + cnt
            elif s_.isalnum():
                b = normalize_char_width(s_)
                base_map[s_] = b
                counts[b] = counts.get(b, 0) + cnt
            else:
                # regex \w matched a char str.isalnum rejects: the token
                # sequence no longer mirrors the reference scan — defer
                # to the longest-match loop for this (exotic) document
                return self._find_term_tfs_slow(text)
        phrases = self._phrases
        if phrases and len(toks) > 1:
            for (sa, sb), cnt in Counter(zip(toks, toks[1:])).items():
                key = (base_map[sa], base_map[sb])
                if key in phrases:
                    ph = key[0] + key[1]
                    counts[ph] = counts.get(ph, 0) + cnt
        return counts

    def find_term_positions(self, text: str) -> dict[str, list]:
        """Positional build kernel: term -> sorted [(start, len), ...].

        Exactly ``{it['term']: it['positions'] for it in
        find_lexical_items(text)}`` (parity-tested), i.e. the same term
        set as ``find_term_tfs`` with ``tf == len(positions)``, produced
        by ONE ``findall`` pass over the ALL-CONSUMING combined pattern
        (``_combined_all``): every char lands in exactly one match, so
        offsets are the running sum of match lengths and no match
        objects are built.  Since round 5 this is a thin tuple-list view
        over ``find_term_positions_arrays`` (the array-native kernel:
        persistent surface codes, fancy-indexed properties, vectorized
        phrase candidates — zero per-occurrence Python objects); kept
        for tests, oracles and slow-path fallbacks.  Runs only in the
        opt-in positional build (``build_index(with_positions=True)``)."""
        terms, counts, starts, lens = self.find_term_positions_arrays(text)
        out: dict[str, list] = {}
        lo = 0
        sl = starts.tolist()
        ll = lens.tolist()
        for t, c in zip(terms, counts.tolist()):
            out[t] = list(zip(sl[lo : lo + c], ll[lo : lo + c]))
            lo += c
        return out

    def _find_term_tfs_slow(self, text: str) -> dict[str, int]:
        """Longest-match-loop reference implementation (parity-tested
        equal to the fused fast path)."""
        tokens = self.tokenize(text)
        counts: dict[str, int] = {}
        prev = None
        for tok in tokens:
            if tok.pos != _SYMBOL_POS:
                b = tok.base_form
                counts[b] = counts.get(b, 0) + 1
            if prev is not None and (prev.base_form, tok.base_form) in self._phrases:
                p = prev.base_form + tok.base_form
                counts[p] = counts.get(p, 0) + 1
            prev = tok
        return counts


_TOKENIZER: Tokenizer | None = None


def get_tokenizer() -> Tokenizer:
    """Process-local singleton (reference singleton-per-config pattern)."""
    global _TOKENIZER
    if _TOKENIZER is None:
        _TOKENIZER = Tokenizer()
    return _TOKENIZER
