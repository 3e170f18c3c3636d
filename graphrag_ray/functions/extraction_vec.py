"""Batch-VECTORIZED pattern extraction (the hot KG path).

Produces the exact same extraction output table as the per-row
transcription in ``functions/extraction.py`` (entity/mod.rs:114-1108
semantics — four-phase PERSON heuristics, ORG suffix/prefix scans,
known-LOCATION scan, per-chunk (name,type) dedup with mention merge, and
the co-occurrence pair stream) — but computed with batch-level Arrow
kernels and numpy passes instead of a Python loop per token:

- tokenization: ONE ``pc.utf8_split_whitespace`` over the whole batch
  (empty edge tokens filtered → positions identical to ``str.split()``)
- per-word attributes: computed once per DICTIONARY word (Zipf vocabulary
  ≪ token count) via the same cached ``_word_attrs``, then fanned out to
  tokens with one fancy-index
- PERSON phases: boolean-mask pre-candidates; phase 3's greedy adjacent-
  pair consumption is resolved exactly with run-parity (a taken pair
  consumes i,i+1, so within each maximal run of consecutive candidate
  starts every other one wins); phases 1/2 loop only over their (sparse)
  candidate positions with the shared ``consumed`` array
- ORG/LOCATION/relationship-keyword scans: one literal-substring Arrow
  kernel per pattern over the batch instead of 30+ Python scans per chunk
- per-chunk dedup, doc-level aggregation and the edge-pair combine are
  numpy stable-sort groupbys (ONE argsort each; no np.unique+lexsort
  double sort)
- ``n_mentions`` (= ``text.count(name)``) runs as grouped
  ``pc.count_substring`` kernels, one call per distinct name

Bit-identical output content is asserted against the row path by
``tests/test_extraction_vectorized.py`` (fixtures, synth corpora,
hypothesis-random text) and by the kgx/syn DuckDB oracles, which replay
this extractor end-to-end in SQL.

Supported config envelope (else callers fall back to the row path):
entity types whose dispatch is persons/organizations/locations, no
allow/deny patterns, offsets not materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .extraction import (
    KNOWN_PERSON_NAMES,
    _KNOWN_LOWER,
    ORG_SUFFIXES,
    ORG_PREFIXES,
    KNOWN_LOCATIONS,
    _CONTEXT_KEYWORDS,
    _TYPE_DISPATCH,
    _extract_locations,
    _extract_organizations,
    _extract_persons,
    _is_likely_organization,
    _word_attrs,
    calculate_confidence,
)
from .textfns import normalize_name

# every known fixture name is exactly two words (phase-1 window = 2), and
# first words are unique (phase-1 resolves a candidate by its first token;
# the row path's try-names-in-order-break-on-first is only equivalent then)
assert all(len(n) == 2 for n in _KNOWN_LOWER)
assert len({n[0] for n in _KNOWN_LOWER}) == len(_KNOWN_LOWER)

_PERSON_FNS = frozenset({_extract_persons})
_ORG_FNS = frozenset({_extract_organizations})
_LOC_FNS = frozenset({_extract_locations})

# fixed relation vocabulary (entity/mod.rs:841-879; matches edges.REL_TYPES)
REL_LIST = (
    "WORKS_FOR", "LEADS", "ASSOCIATED_WITH", "BORN_IN", "LOCATED_IN",
    "HEADQUARTERED_IN", "MARRIED_TO", "COLLEAGUE_OF", "KNOWS", "RELATED_TO",
)
_R = {r: i for i, r in enumerate(REL_LIST)}

_TYPE_STRS = ("PERSON", "ORGANIZATION", "LOCATION")

_LOC_CONF = tuple(calculate_confidence(loc, "LOCATION") for loc in KNOWN_LOCATIONS)

# name-key kinds (packed kind<<60 | a<<30 | b)
_KS, _KP, _KK, _KO, _KL = 0, 1, 2, 3, 4

_TRIU_CACHE: dict[int, tuple] = {}


def supported(entity_types, allowed_patterns=(), excluded_patterns=(),
              with_offsets=False) -> bool:
    """True when this batch path reproduces the row path exactly."""
    if with_offsets or allowed_patterns or excluded_patterns:
        return False
    return all(_TYPE_DISPATCH.get(t) in (_extract_persons,
                                         _extract_organizations,
                                         _extract_locations)
               for t in entity_types)


def _pack(kind: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((kind.astype(np.int64) << 60)
            | (a.astype(np.int64) << 30) | b.astype(np.int64))


class _Emissions:
    """Column accumulator for entity emissions."""

    def __init__(self):
        self.chunk: list[np.ndarray] = []
        self.order: list[np.ndarray] = []   # within-(chunk,phase) order key
        self.phase: list[np.ndarray] = []   # global sub-phase ordinal
        self.kind: list[np.ndarray] = []
        self.a: list[np.ndarray] = []
        self.b: list[np.ndarray] = []
        self.type_id: list[np.ndarray] = []
        self.conf: list[np.ndarray] = []

    def add(self, chunk, order, phase, kind, a, b, type_id, conf):
        n = len(chunk)
        if n == 0:
            return
        self.chunk.append(np.asarray(chunk, np.int64))
        self.order.append(np.asarray(order, np.int64))
        self.phase.append(np.full(n, phase, np.int64))
        self.kind.append(np.asarray(kind, np.int64) if not np.isscalar(kind)
                         else np.full(n, kind, np.int64))
        self.a.append(np.asarray(a, np.int64))
        self.b.append(np.asarray(b, np.int64) if not np.isscalar(b)
                      else np.full(n, b, np.int64))
        self.type_id.append(np.full(n, type_id, np.int64))
        self.conf.append(np.asarray(conf, np.float64) if not np.isscalar(conf)
                         else np.full(n, conf, np.float64))

    def arrays(self):
        if not self.chunk:
            z = np.empty(0, np.int64)
            return z, z, z, z, z, z, z, np.empty(0, np.float64)
        return (np.concatenate(self.chunk), np.concatenate(self.order),
                np.concatenate(self.phase), np.concatenate(self.kind),
                np.concatenate(self.a), np.concatenate(self.b),
                np.concatenate(self.type_id), np.concatenate(self.conf))


class _Tokens:
    """Flat token stream + per-token vocab attributes for one batch."""

    def __init__(self, texts_arr: pa.Array, n_chunks: int):
        toks = pc.utf8_split_whitespace(texts_arr)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        offsets = toks.offsets.to_numpy()
        tok_chunk = np.repeat(np.arange(n_chunks, dtype=np.int64),
                              np.diff(offsets))
        # str.split() parity: drop empty edge tokens
        vlen = pc.binary_length(flat).to_numpy(zero_copy_only=False)
        if len(vlen) and not vlen.all():
            keep = vlen > 0
            flat = flat.filter(pa.array(keep))
            tok_chunk = tok_chunk[keep]
        enc = flat.dictionary_encode()
        self.idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        self.tok_chunk = tok_chunk
        n_tok = len(self.idx)
        self.n_tok = n_tok

        nv = len(vocab)
        attrs = [_word_attrs(w) for w in vocab]
        self.cleaned = [a[0] for a in attrs]
        lo = [a[1] for a in attrs]
        self.v_rawcap = np.fromiter((a[2] for a in attrs), bool, nv)
        self.v_pw = np.fromiter((a[3] for a in attrs), bool, nv)
        self.v_title = np.fromiter((a[4] for a in attrs), bool, nv)
        self.v_np = np.fromiter((a[5] for a in attrs), bool, nv)
        self.v_kf = np.fromiter((a[6] for a in attrs), bool, nv)
        self.v_ccap = np.fromiter((a[7] for a in attrs), bool, nv)
        self.v_clen = np.fromiter((len(c) for c in self.cleaned), np.int64, nv)

        # cleaned-form vocabulary (dedup key space: names compare by string)
        cenc = pa.array(self.cleaned, pa.string()).dictionary_encode()
        self.v_cid = cenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        self.cleaned_vocab = cenc.dictionary.to_pylist()
        self._lo_map: dict[str, list[int]] = {}
        for i, s in enumerate(lo):
            self._lo_map.setdefault(s, []).append(i)

        # per-token fans (one fancy-index each)
        idx = self.idx
        self.rawcap = self.v_rawcap[idx]
        self.pw = self.v_pw[idx]
        self.np_ = self.v_np[idx]
        self.ccap = self.v_ccap[idx]
        self.cid = self.v_cid[idx]
        # same-chunk adjacency
        self.same1 = np.zeros(n_tok, bool)
        if n_tok > 1:
            self.same1[:-1] = tok_chunk[:-1] == tok_chunk[1:]

    def lo_vocab_ids(self, lo_str: str) -> list[int]:
        """Vocab indices whose lowered-clean form equals ``lo_str``."""
        return self._lo_map.get(lo_str, [])


def _extract_persons_vec(T: _Tokens, min_confidence: float,
                         consumed: np.ndarray, em: _Emissions,
                         phase_base: int, known_cid_pairs: dict) -> None:
    """Four-phase PERSON extraction over the flat token stream.

    ``consumed`` is this call's fresh per-token processed set (the row path
    resets ``processed`` per extractor invocation)."""
    idx, n_tok = T.idx, T.n_tok
    if n_tok == 0:
        return
    same1 = T.same1

    # --- PHASE 1: known fixture bigrams (lowered-clean match, no cap req.)
    if T.v_kf.any():
        # vocab → known-name index via lowered form; expected second word id
        kname_of_v = np.full(len(T.v_kf), -1, np.int64)
        second_code_of_v = np.full(len(T.v_kf), -1, np.int64)
        second_strs = sorted({nl[1] for nl in _KNOWN_LOWER})
        sec_code = {s: i for i, s in enumerate(second_strs)}
        expected_sec = np.fromiter(
            (sec_code[nl[1]] for nl in _KNOWN_LOWER), np.int64)
        for ni, nl in enumerate(_KNOWN_LOWER):
            for v in T.lo_vocab_ids(nl[0]):
                kname_of_v[v] = ni
        for s, c in sec_code.items():
            for v in T.lo_vocab_ids(s):
                second_code_of_v[v] = c
        kn_tok = kname_of_v[idx]
        cand = np.zeros(n_tok, bool)
        if n_tok > 1:
            sec_tok = second_code_of_v[idx]
            cand[:-1] = (kn_tok[:-1] >= 0) & same1[:-1] & (
                sec_tok[1:] == expected_sec[np.clip(kn_tok[:-1], 0, None)])
        emit = 0.95 >= min_confidence
        out_pos, out_ni = [], []
        for i in np.flatnonzero(cand):
            if consumed[i]:
                continue
            if emit:
                out_pos.append(i)
                out_ni.append(kn_tok[i])
            consumed[i] = True
            consumed[i + 1] = True
        em.add(T.tok_chunk[np.asarray(out_pos, np.int64)],
               np.asarray(out_pos, np.int64), phase_base + 0,
               _KK, np.asarray(out_ni, np.int64), 0, 0, 0.95)

    # --- PHASE 2: title + person word(s)
    title_tok = T.v_title[idx]
    if title_tok.any():
        nxt_ok = np.zeros(n_tok, bool)
        if n_tok > 1:
            nxt_ok[:-1] = T.rawcap[1:] & T.pw[1:] & same1[:-1]
        cand2 = title_tok & nxt_ok
        emit = 0.9 >= min_confidence
        out_pos, out_a, out_b, out_kind = [], [], [], []
        tok_chunk, cid = T.tok_chunk, T.cid
        for i in np.flatnonzero(cand2):
            if consumed[i] or consumed[i + 1]:
                continue
            a, b, kind = cid[i + 1], -1, _KS
            if (i + 2 < n_tok and tok_chunk[i + 2] == tok_chunk[i]
                    and not consumed[i + 2] and T.rawcap[i + 2] and T.pw[i + 2]):
                consumed[i + 2] = True
                kind, b = _KP, cid[i + 2]
            if emit:
                out_pos.append(i)
                out_a.append(a)
                out_b.append(b)
                out_kind.append(kind)
            consumed[i] = True
            consumed[i + 1] = True
        if out_pos:
            kind_arr = np.asarray(out_kind, np.int64)
            a_arr = np.asarray(out_a, np.int64)
            b_arr = np.where(kind_arr == _KP,
                             np.asarray(out_b, np.int64), 0)
            pos_arr = np.asarray(out_pos, np.int64)
            em.add(T.tok_chunk[pos_arr], pos_arr, phase_base + 1,
                   kind_arr, a_arr, b_arr, 0, 0.9)

    # --- PHASE 3: adjacent First Last (greedy run-parity, exact)
    good = T.rawcap & T.pw & ~T.np_ & T.ccap
    cand3 = np.zeros(n_tok, bool)
    if n_tok > 1:
        cand3[:-1] = good[:-1] & good[1:] & same1[:-1] \
            & ~consumed[:-1] & ~consumed[1:]
    pos3 = np.flatnonzero(cand3)
    if len(pos3):
        new_run = np.empty(len(pos3), bool)
        new_run[0] = True
        np.greater(np.diff(pos3), 1, out=new_run[1:])
        run_id = np.cumsum(new_run) - 1
        run_first = pos3[new_run][run_id]
        taken = pos3[((pos3 - run_first) & 1) == 0]
        consumed[taken] = True
        consumed[taken + 1] = True
        # 0.5 + 0.2 (two words) + 0.1 (capitalized); 'Dr.' can't survive
        # clean_word, so the formula is constant on this mask. Evaluated
        # with the SAME float chain as calculate_confidence — the sum is
        # 0.7999999999999999, which fails `>= 0.8` (row-path parity).
        conf3 = 0.5 + 0.2 + 0.1
        if conf3 >= min_confidence:
            em.add(T.tok_chunk[taken], taken, phase_base + 2,
                   _KP, T.cid[taken], T.cid[taken + 1], 0, conf3)

    # --- PHASE 4: leftover single capitalized person words (conf 0.6 const)
    if 0.6 >= min_confidence:
        mask4 = ~consumed & (T.v_clen[idx] >= 2) & ~T.np_ & T.rawcap & T.pw
        pos4 = np.flatnonzero(mask4)
        em.add(T.tok_chunk[pos4], pos4, phase_base + 3,
               _KS, T.cid[pos4], 0, 0, 0.6)

    # canonicalize pair keys whose exact cleaned words form a known name
    # (dedup is by name STRING in the row path)
    # handled at assembly via known_cid_pairs — populated here once
    if not known_cid_pairs:
        cpos = {s: i for i, s in enumerate(T.cleaned_vocab)}
        for ni, name in enumerate(KNOWN_PERSON_NAMES):
            w1, w2 = name.split()
            if w1 in cpos and w2 in cpos:
                known_cid_pairs[(cpos[w1], cpos[w2])] = ni


# cross-batch memo for the org-candidate heuristics: confidence per name,
# -1.0 when _is_likely_organization rejects. Candidate names come from a
# small vocabulary in practice (the window around a suffix/prefix hit), so
# the memo turns the per-hit Python heuristics into one dict lookup;
# size-capped so an adversarial corpus can't grow it unboundedly.
_ORG_MEMO: dict[str, float] = {}
_ORG_MEMO_CAP = 1 << 16


def _org_conf(name: str) -> float:
    conf = _ORG_MEMO.get(name)
    if conf is None:
        conf = (calculate_confidence(name, "ORGANIZATION")
                if _is_likely_organization(name) else -1.0)
        if len(_ORG_MEMO) < _ORG_MEMO_CAP:
            _ORG_MEMO[name] = conf
    return conf


def _extract_orgs_vec(texts_arr: pa.Array, texts_py: list,
                      min_confidence: float, em: _Emissions,
                      phase_base: int, org_intern: dict,
                      org_names: list) -> None:
    """ORG suffix/prefix scans: one find_substring kernel per pattern,
    Python only on the hits (entity/mod.rs:501-566 semantics)."""
    for si, suffix in enumerate(ORG_SUFFIXES):
        fpos = pc.find_substring(texts_arr, suffix).to_numpy(zero_copy_only=False)
        hits = np.flatnonzero(fpos >= 0)
        out_chunk, out_a, out_conf = [], [], []
        for c in hits:
            text = texts_py[c]
            pos = int(fpos[c])
            sp = text.rfind(" ", 0, pos)
            start = sp + 1 if sp != -1 else 0
            name = text[start: pos + len(suffix)].strip()
            if name:
                conf = _org_conf(name)
                if conf >= min_confidence:
                    oid = org_intern.get(name)
                    if oid is None:
                        oid = org_intern[name] = len(org_names)
                        org_names.append(name)
                    out_chunk.append(c)
                    out_a.append(oid)
                    out_conf.append(conf)
        em.add(np.asarray(out_chunk, np.int64),
               np.full(len(out_chunk), si, np.int64), phase_base + 0,
               _KO, np.asarray(out_a, np.int64), 0, 1,
               np.asarray(out_conf, np.float64))
    for pi, prefix in enumerate(ORG_PREFIXES):
        fpos = pc.find_substring(texts_arr, prefix).to_numpy(zero_copy_only=False)
        hits = np.flatnonzero(fpos >= 0)
        out_chunk, out_a, out_conf = [], [], []
        for c in hits:
            text = texts_py[c]
            pos = int(fpos[c])
            dot = text.find(".", pos)
            end = dot if dot != -1 else min(len(text), pos + 50)
            name = text[pos:end].strip()
            if name and len(name) > len(prefix):
                conf = calculate_confidence(name, "ORGANIZATION")
                if conf >= min_confidence:
                    oid = org_intern.get(name)
                    if oid is None:
                        oid = org_intern[name] = len(org_names)
                        org_names.append(name)
                    out_chunk.append(c)
                    out_a.append(oid)
                    out_conf.append(conf)
        em.add(np.asarray(out_chunk, np.int64),
               np.full(len(out_chunk), pi, np.int64), phase_base + 1,
               _KO, np.asarray(out_a, np.int64), 0, 1,
               np.asarray(out_conf, np.float64))


def _extract_locs_vec(texts_arr: pa.Array, min_confidence: float,
                      em: _Emissions, phase_base: int) -> None:
    for li, loc in enumerate(KNOWN_LOCATIONS):
        conf = _LOC_CONF[li]
        if conf < min_confidence:
            continue
        mask = pc.match_substring(texts_arr, loc).to_numpy(zero_copy_only=False)
        hits = np.flatnonzero(mask)
        em.add(hits.astype(np.int64), np.full(len(hits), li, np.int64),
               phase_base + 0, _KL, np.full(len(hits), li, np.int64),
               0, 2, conf)


def _chunk_rel_profiles(texts_arr: pa.Array, n_chunks: int):
    """Per-chunk relation codes for the four type-pair families
    (entity/mod.rs:812-879 keyword rules), one substring kernel per
    keyword."""
    has = {}
    for kw in _CONTEXT_KEYWORDS:
        has[kw] = pc.match_substring(texts_arr, kw).to_numpy(zero_copy_only=False)
    po = np.where(has["works for"] | has["employed by"], _R["WORKS_FOR"],
                  np.where(has["founded"] | has["CEO"], _R["LEADS"],
                           _R["ASSOCIATED_WITH"])).astype(np.int64)
    pl = np.where(has["born in"] | has["from"], _R["BORN_IN"],
                  np.where(has["lives in"] | has["based in"],
                           _R["LOCATED_IN"], _R["ASSOCIATED_WITH"])
                  ).astype(np.int64)
    ol = np.where(has["headquartered"] | has["based in"],
                  _R["HEADQUARTERED_IN"], _R["LOCATED_IN"]).astype(np.int64)
    pp = np.where(has["married"] | has["spouse"], _R["MARRIED_TO"],
                  np.where(has["colleague"] | has["partner"],
                           _R["COLLEAGUE_OF"], _R["KNOWS"])).astype(np.int64)
    return po, pl, ol, pp


def extract_batch(
    texts_py: list,
    doc_ords: np.ndarray,
    min_confidence: float,
    entity_types: tuple,
    extract_rels: bool,
):
    """Run the full per-chunk extraction over a batch of chunk texts.

    Returns (entities, pairs):
      entities: dict of flat per-unique-(chunk, name, type) arrays —
        chunk, type_id, conf, k (emission count), count (text.count(name)),
        first_ord, name (py list), entity_id (py list), euid (int intern of
        entity_id), doc_ord
      pairs: (keys:int64 packed (src<<34|dst<<8|rel), chunks:int64,
        id_list: entity_id strings by packed index, rel_list) or None
    """
    n_chunks = len(texts_py)
    texts_arr = pa.array(texts_py, pa.string())
    T = _Tokens(texts_arr, n_chunks)
    em = _Emissions()
    known_cid_pairs: dict = {}
    org_intern: dict = {}
    org_names: list = []

    for t_ord, etype in enumerate(entity_types):
        fn = _TYPE_DISPATCH[etype]
        base = t_ord * 8
        if fn is _extract_persons:
            consumed = np.zeros(T.n_tok, bool)
            _extract_persons_vec(T, min_confidence, consumed, em, base,
                                 known_cid_pairs)
        elif fn is _extract_organizations:
            _extract_orgs_vec(texts_arr, texts_py, min_confidence, em, base,
                              org_intern, org_names)
        else:
            _extract_locs_vec(texts_arr, min_confidence, em, base)

    chunk, order, phase, kind, a, b, type_id, conf = em.arrays()
    n_em = len(chunk)
    if n_em == 0:
        return None, None

    # known-name canonicalization of pair keys (string-equality dedup)
    if known_cid_pairs:
        pair_mask = kind == _KP
        if pair_mask.any():
            for (c1, c2), ni in known_cid_pairs.items():
                hit = pair_mask & (a == c1) & (b == c2)
                if hit.any():
                    kind[hit] = _KK
                    a[hit] = ni
                    b[hit] = 0

    # global emission order = (chunk, entity-type slot+phase, position)
    emo = np.lexsort((order, phase, chunk))
    chunk, kind, a, b, type_id, conf = (
        chunk[emo], kind[emo], a[emo], b[emo], type_id[emo], conf[emo])
    nk = _pack(kind, a, b)

    # per-chunk (name, type) dedup: ONE stable sort; k = group size,
    # conf = group max, first_ord = first emission ordinal
    ordv = np.arange(n_em, dtype=np.int64)
    g = np.lexsort((ordv, nk, type_id, chunk))
    gc, gk, gt, gn, go, gf = chunk[g], nk[g], type_id[g], kind[g], ordv[g], conf[g]
    ga, gb = a[g], b[g]
    newg = np.empty(n_em, bool)
    newg[0] = True
    newg[1:] = (gc[1:] != gc[:-1]) | (gt[1:] != gt[:-1]) | (gk[1:] != gk[:-1])
    starts = np.flatnonzero(newg)
    k_counts = np.diff(np.append(starts, n_em))
    u_chunk = gc[starts]
    u_type = gt[starts]
    u_kind = gn[starts]
    u_a, u_b = ga[starts], gb[starts]
    u_conf = np.maximum.reduceat(gf, starts)
    u_first = np.minimum.reduceat(go, starts)

    # restore per-chunk first-seen order
    o2 = np.lexsort((u_first, u_chunk))
    u_chunk, u_type, u_kind, u_a, u_b = (
        u_chunk[o2], u_type[o2], u_kind[o2], u_a[o2], u_b[o2])
    u_conf, u_first, k_counts = u_conf[o2], u_first[o2], k_counts[o2]
    n_u = len(u_chunk)

    # name strings per unique name key (decoded once per distinct key)
    unk = _pack(u_kind, u_a, u_b)
    name_sort = np.argsort(unk, kind="stable")
    s_unk = unk[name_sort]
    s_new = np.empty(n_u, bool)
    s_new[0] = True
    np.not_equal(s_unk[1:], s_unk[:-1], out=s_new[1:])
    dk_starts = np.flatnonzero(s_new)
    dk_counts = np.diff(np.append(dk_starts, n_u))
    cv = T.cleaned_vocab

    def _name_of(kd: int, aa: int, bb: int) -> str:
        if kd == _KS:
            return cv[aa]
        if kd == _KP:
            return f"{cv[aa]} {cv[bb]}"
        if kd == _KK:
            return KNOWN_PERSON_NAMES[aa]
        if kd == _KO:
            return org_names[aa]
        return KNOWN_LOCATIONS[aa]

    distinct_names = [
        _name_of(int(u_kind[name_sort[s]]), int(u_a[name_sort[s]]),
                 int(u_b[name_sort[s]]))
        for s in dk_starts
    ]
    n_distinct = len(distinct_names)
    # per-row distinct-name code (one scatter, no Python)
    name_code = np.empty(n_u, np.int64)
    name_code[name_sort] = np.repeat(
        np.arange(n_distinct, dtype=np.int64), dk_counts)

    # n_mentions: non-overlapping substring counts. C-level str.count per
    # unique (chunk, name) beats per-name Arrow kernels here: with Zipf
    # names the distinct-name count is large enough that kernel dispatch
    # overhead (~0.2 ms/call) dominates the actual counting work.
    counts = np.empty(n_u, np.int64)
    cnt_buf = np.empty(n_u, np.int64)
    pos = 0
    chunk_by_name = u_chunk[name_sort].tolist()
    for dname, dcount in zip(distinct_names, dk_counts):
        for i in range(pos, pos + dcount):
            cnt_buf[i] = texts_py[chunk_by_name[i]].count(dname)
        pos += dcount
    counts[name_sort] = cnt_buf

    # entity_id strings: one per distinct (name, type) combo, then one
    # scatter — merged to string-identity euids for the edge stream
    # ("ENTITY NAME" and "Entity Name" share an id)
    combo = name_code * 4 + u_type
    ucombo, eid_code = np.unique(combo, return_inverse=True)
    eid_strs = [
        f"{_TYPE_STRS[c & 3]}_{normalize_name(distinct_names[c >> 2])}"
        for c in ucombo.tolist()
    ]
    eenc = pa.array(eid_strs, pa.string()).dictionary_encode()
    combo_to_euid = eenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    euid_strs = eenc.dictionary.to_pylist()
    euid = combo_to_euid[eid_code]

    entities = {
        "chunk": u_chunk,
        "namekey": unk,
        "type_id": u_type,
        "conf": u_conf,
        "k": k_counts,
        "count": counts,
        "first_ord": u_first,
        "name_code": name_code,
        "names": distinct_names,
        "eid_code": eid_code,
        "eid_strs": eid_strs,
        "euid": euid,
        "euid_strs": euid_strs,
        "doc_ord": doc_ords[u_chunk],
    }

    if not extract_rels:
        return entities, None

    # --- edge pair stream: per-chunk i<j over the deduped entity list
    per_chunk = np.bincount(u_chunk, minlength=n_chunks)
    qual = per_chunk >= 2
    if not qual.any():
        return entities, (np.empty(0, np.int64), np.empty(0, np.int64),
                          [], list(REL_LIST))
    chunk_starts = np.concatenate(([0], np.cumsum(per_chunk)[:-1]))
    qual_ids = np.flatnonzero(qual)
    src_parts, dst_parts = [], []
    for c in qual_ids:
        m = per_chunk[c]
        iu = _TRIU_CACHE.get(m)
        if iu is None:
            iu = _TRIU_CACHE[m] = np.triu_indices(m, 1)
        s = chunk_starts[c]
        src_parts.append(iu[0] + s)
        dst_parts.append(iu[1] + s)
    src_pos = np.concatenate(src_parts)
    dst_pos = np.concatenate(dst_parts)
    mq = per_chunk[qual_ids]
    pair_chunk = np.repeat(qual_ids, mq * (mq - 1) // 2)

    # entity interning by first appearance over qualifying chunks'
    # entity sequences (keeps deterministic packed-key order)
    qual_rows = qual[u_chunk]
    seq = euid[qual_rows]
    uq, first_idx = np.unique(seq, return_index=True)
    rank = np.empty(len(euid_strs), np.int64)
    order_fa = np.argsort(first_idx, kind="stable")
    rank[uq[order_fa]] = np.arange(len(uq))
    id_list = [euid_strs[u] for u in uq[order_fa]]
    assert len(id_list) < (1 << 26)

    po, pl, ol, pp = _chunk_rel_profiles(texts_arr, n_chunks)
    ti = u_type[src_pos]
    tj = u_type[dst_pos]
    code = ti * 3 + tj
    rel = np.full(len(code), _R["RELATED_TO"], np.int64)
    m = (code == 1) | (code == 3)          # P↔O
    rel[m] = po[pair_chunk[m]]
    m = (code == 2) | (code == 6)          # P↔L
    rel[m] = pl[pair_chunk[m]]
    m = (code == 5) | (code == 7)          # O↔L
    rel[m] = ol[pair_chunk[m]]
    m = code == 0                          # P↔P
    rel[m] = pp[pair_chunk[m]]

    keys = ((rank[euid[src_pos]] << 34)
            | (rank[euid[dst_pos]] << 8) | rel)
    return entities, (keys, pair_chunk, id_list, list(REL_LIST))
