"""kgx_fuzzy corpus invariants + fuzzy-path parity.

The SQL oracle's hand-derivation (graphrag_ray/kgx_fuzzy.py) rests on three
engineered pool properties; these tests assert them against the REAL
similarity/blocking functions so a pool edit cannot silently invalidate the
oracle. The end-to-end test runs the pure-Python canonicalizer (the same
greedy clustering the distributed pipeline executes per block) over a
simulated corpus and checks the cluster partition equals the hand-written
variants table.
"""

from __future__ import annotations

import itertools

from graphrag_ray.functions.linking import (
    block_key,
    canonicalize,
    exact_clusters_from_rows,
)
from graphrag_ray.functions.textfns import name_similarity, normalize_string
from graphrag_ray.kgx import KGX_LOCS
from graphrag_ray.kgx_fuzzy import (
    KGXF_PERSON_GROUPS,
    KGXF_PERSONS,
    kgxf_choices,
    kgxf_sentence,
)

THRESHOLD = 0.85


def _groups() -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for name, grp in KGXF_PERSON_GROUPS:
        out.setdefault(grp, []).append(name)
    return out


def test_intra_group_clique_at_threshold():
    """Every variant pair within a group is >= 0.85 similar AND shares the
    fuzzy block — so greedy clustering merges the whole group regardless of
    seed order."""
    for grp, names in _groups().items():
        for a, b in itertools.combinations(names, 2):
            na, nb = normalize_string(a), normalize_string(b)
            assert name_similarity(na, nb) >= THRESHOLD, (grp, a, b)
            assert block_key("PERSON", na) == block_key("PERSON", nb), (grp, a, b)


def test_groups_isolated_by_block():
    """Each group's block is unique among all PERSON-typed pool entries
    (variants + two-word locations extracted as PERSON), so no cross-group
    fuzzy comparison ever happens."""
    entries = [(n, g) for n, g in KGXF_PERSON_GROUPS]
    entries += [(n, f"loc~{n}") for n, two in KGX_LOCS if two]
    block_of: dict[str, set[str]] = {}
    for name, grp in entries:
        block_of.setdefault(grp, set()).add(
            block_key("PERSON", normalize_string(name))
        )
    for grp, blocks in block_of.items():
        assert len(blocks) == 1, (grp, blocks)
    all_blocks = [next(iter(b)) for b in block_of.values()]
    assert len(set(all_blocks)) == len(all_blocks), "blocks collide"


def test_no_substring_names():
    """Mention counting is text.count(name): no pool name may be a
    substring of another or co-occurrence would inflate n_mentions beyond
    the per-slot SQL constants."""
    for a, b in itertools.permutations(KGXF_PERSONS, 2):
        assert a not in b, (a, b)


def test_fuzzy_partition_matches_variant_table():
    """Pure canonicalizer over a simulated draw: the resulting cluster
    partition of PERSON pool names equals the hand-written variants table
    (the property the SQL oracle encodes)."""
    rows = []
    for doc_id in range(400):
        c = kgxf_choices(doc_id)
        rows.append((str(doc_id), KGXF_PERSONS[c["p"]], "PERSON", 0.8, 1))
        rows.append((str(doc_id), KGXF_PERSONS[c["p2"]], "PERSON", 0.8, 1))
    clusters = canonicalize(exact_clusters_from_rows(rows), threshold=THRESHOLD)
    grp_of = dict(KGXF_PERSON_GROUPS)
    got = {frozenset(c.aliases) for c in clusters}
    appeared = {r[1] for r in rows}
    want = {
        frozenset(n for n in names if n in appeared)
        for names in _groups().values()
        if any(n in appeared for n in names)
    }
    assert got == want
    # canonical name: most frequent raw spelling (ties longest, then
    # lexicographically largest)
    for c in clusters:
        counts = {n: sum(1 for r in rows if r[1] == n) for n in c.aliases}
        best = max(counts.items(), key=lambda kv: (kv[1], len(kv[0]), kv[0]))[0]
        assert c.canonical_name == best
        assert grp_of[c.canonical_name] == grp_of[sorted(c.aliases)[0]]


def test_sentence_renders_variants():
    """Smoke: the corpus actually uses the variant pool."""
    seen = {KGXF_PERSONS[kgxf_choices(d)["p"]] for d in range(500)}
    assert len(seen) >= 15  # most variants drawn in 500 docs
    assert any("Harman" in s or "Harmen" in s
               for s in (kgxf_sentence(d) for d in range(200)))
