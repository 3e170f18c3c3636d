"""Cross-document entity canonicalization — pure logic.

Semantics are the reference's hybrid linking flow
(corpus/entity_linker.rs:379-429): exact-name grouping first, then greedy
fuzzy clustering of the remainder at threshold 0.85, with the metric family
and type guard of the graph-level ``StringSimilarityLinker``
(string_similarity_linker.rs:126-165) and canonical-name selection
most-frequent-then-longest (corpus/entity_linker.rs:524-536).

Distribution contract (SURVEY.md §7.4): the *exact* phase is a salted
two-phase groupby on (entity_type, normalize_string(name)); the *fuzzy*
phase runs per blocking group (entity_type, soundex(first token)) inside
``groupby().map_groups`` — O(n²) only within a block, never globally.
Documented blocking assumption: variants can only merge when they share the
first token's Soundex class; typos that alter the first token's consonant
skeleton stay separate clusters.

Greedy clustering is order-dependent in the reference (vec iteration
order); we pin a deterministic order: exact-clusters sorted by
(-total_count, norm_name).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .textfns import name_similarity, normalize_name, normalize_string, soundex


@dataclass
class ExactCluster:
    """One exact-normalized-name group (output of the exact groupby).

    ``docs`` carries exact doc ids (doc_frequency_mode='exact'); ``hll``
    carries the mergeable HyperLogLog registers instead when the sketch
    mode bounds the per-key payload (functions/sketch.py)."""

    entity_type: str
    norm_name: str
    name_counts: dict[str, int]          # raw name → #chunk-level rows
    mention_count: int = 0
    max_confidence: float = 0.0
    docs: set[str] = field(default_factory=set)
    hll: bytes = b""

    @property
    def total_count(self) -> int:
        return sum(self.name_counts.values())

    def doc_frequency(self) -> int:
        if self.hll:
            from .sketch import hll_estimate

            return hll_estimate(self.hll)
        return len(self.docs)

    def merge(self, other: "ExactCluster") -> None:
        from .sketch import hll_merge

        for name, cnt in other.name_counts.items():
            self.name_counts[name] = self.name_counts.get(name, 0) + cnt
        self.mention_count += other.mention_count
        self.max_confidence = max(self.max_confidence, other.max_confidence)
        self.docs |= other.docs
        if self.hll or other.hll:
            self.hll = hll_merge(self.hll, other.hll)


def block_key(entity_type: str, norm_name: str) -> str:
    """Fuzzy-phase blocking key (documented partitioning assumption)."""
    first = norm_name.split(" ", 1)[0] if norm_name else ""
    return f"{entity_type}|{soundex(first)}"


def select_canonical_name(name_counts: dict[str, int]) -> str:
    """Most frequent, ties broken by longest, then lexicographic for full
    determinism (corpus/entity_linker.rs:524-536)."""
    return max(name_counts.items(), key=lambda kv: (kv[1], len(kv[0]), kv[0]))[0]


@dataclass
class CanonicalCluster:
    canonical_id: str
    canonical_name: str
    entity_type: str
    aliases: list[str]
    doc_frequency: int
    mention_count: int
    confidence: float
    member_entity_ids: list[str]  # raw {TYPE}_{normalize_name} ids → alias map


def fuzzy_cluster_block(
    clusters: list[ExactCluster],
    threshold: float = 0.85,
    max_edit_distance: int = 2,
    use_phonetic: bool = False,
) -> list[CanonicalCluster]:
    """Greedy seed-absorb clustering within one blocking group
    (corpus/entity_linker.rs:213-273 shape, similarity per
    string_similarity_linker.rs:126-165)."""
    ordered = sorted(clusters, key=lambda c: (-c.total_count, c.norm_name))
    out: list[CanonicalCluster] = []
    used = [False] * len(ordered)
    for i, seed in enumerate(ordered):
        if used[i]:
            continue
        used[i] = True
        members = [seed]
        for j in range(i + 1, len(ordered)):
            if used[j]:
                continue
            cand = ordered[j]
            if cand.entity_type != seed.entity_type:
                continue
            sim = name_similarity(
                seed.norm_name, cand.norm_name,
                max_edit_distance=max_edit_distance, use_phonetic=use_phonetic,
            )
            if sim >= threshold:
                members.append(cand)
                used[j] = True
        merged: dict[str, int] = {}
        mention_count = 0
        max_conf = 0.0
        docs: set[str] = set()
        hll = b""
        member_ids: set[str] = set()
        for m in members:
            for name, cnt in m.name_counts.items():
                merged[name] = merged.get(name, 0) + cnt
                member_ids.add(f"{m.entity_type}_{normalize_name(name)}")
            mention_count += m.mention_count
            max_conf = max(max_conf, m.max_confidence)
            docs |= m.docs
            if m.hll:
                from .sketch import hll_merge

                hll = hll_merge(hll, m.hll)
        canonical_name = select_canonical_name(merged)
        if hll:
            from .sketch import hll_estimate

            doc_freq = hll_estimate(hll)
        else:
            doc_freq = len(docs)
        out.append(
            CanonicalCluster(
                canonical_id=f"{seed.entity_type}_{normalize_name(canonical_name)}",
                canonical_name=canonical_name,
                entity_type=seed.entity_type,
                aliases=sorted(merged),
                doc_frequency=doc_freq,
                mention_count=mention_count,
                confidence=max_conf,
                member_entity_ids=sorted(member_ids),
            )
        )
    return out


def exact_clusters_from_rows(
    rows: list[tuple[str, str, str, float, int]],
) -> dict[tuple[str, str], ExactCluster]:
    """Build exact clusters from (doc_id, name, entity_type, confidence,
    n_mentions) rows — the single-process oracle path; the distributed path
    reaches the same state via partial aggregation (stages/canonicalize.py).
    """
    acc: dict[tuple[str, str], ExactCluster] = {}
    for doc_id, name, etype, conf, n_mentions in rows:
        norm = normalize_string(name)
        key = (etype, norm)
        c = acc.get(key)
        if c is None:
            c = acc[key] = ExactCluster(etype, norm, {})
        c.name_counts[name] = c.name_counts.get(name, 0) + 1
        c.mention_count += n_mentions
        c.max_confidence = max(c.max_confidence, conf)
        c.docs.add(doc_id)
    return acc


def canonicalize(
    exact: dict[tuple[str, str], ExactCluster],
    threshold: float = 0.85,
    max_edit_distance: int = 2,
    use_phonetic: bool = False,
) -> list[CanonicalCluster]:
    """Group exact clusters by blocking key and fuzzy-cluster each block;
    deterministic output order by canonical_id."""
    blocks: dict[str, list[ExactCluster]] = {}
    for (etype, norm), cluster in exact.items():
        blocks.setdefault(block_key(etype, norm), []).append(cluster)
    out: list[CanonicalCluster] = []
    for key in sorted(blocks):
        out.extend(
            fuzzy_cluster_block(
                blocks[key], threshold=threshold,
                max_edit_distance=max_edit_distance, use_phonetic=use_phonetic,
            )
        )
    out.sort(key=lambda c: c.canonical_id)
    return out


def lmcd_cluster_block(
    clusters: list[ExactCluster],
    confidence_threshold: float = 0.8,
) -> list[CanonicalCluster]:
    """G5: LMCD (Language-Model Confident Deduplication) clustering
    strategy (corpus/entity_linker.rs:296-376).

    Semantics transcribed: entities sharing an exact name form a
    high-confidence cluster (confidence_threshold + 0.1); an entity whose
    name is MERELY SIMILAR (> 0.9 ungated levenshtein similarity,
    entity_linker.rs:480-493) to an already-accepted cluster name is NOT
    merged — it becomes a low-confidence singleton (threshold - 0.1) left
    for a (future) LLM pass to adjudicate. Deterministic order
    (-total_count, norm_name) replaces the reference's vec order; ids are
    content-derived, not uuids. Runs inside the same blocked groupby
    dataflow as the fuzzy strategy."""
    from .textfns import levenshtein

    def lmcd_similarity(s1: str, s2: str) -> float:
        if s1 == s2:
            return 1.0
        max_len = max(len(s1), len(s2))
        if max_len == 0:
            return 1.0
        return 1.0 - levenshtein(s1, s2) / max_len

    ordered = sorted(clusters, key=lambda c: (-c.total_count, c.norm_name))
    accepted_names: list[str] = []
    out: list[CanonicalCluster] = []
    for c in ordered:
        similar = any(lmcd_similarity(name, c.norm_name) > 0.9
                      for name in accepted_names)
        canonical_name = select_canonical_name(c.name_counts)
        base_id = f"{c.entity_type}_{normalize_name(canonical_name)}"
        if similar:
            conf = confidence_threshold - 0.1
            cid = f"{base_id}__lmcd_singleton"
        else:
            accepted_names.append(c.norm_name)
            conf = confidence_threshold + 0.1
            cid = base_id
        out.append(
            CanonicalCluster(
                canonical_id=cid,
                canonical_name=canonical_name,
                entity_type=c.entity_type,
                aliases=sorted(c.name_counts),
                doc_frequency=c.doc_frequency(),
                mention_count=c.mention_count,
                confidence=min(1.0, max(0.0, conf)),
                member_entity_ids=sorted(
                    f"{c.entity_type}_{normalize_name(n)}" for n in c.name_counts
                ),
            )
        )
    return out
