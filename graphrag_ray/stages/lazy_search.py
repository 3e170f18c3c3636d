"""LazyGraphRAG query refinement + iterative-deepening search
(reference graphrag-core/src/lightrag/{query_refinement,
iterative_deepening}.rs).

Query refinement: extract initial concepts from the query, expand along
co-occurrence relations (outgoing edges sorted by confidence — the
reference's directed-graph quirk, pinned here to the lexicographic pair
direction), score by ln(frequency)+1 boosted 1.5× per connection to the
current set, with relevance feedback multiplying scores by
1+ln(chunk-frequency).

Iterative deepening: depth-limited concept expansion collecting chunks
from the concept→chunk index, with max-chunk and no-more-concepts stop
conditions.  The reference's adaptive quality stop reads
``results.total_chunks`` which is only assigned AFTER the loop, so it
can never fire mid-loop — replicated faithfully.

The reference iterates HashSets; every such loop here runs in sorted()
order so results are deterministic.
"""

from __future__ import annotations

import math

from .concept_graph import extract_concepts

# QueryRefinementConfig::default
MAX_ITERATIONS = 3
CONCEPTS_PER_ITER = 5
MAX_TOTAL_CONCEPTS = 20

# SearchConfig::default
MAX_DEPTH = 3
MIN_CHUNKS = 5
MAX_CHUNKS = 50
CONCEPTS_PER_DEPTH = 5
ADAPTIVE_QUALITY = 0.7


def normalize_concept(concept: str) -> str:
    """query_refinement.rs:303-311 — the alnum filter removes spaces
    BEFORE the space→underscore replace, so words simply concatenate
    (a faithful reference quirk)."""
    kept = "".join(c for c in concept.lower() if c.isalnum() or c == "_")
    return kept.replace(" ", "_")


class ConceptGraphView:
    """Minimal concept-graph interface: frequencies, pinned-direction
    relations with Jaccard confidences, concept→chunks index."""

    def __init__(self, frequencies: dict[str, int],
                 relations: list[tuple[str, str, float]],
                 concept_chunks: dict[str, list[str]]):
        self.frequencies = frequencies
        self.relations = relations
        self.out_edges: dict[str, list[tuple[str, float]]] = {}
        for src, dst, conf in relations:
            self.out_edges.setdefault(src, []).append((dst, conf))
        for src in self.out_edges:
            self.out_edges[src].sort(key=lambda t: (-t[1], t[0]))
        self._pairs = {(s, d) for s, d, _ in relations}
        # chunks keyed by NORMALIZED concept (the index the reference
        # queries with EntityId::new(normalize_concept(c)))
        self.chunks_by_norm: dict[str, list[str]] = {}
        self.entities_by_chunk: dict[str, list[str]] = {}
        for c, chunks in concept_chunks.items():
            self.chunks_by_norm.setdefault(normalize_concept(c),
                                           []).extend(chunks)
            for ch in chunks:
                self.entities_by_chunk.setdefault(ch, []).append(c)
        for k in self.chunks_by_norm:
            self.chunks_by_norm[k] = sorted(set(self.chunks_by_norm[k]))
        for k in self.entities_by_chunk:
            self.entities_by_chunk[k] = sorted(set(self.entities_by_chunk[k]))

    def get_related_concepts(self, concept: str, k: int) -> list[str]:
        """concept_graph.rs:462-483 — OUTGOING edges by confidence."""
        return [c for c, _ in self.out_edges.get(concept, [])[:k]]

    def has_relation(self, a: str, b: str) -> bool:
        return (a, b) in self._pairs or (b, a) in self._pairs

    def chunks_for(self, concept: str) -> list[str]:
        return self.chunks_by_norm.get(normalize_concept(concept), [])

    def chunks_entities(self, chunk: str) -> list[str]:
        """Chunk → concepts (the reference round-trips through a lossy
        normalize/denormalize pair; the view keeps original names so the
        relevance feedback stays live)."""
        return self.entities_by_chunk.get(chunk, [])


def _concept_relevance(concept: str, current: set[str],
                       graph: ConceptGraphView) -> float:
    """query_refinement.rs:220-253 / iterative_deepening.rs:258-287."""
    freq = graph.frequencies.get(concept)
    if freq is None:
        return 0.0
    score = math.log(freq) + 1.0
    connections = sum(1 for c in current if graph.has_relation(concept, c))
    return score * (1.0 + connections * 0.5)


def refine_query(query: str, graph: ConceptGraphView) -> dict:
    """query_refinement.rs:104-218."""
    initial = extract_concepts(query)
    if not initial:
        return {"query": query, "initial_concepts": [],
                "expanded_concepts": [], "relevant_chunk_ids": [],
                "iterations": 0, "relevance_scores": {}}
    current: set[str] = set(initial)
    all_expanded: list[str] = []
    relevant: set[str] = set()
    scores: dict[str, float] = {c: 1.0 for c in initial}
    for iteration in range(MAX_ITERATIONS):
        new_concepts: list[str] = []
        for concept in sorted(current):
            for related in graph.get_related_concepts(concept,
                                                      CONCEPTS_PER_ITER):
                if related not in current \
                        and len(current) < MAX_TOTAL_CONCEPTS:
                    score = _concept_relevance(related, current, graph)
                    if score > 0.0:
                        scores[related] = score
                        new_concepts.append(related)
                        # admission is size-capped DURING iteration
                        current.add(related)
                        all_expanded.append(related)
        if not new_concepts:
            break
        for c in new_concepts:
            relevant.update(graph.chunks_for(c))
        if iteration < MAX_ITERATIONS - 1:
            # relevance feedback (query_refinement.rs:275-301)
            freqs: dict[str, int] = {}
            for chunk in sorted(relevant):
                for c in graph.chunks_entities(chunk):
                    freqs[c] = freqs.get(c, 0) + 1
            for c, f in freqs.items():
                if c in scores:
                    scores[c] *= 1.0 + math.log(f)
    expanded = sorted(all_expanded,
                      key=lambda c: (-scores.get(c, 0.0), c))
    return {"query": query, "initial_concepts": initial,
            "expanded_concepts": expanded,
            "relevant_chunk_ids": sorted(relevant),
            "iterations": MAX_ITERATIONS,
            "relevance_scores": {c: scores.get(c, 0.0) for c in expanded}}


def ids_search(query: str, graph: ConceptGraphView) -> dict:
    """iterative_deepening.rs:112-215."""
    refined = refine_query(query, graph)
    depths: list[dict] = []
    if not refined["initial_concepts"]:
        return {"query": query, "depths": depths, "total_chunks": 0,
                "total_concepts": 0, "depth_reached": 0,
                "stop_reason": "max_depth_reached"}
    current: set[str] = set(refined["initial_concepts"])
    visited: set[str] = set()
    stop = "max_depth_reached"
    depth_reached = 0
    for depth in range(MAX_DEPTH):
        new_found = 0
        for concept in sorted(current):
            for chunk in graph.chunks_for(concept):
                if chunk not in visited:
                    visited.add(chunk)
                    new_found += 1
        depths.append({"depth": depth, "concepts_explored": len(current),
                       "new_chunks_found": new_found})
        if len(visited) >= MAX_CHUNKS:
            depth_reached = depth
            stop = "max_chunks_reached"
            break
        # the reference's adaptive stop reads total_chunks (still 0 mid-
        # loop) so it never fires — faithfully omitted
        scores: dict[str, float] = {}
        for concept in sorted(current):
            for related in graph.get_related_concepts(concept,
                                                      CONCEPTS_PER_DEPTH):
                if related not in current:
                    scores[related] = scores.get(related, 0.0) \
                        + _concept_relevance(related, current, graph)
        expanded = [c for c, _ in
                    sorted(scores.items(),
                           key=lambda t: (-t[1], t[0]))[:CONCEPTS_PER_DEPTH]]
        if not expanded:
            depth_reached = depth
            stop = "no_more_concepts"
            break
        current.update(expanded)
        depth_reached = depth + 1
    return {"query": query, "depths": depths,
            "total_chunks": len(visited), "total_concepts": len(current),
            "depth_reached": depth_reached, "stop_reason": stop}


# ---------------------------------------------------------------------------
# end-to-end lazy pipeline facade (lightrag/lazy_pipeline.rs:87-290)

CHUNK_SIZE = 512      # LazyPipelineConfig::default
CHUNK_OVERLAP = 128


def chunk_text(text: str, document_id: str,
               chunk_size: int = CHUNK_SIZE,
               chunk_overlap: int = CHUNK_OVERLAP) -> list[dict]:
    """lazy_pipeline.rs:242-278 — fixed windows with overlap carry-back."""
    chunks = []
    n = len(text)
    start = 0
    idx = 0
    while start < n:
        end = min(start + chunk_size, n)
        chunks.append({"id": f"{document_id}_{idx}",
                       "document_id": document_id,
                       "content": text[start:end],
                       "start": start, "end": end})
        if end >= n:
            break
        start = end - chunk_overlap
        idx += 1
    return chunks


class LazyPipeline:
    """LazyGraphRAGPipeline — chunk → concept-extract → build the
    co-occurrence graph + chunk index → iterative-deepening query.

    The in-memory facade mirrors the reference's single-process shape
    (pytest-gated); the distributed equivalents of each stage are the
    concept_* surfaces (one map_batches extraction pass + groupbys)."""

    def __init__(self, chunk_size: int = CHUNK_SIZE,
                 chunk_overlap: int = CHUNK_OVERLAP):
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap
        self.doc_concepts: dict[str, list[str]] = {}
        self.chunk_concepts: dict[str, list[str]] = {}
        self.chunks: dict[str, dict] = {}
        self.document_count = 0
        self.view: ConceptGraphView | None = None

    def index_document(self, document_id: str, text: str) -> None:
        for chunk in chunk_text(text, document_id, self.chunk_size,
                                self.chunk_overlap):
            concepts = extract_concepts(chunk["content"])
            self.doc_concepts.setdefault(document_id, []).extend(concepts)
            self.chunk_concepts[chunk["id"]] = concepts
            self.chunks[chunk["id"]] = chunk
        self.document_count += 1

    def build_graph(self) -> None:
        from .concept_graph import jaccard_confidence

        freqs: dict[str, int] = {}
        for cs in self.doc_concepts.values():
            for c in cs:
                freqs[c] = freqs.get(c, 0) + 1
        chunk_sets: dict[str, set[str]] = {}
        concept_chunks: dict[str, list[str]] = {}
        for cid, cs in self.chunk_concepts.items():
            for c in cs:
                chunk_sets.setdefault(c, set()).add(cid)
                concept_chunks.setdefault(c, []).append(cid)
        relations = []
        names = sorted(chunk_sets)
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                shared = chunk_sets[a] & chunk_sets[b]
                if shared:
                    relations.append((a, b, jaccard_confidence(
                        len(chunk_sets[a]), len(chunk_sets[b]),
                        len(shared))))
        self.view = ConceptGraphView(freqs, relations, concept_chunks)

    def query(self, query: str) -> dict:
        if self.view is None:
            return {"query": query, "depths": [], "total_chunks": 0,
                    "total_concepts": 0, "depth_reached": 0,
                    "stop_reason": "max_depth_reached"}
        return ids_search(query, self.view)

    def statistics(self) -> dict:
        """lazy_pipeline.rs:222-240."""
        return {
            "document_count": self.document_count,
            "chunk_count": len(self.chunks),
            "concept_count": (len(self.view.frequencies)
                              if self.view else 0),
            "relation_count": (len(self.view.relations)
                               if self.view else 0),
        }
