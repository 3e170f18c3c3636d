"""Query intelligence, adaptive routing and the plan optimizer
(reference graphrag-core/src/query/{intelligence,adaptive_routing,
optimizer}.rs).

Three rule engines on the query side:

- ``rewrite_query`` — normalization, type detection, template rewrite,
  in-order synonym expansion with stateful dedup, stop-word key terms,
  specificity/relevance confidence (intelligence.rs:92-381).
- ``analyze_complexity`` — keyword/length/entity-weighted complexity →
  hierarchical routing level (adaptive_routing.rs:77-270).
- ``QueryOptimizer`` — algebraic rewrite (join operand swap by estimated
  cardinality), greedy multi-way join ordering, and the cost model over
  graph statistics (optimizer.rs:141-475).  Plans are tiny trees; the
  statistics they consume are computed DISTRIBUTED from the entity/edge
  Datasets (one groupby-count pass each).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# query intelligence (intelligence.rs)

SYNONYMS: dict[str, tuple[str, ...]] = {
    "find": ("search", "locate"),
    "person": ("individual", "people"),
    "company": ("organization", "business", "firm"),
    "show": ("display", "present"),
    "get": ("retrieve", "fetch"),
    "large": ("big", "huge", "significant"),
    "small": ("tiny", "minor"),
    "important": ("significant", "critical", "key"),
}

# (pattern, query_type, rewrite) — first matching template of the detected
# type wins (intelligence.rs:334-359)
QI_TEMPLATES: tuple[tuple[str, str, str], ...] = (
    ("who is", "entity_lookup", "entity:"),
    ("what is", "entity_lookup", "define:"),
    ("how many", "aggregation", "count:"),
    ("compare", "comparison", "compare:"),
)

QI_STOP_WORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on that the "
    "to was will with".split())


def detect_query_type(query_lower: str) -> str:
    """intelligence.rs:170-231 — ordered pattern cascade."""
    if ("relationship between" in query_lower or "how does" in query_lower
            or "related to" in query_lower
            or "connection between" in query_lower):
        return "relationship"
    if (query_lower.startswith("who is") or query_lower.startswith("what is")
            or query_lower.startswith("define")):
        return "entity_lookup"
    if (query_lower.startswith("how many") or query_lower.startswith("count")
            or "total" in query_lower or "sum" in query_lower
            or "average" in query_lower):
        return "aggregation"
    if ("compare" in query_lower or "difference between" in query_lower
            or "versus" in query_lower or "vs" in query_lower):
        return "comparison"
    if ("when" in query_lower or "before" in query_lower
            or "after" in query_lower or "during" in query_lower
            or "timeline" in query_lower):
        return "temporal"
    if ("why" in query_lower or "because" in query_lower
            or "cause" in query_lower or "reason" in query_lower
            or "led to" in query_lower):
        return "causal"
    return "general"


def rewrite_query(query: str,
                  relevance: dict[str, float] | None = None) -> dict:
    """intelligence.rs:92-118 — the full rewrite pipeline."""
    relevance = relevance or {}
    normalized = query.strip().lower()
    qtype = detect_query_type(normalized)
    # template rewrite: first template of the matching type whose pattern
    # occurs; replaces ALL occurrences (str::replace)
    rewritten = normalized
    for pattern, ttype, repl in QI_TEMPLATES:
        if ttype == qtype and pattern in rewritten:
            rewritten = rewritten.replace(pattern, repl)
            break
    # synonym expansion with stateful dedup: originals always appended,
    # synonyms only if not already present (intelligence.rs:243-262)
    expanded: list[str] = []
    for word in rewritten.split():
        expanded.append(word)
        for syn in SYNONYMS.get(word, ()):
            if syn not in expanded:
                expanded.append(syn)
    expanded_str = " ".join(expanded)
    key_terms = [w for w in expanded_str.split() if w not in QI_STOP_WORDS]
    # confidence (intelligence.rs:273-295)
    if not key_terms:
        confidence = 0.5
    else:
        word_count = len(normalized.split())
        term_count = len(key_terms)
        specificity = min(term_count / (word_count + 1.0), 1.0)
        rel = sum(relevance.get(t, 0.5) for t in key_terms) / term_count
        confidence = specificity * 0.6 + rel * 0.4
    return {"original": query, "rewritten": expanded_str,
            "query_type": qtype, "expanded_terms": key_terms,
            "confidence": confidence}


# ---------------------------------------------------------------------------
# adaptive routing (adaptive_routing.rs)

BROAD_KEYWORDS = (
    "overview", "summary", "summarize", "main", "general", "all", "themes",
    "topics", "overall", "broadly", "big picture", "what are", "list all",
    "show me all")
SPECIFIC_KEYWORDS = (
    "relationship between", "how does", "why does", "specific", "detail",
    "exactly", "precisely", "what is the connection", "explain how",
    "describe the", "between", "and")

_LEVELS = {"very_broad": lambda m: max(m, 2),
           "broad": lambda m: max(m - 1, 1),
           "medium": lambda m: 1,
           "specific": lambda m: 0,
           "very_specific": lambda m: 0}


def analyze_complexity(query: str, *, keyword_weight: float = 0.5,
                       length_weight: float = 0.3,
                       entity_weight: float = 0.2,
                       max_level: int = 3) -> dict:
    """adaptive_routing.rs:124-270 (analyze_detailed)."""
    ql = query.lower()
    score = 0.0
    matches = 0
    for kw in BROAD_KEYWORDS:
        if kw in ql:
            score += 1.0
            matches += 1
    for kw in SPECIFIC_KEYWORDS:
        if kw in ql:
            score -= 1.0
            matches += 1
    keyword_score = score / matches if matches else 0.0
    wc = len(query.split())
    if 1 <= wc <= 3:
        length_score = 0.5
    elif 4 <= wc <= 5:
        length_score = 0.2
    elif 6 <= wc <= 7:
        length_score = 0.0
    elif 8 <= wc <= 10:
        length_score = -0.3
    else:
        length_score = -0.5
    indicators = ql.count('"') // 2 + ql.count(" and ") + ql.count("between")
    entity_score = {0: 0.3, 1: 0.0, 2: -0.4}.get(indicators, -0.7)
    total = (keyword_score * keyword_weight + length_score * length_weight
             + entity_score * entity_weight)
    if total >= 0.7:
        complexity = "very_broad"
    elif total >= 0.4:
        complexity = "broad"
    elif total >= -0.2:
        complexity = "medium"
    elif total >= -0.5:
        complexity = "specific"
    else:
        complexity = "very_specific"
    return {"query": query, "complexity": complexity,
            "suggested_level": _LEVELS[complexity](max_level),
            "keyword_score": keyword_score, "length_score": length_score,
            "entity_score": entity_score}


# ---------------------------------------------------------------------------
# plan optimizer (optimizer.rs)
#
# QueryOp trees as tuples:
#   ("scan", entity_type)
#   ("filter", property, value)
#   ("join", join_type, left, right)          join_type: inner|left|cross
#   ("neighbors", source, relation_type|None, max_hops)
#   ("union", left, right)
#   ("limit", source, count)


@dataclass(frozen=True)
class GraphStats:
    """optimizer.rs:88-139 — computed distributed via graph_statistics()."""
    total_entities: int
    entities_by_type: dict
    total_relationships: int
    average_degree: float


def graph_statistics(entities_ds, edges_ds) -> GraphStats:
    """One distributed pass per table: entity-type counts via groupby,
    relationship count via count()."""
    type_rows = entities_ds.groupby("entity_type").count().take_all()
    by_type = {r["entity_type"]: r["count()"] for r in type_rows}
    total = sum(by_type.values())
    n_rels = edges_ds.count()
    avg_deg = (n_rels * 2.0) / total if total else 0.0
    return GraphStats(total, by_type, n_rels, avg_deg)


class QueryOptimizer:
    """optimizer.rs:141-475 — rewrite + greedy join order + cost model."""

    def __init__(self, stats: GraphStats):
        self.stats = stats

    # -- cost model (estimate_cost)

    def estimate_cost(self, op) -> dict:
        kind = op[0]
        st = self.stats
        if kind == "scan":
            card = st.entities_by_type.get(op[1], 0)
            sel = card / st.total_entities if st.total_entities else 0.0
            return {"cardinality": card, "cost": float(card),
                    "selectivity": sel}
        if kind == "filter":
            sel = 0.1
            card = int(st.total_entities * sel)
            return {"cardinality": card, "cost": float(st.total_entities),
                    "selectivity": sel}
        if kind == "join":
            lc = self.estimate_cost(op[2])
            rc = self.estimate_cost(op[3])
            jt = op[1]
            if jt == "inner":
                card = int(math.sqrt(lc["cardinality"] * rc["cardinality"]))
            elif jt == "left":
                card = lc["cardinality"]
            else:
                card = lc["cardinality"] * rc["cardinality"]
            cost = (lc["cost"] + rc["cost"]
                    + lc["cardinality"] * float(rc["cardinality"]))
            return {"cardinality": card, "cost": cost,
                    "selectivity": lc["selectivity"] * rc["selectivity"]}
        if kind == "neighbors":
            sc = self.estimate_cost(op[1])
            expansion = st.average_degree ** op[3]
            card = int(min(sc["cardinality"] * expansion,
                           float(st.total_entities)))
            sel = card / st.total_entities if st.total_entities else 0.0
            return {"cardinality": card, "cost": sc["cost"] + card,
                    "selectivity": sel}
        if kind == "union":
            lc = self.estimate_cost(op[1])
            rc = self.estimate_cost(op[2])
            card = (lc["cardinality"] + rc["cardinality"]) * 9 // 10
            return {"cardinality": card, "cost": lc["cost"] + rc["cost"],
                    "selectivity": min(lc["selectivity"] + rc["selectivity"],
                                       1.0)}
        if kind == "limit":
            sc = self.estimate_cost(op[1])
            sel = min(op[2] / st.total_entities, 1.0) \
                if st.total_entities else 1.0
            return {"cardinality": min(op[2], sc["cardinality"]),
                    "cost": sc["cost"], "selectivity": sel}
        raise ValueError(kind)

    # -- rewrite (optimizer.rs:160-229): binary join operand swap

    def _rewrite(self, op):
        kind = op[0]
        if kind == "join":
            left = self._rewrite(op[2])
            right = self._rewrite(op[3])
            lc = self.estimate_cost(left)
            rc = self.estimate_cost(right)
            if lc["cardinality"] > rc["cardinality"]:
                left, right = right, left
            return ("join", op[1], left, right)
        if kind == "neighbors":
            return ("neighbors", self._rewrite(op[1]), op[2], op[3])
        if kind == "union":
            return ("union", self._rewrite(op[1]), self._rewrite(op[2]))
        if kind == "limit":
            return ("limit", self._rewrite(op[1]), op[2])
        return op

    # -- greedy multi-way join ordering (optimizer.rs:232-362)

    def _collect(self, op, out):
        if op[0] == "join":
            self._collect(op[2], out)
            self._collect(op[3], out)
        else:
            out.append(op)

    def _greedy_join(self, operands, join_type):
        while len(operands) > 1:
            best = None
            for i in range(len(operands)):
                for j in range(i + 1, len(operands)):
                    ci = self.estimate_cost(operands[i])["cardinality"]
                    cj = self.estimate_cost(operands[j])["cardinality"]
                    cost = float(ci) * float(cj)
                    if best is None or cost < best[0]:
                        best = (cost, i, j)
            _, i, j = best
            left = operands.pop(i)
            right = operands.pop(j - 1 if j > i else j)
            operands.append(("join", join_type, left, right))
        return operands[0]

    def _optimize_joins(self, op):
        kind = op[0]
        if kind == "join":
            left = self._optimize_joins(op[2])
            right = self._optimize_joins(op[3])
            operands: list = []
            self._collect(left, operands)
            self._collect(right, operands)
            if len(operands) > 2:
                return self._greedy_join(operands, op[1])
            return ("join", op[1], left, right)
        if kind == "neighbors":
            return ("neighbors", self._optimize_joins(op[1]), op[2], op[3])
        if kind == "union":
            return ("union", self._optimize_joins(op[1]),
                    self._optimize_joins(op[2]))
        if kind == "limit":
            return ("limit", self._optimize_joins(op[1]), op[2])
        return op

    def optimize(self, op):
        return self._optimize_joins(self._rewrite(op))


def serialize_plan(op) -> str:
    """Deterministic prefix serialization for plan comparison."""
    kind = op[0]
    if kind == "scan":
        return f"Scan({op[1]})"
    if kind == "filter":
        return f"Filter({op[1]}={op[2]})"
    if kind == "join":
        return (f"Join({op[1]},{serialize_plan(op[2])},"
                f"{serialize_plan(op[3])})")
    if kind == "neighbors":
        rel = op[2] if op[2] is not None else "*"
        return f"Neighbors({serialize_plan(op[1])},{rel},{op[3]})"
    if kind == "union":
        return f"Union({serialize_plan(op[1])},{serialize_plan(op[2])})"
    if kind == "limit":
        return f"Limit({serialize_plan(op[1])},{op[2]})"
    raise ValueError(kind)


# Fixed plan workload for the driver-oracled optimizer surface: each plan
# exercises a different rule (binary swap, 3-way greedy, neighbor
# expansion, union/limit arithmetic, cross-join with filter).
OPTIMIZER_PLANS: tuple[tuple[str, object], ...] = (
    ("swap_binary",
     ("join", "inner", ("scan", "PERSON"), ("scan", "ORGANIZATION"))),
    ("greedy_threeway",
     ("join", "inner",
      ("join", "inner", ("scan", "PERSON"), ("scan", "LOCATION")),
      ("scan", "ORGANIZATION"))),
    ("neighbors_twohop",
     ("neighbors", ("scan", "PERSON"), "KNOWS", 2)),
    ("union_limit",
     ("union", ("scan", "LOCATION"), ("limit", ("scan", "PERSON"), 5))),
    ("cross_filter",
     ("join", "cross", ("filter", "name", "x"), ("scan", "LOCATION"))),
    ("limit_neighbors_join",
     ("limit",
      ("neighbors",
       ("join", "inner", ("scan", "ORGANIZATION"), ("scan", "LOCATION")),
       None, 1), 10)),
)


# Fixed workload for the driver-oracled intelligence/routing surfaces —
# exercises every query-type branch, template rewrite, the synonym-dedup
# quirk (an original word may duplicate an earlier synonym), stop-word
# filtering, and each routing complexity band.
QI_QUERIES: tuple[str, ...] = (
    "who is the important person at the company",
    "find search results for the large dataset",
    "how many companies are in london",
    "compare tokyo versus berlin",
    "what is the relationship between alice and bob",
    "when was the company founded",
    "why did the stock price fall",
    "show me all the general themes overview",
    "explain how exactly the specific relationship between alice and bob "
    "developed",
    "summarize",
)
