"""Function-calling toolset over the KG (reference
graphrag-core/src/function_calling/{functions,mod}.rs).

Graph query functions an agent can call: phased entity search
(exact → contains → fuzzy with the reference's gating-on-limit and
dedup), entity expansion (incident relationships with direction),
path traversal, plus the FunctionCaller registry with call history,
statistics and the per-query call cap.

Entity iteration order is pinned to canonical_id ASC and relationship
order to (src, dst, rel_type) ASC — the reference iterates HashMaps.
The fuzzy matcher's single-word branch RETURNS its prefix test directly
(no edit-distance fallthrough), a faithful quirk.
"""

from __future__ import annotations


def edit_distance(s1: str, s2: str) -> int:
    """functions.rs:72-116 (simple_edit_distance)."""
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def fuzzy_name_match(entity_name: str, query_name: str) -> bool:
    """functions.rs:44-70."""
    el, ql = entity_name.lower(), query_name.lower()
    eparts, qparts = el.split(), ql.split()
    if len(qparts) == 1 and eparts:
        return (eparts[0].startswith(qparts[0])
                or qparts[0].startswith(eparts[0]))
    if eparts and qparts and eparts[-1] == qparts[-1]:
        return True
    dist = edit_distance(el, ql)
    max_allowed = max(min(len(ql), len(el)) // 4, 1)
    return dist <= max_allowed


def graph_search(entity_name: str, entities: list[dict],
                 limit: int = 10) -> list[dict]:
    """GraphSearchFunction::call (functions.rs:121-197): three phases
    with relevance tiers 1.0 / 0.8 / 0.6; phases 2 and 3 only run while
    the match count is still below the limit; stable score sort then
    truncation.  ``entities``: [{id, name, type, confidence,
    mention_count}] in pinned canonical_id order."""
    qn = entity_name.lower().strip()
    seen: set[str] = set()
    matches: list[tuple[dict, float]] = []
    for e in entities:
        if e["name"].lower().strip() == qn and e["id"] not in seen:
            seen.add(e["id"])
            matches.append((e, 1.0))
    if len(matches) < limit:
        for e in entities:
            el = e["name"].lower()
            if (qn in el or el in qn) and e["id"] not in seen:
                seen.add(e["id"])
                matches.append((e, 0.8))
    if len(matches) < limit:
        for e in entities:
            if fuzzy_name_match(e["name"], entity_name) \
                    and e["id"] not in seen:
                seen.add(e["id"])
                matches.append((e, 0.6))
    matches.sort(key=lambda t: -t[1])  # stable
    return [{**e, "relevance": score} for e, score in matches[:limit]]


def entity_expand(entity_id: str, entities: list[dict],
                  edges: list[dict], limit: int = 20) -> dict | None:
    """EntityExpandFunction::call (functions.rs:247-318): incident
    relationships with direction and the related endpoint, first
    ``limit`` in pinned (src, dst, rel_type) order.  ``edges``:
    [{src, dst, rel_type, confidence, n_occurrences}]."""
    by_id = {e["id"]: e for e in entities}
    ent = by_id.get(entity_id)
    if ent is None:
        return None
    rels = []
    for r in edges:
        if r["src"] != entity_id and r["dst"] != entity_id:
            continue
        if len(rels) >= limit:
            break
        is_source = r["src"] == entity_id
        other_id = r["dst"] if is_source else r["src"]
        other = by_id.get(other_id)
        rels.append({
            "relationship_type": r["rel_type"],
            "direction": "outgoing" if is_source else "incoming",
            "related_id": other_id,
            "related_name": other["name"] if other else "",
            "related_type": other["type"] if other else "",
            "confidence": r["confidence"],
            "context_count": r.get("n_occurrences", 0),
        })
    return {"entity": ent, "relationships": rels}


def traverse(source: str, target: str, entities: list[dict],
             edges: list[dict], max_hops: int = 3) -> list[dict]:
    """RelationshipTraverseFunction::find_paths (functions.rs:477-560):
    the reference's 'BFS' pops from a Vec — actually a DFS — with a
    GLOBAL visited set, so each node is expanded once; paths sorted by
    length.  Resolution: id exact → name exact → first partial
    (functions.rs:563-596), entity order pinned."""

    def resolve(name_or_id: str) -> dict | None:
        for e in entities:
            if e["id"] == name_or_id:
                return e
        for e in entities:
            if e["name"] == name_or_id:
                return e
        nl = name_or_id.lower()
        for e in entities:
            if nl in e["name"].lower():
                return e
        return None

    se, te = resolve(source), resolve(target)
    if se is None or te is None:
        return []
    if se["id"] == te["id"]:
        return [{"path": [se["id"]], "length": 0, "relationships": []}]
    stack = [(se["id"], [], [])]
    visited: set[str] = set()
    paths = []
    while stack:
        cur, path, rels = stack.pop()
        if len(path) >= max_hops:
            continue
        if cur in visited:
            continue
        visited.add(cur)
        if cur == te["id"]:
            paths.append({"path": path + [cur], "length": len(path),
                          "relationships": rels})
            continue
        for r in edges:
            nxt = r["dst"] if r["src"] == cur else \
                r["src"] if r["dst"] == cur else None
            if nxt is not None and nxt not in visited:
                stack.append((nxt, path + [cur], rels + [{
                    "type": r["rel_type"], "confidence": r["confidence"],
                    "from": cur, "to": nxt}]))
    paths.sort(key=lambda p: p["length"])
    return paths


class FunctionCaller:
    """Function registry with history, statistics and the per-query call
    cap (function_calling/mod.rs:80-240)."""

    def __init__(self, max_calls_per_query: int = 10):
        self.functions: dict[str, object] = {}
        self.history: list[dict] = []
        self.max_calls = max_calls_per_query

    def register(self, name: str, fn, description: str = "") -> None:
        self.functions[name] = {"fn": fn, "description": description}

    def definitions(self) -> list[dict]:
        return [{"name": n, "description": f["description"]}
                for n, f in self.functions.items()]

    def call(self, name: str, **kwargs) -> dict:
        if name not in self.functions:
            res = {"name": name, "success": False,
                   "error": f"Function '{name}' not found", "result": None}
        else:
            try:
                out = self.functions[name]["fn"](**kwargs)
                res = {"name": name, "success": True, "error": None,
                       "result": out}
            except Exception as exc:  # noqa: BLE001 — mirror reference
                res = {"name": name, "success": False, "error": str(exc),
                       "result": None}
        self.history.append(res)
        return res

    def call_many(self, calls: list[tuple[str, dict]]) -> list[dict]:
        out = []
        for i, (name, kwargs) in enumerate(calls):
            if i >= self.max_calls:
                break
            out.append(self.call(name, **kwargs))
        return out

    def statistics(self) -> dict:
        total = len(self.history)
        ok = sum(1 for r in self.history if r["success"])
        per_fn: dict[str, int] = {}
        for r in self.history:
            per_fn[r["name"]] = per_fn.get(r["name"], 0) + 1
        return {"total_calls": total, "successful_calls": ok,
                "failed_calls": total - ok,
                "success_rate": ok / total if total else 0.0,
                "calls_per_function": per_fn}


# Fixed argument workload for the driver-oracled surfaces.
FC_SEARCH_ARGS: tuple[tuple[str, int], ...] = (
    ("alice harmon", 10),   # exact + contains phases
    ("corp", 3),            # limit gating mid-phase
    ("har", 10),            # contains only
    ("alice hormon", 10),   # typo → edit-distance fuzzy
    ("new", 5),             # single-word prefix fuzzy + contains
    ("zzzz", 5),            # no matches
)
FC_EXPAND_ARGS: tuple[tuple[str, int], ...] = (
    ("PERSON_aliceharmon", 20),
    ("LOCATION_tokyo", 5),
    ("ORGANIZATION_corp", 20),
    ("PERSON_nosuch", 20),
)
