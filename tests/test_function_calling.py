"""Function-calling toolset tests (function_calling/{functions,mod}.rs)."""

import pytest

from graphrag_ray.stages.function_calling import (FunctionCaller,
                                                  edit_distance,
                                                  entity_expand,
                                                  fuzzy_name_match,
                                                  graph_search, traverse)

ENTS = [
    {"id": "P_alice", "name": "Alice Harmon", "type": "PERSON",
     "confidence": 0.9, "mention_count": 3},
    {"id": "P_bob", "name": "Bob Tanner", "type": "PERSON",
     "confidence": 0.8, "mention_count": 2},
    {"id": "L_tokyo", "name": "Tokyo", "type": "LOCATION",
     "confidence": 0.9, "mention_count": 5},
    {"id": "P_alicia", "name": "Alicia Harmon", "type": "PERSON",
     "confidence": 0.7, "mention_count": 1},
]
EDGES = [
    {"src": "P_alice", "dst": "L_tokyo", "rel_type": "LOCATED_IN",
     "confidence": 0.5, "n_occurrences": 2},
    {"src": "P_alice", "dst": "P_bob", "rel_type": "KNOWS",
     "confidence": 0.5, "n_occurrences": 1},
    {"src": "P_bob", "dst": "L_tokyo", "rel_type": "VISITED",
     "confidence": 0.5, "n_occurrences": 1},
]


def test_fuzzy_single_word_prefix_only():
    # single-word branch RETURNS the prefix test — no distance fallthrough
    assert fuzzy_name_match("Alice Harmon", "ali")
    assert not fuzzy_name_match("Alice Harmon", "harmon")  # not first word
    # multi-word: last-name equality
    assert fuzzy_name_match("Alice Harmon", "bob harmon")
    # multi-word: quarter-length edit distance
    assert fuzzy_name_match("Alice Harmon", "alice hormon")
    assert not fuzzy_name_match("Alice Harmon", "zzz qqq")


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "ab") == 2


def test_graph_search_phases_and_dedup():
    out = graph_search("alice harmon", ENTS, limit=10)
    # exact first (1.0), then contains, then fuzzy (Alicia via last name)
    assert [(m["id"], m["relevance"]) for m in out] == \
        [("P_alice", 1.0), ("P_alicia", 0.6)]


def test_graph_search_limit_gates_phases():
    # limit 1 satisfied by the exact phase → contains/fuzzy never run
    out = graph_search("tokyo", ENTS, limit=1)
    assert [(m["id"], m["relevance"]) for m in out] == [("L_tokyo", 1.0)]


def test_entity_expand_directions_and_limit():
    ex = entity_expand("P_alice", ENTS, EDGES, limit=1)
    assert len(ex["relationships"]) == 1
    ex2 = entity_expand("L_tokyo", ENTS, EDGES)
    dirs = {(r["relationship_type"], r["direction"])
            for r in ex2["relationships"]}
    assert dirs == {("LOCATED_IN", "incoming"), ("VISITED", "incoming")}
    assert entity_expand("missing", ENTS, EDGES) is None


def test_traverse_paths_and_self():
    same = traverse("P_alice", "P_alice", ENTS, EDGES)
    assert same == [{"path": ["P_alice"], "length": 0,
                     "relationships": []}]
    paths = traverse("Alice Harmon", "Tokyo", ENTS, EDGES, max_hops=3)
    assert paths and paths[0]["path"][0] == "P_alice"
    assert paths[0]["path"][-1] == "L_tokyo"


def test_function_caller_registry_and_stats():
    fc = FunctionCaller(max_calls_per_query=2)
    fc.register("search", lambda entity_name:
                graph_search(entity_name, ENTS), "entity search")
    r = fc.call("search", entity_name="tokyo")
    assert r["success"] and r["result"][0]["id"] == "L_tokyo"
    bad = fc.call("nope")
    assert not bad["success"]
    err = fc.call("search", wrong_kw=1)
    assert not err["success"]
    # call_many respects the cap
    out = fc.call_many([("search", {"entity_name": "tokyo"})] * 5)
    assert len(out) == 2
    st = fc.statistics()
    assert st["total_calls"] == 5
    assert st["successful_calls"] == 3
    assert st["calls_per_function"] == {"search": 4, "nope": 1}
