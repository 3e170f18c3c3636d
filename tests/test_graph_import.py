"""S2: RDF/Turtle + GraphML import (data_import.rs:562-820 semantics)."""

import os

import pytest

from graphrag_ray.sources.importer import (
    extract_local_name,
    import_graph_files,
    parse_graphml,
    parse_rdf_turtle,
)

TURTLE = """
@prefix ex: <http://example.org/people/> .
@prefix rel: <http://example.org/rel/> .

ex:alice rel:knows ex:bob .
ex:alice <http://example.org/prop#label> "Alice Harmon" ;
         a ex:Person .
ex:bob rel:worksFor ex:acme , ex:initech .
ex:acme <http://example.org/prop#name> "Acme Corp" .
"""

GRAPHML = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <key id="d0" for="node" attr.name="name" attr.type="string"/>
  <key id="d1" for="node" attr.name="type" attr.type="string"/>
  <key id="d2" for="edge" attr.name="label" attr.type="string"/>
  <graph id="G" edgedefault="undirected">
    <node id="n1"><data key="d0">Alice</data><data key="d1">person</data></node>
    <node id="n2"><data key="d0">Acme</data></node>
    <node id="n3"/>
    <edge source="n1" target="n2"><data key="d2">works_for</data></edge>
    <edge source="n2" target="n3"/>
  </graph>
</graphml>
"""


def test_extract_local_name():
    # data_import.rs:678-685
    assert extract_local_name("<http://example.org/people/alice>") == "alice"
    assert extract_local_name("<http://example.org/prop#label>") == "label"
    assert extract_local_name("plain") == "plain"


def test_parse_rdf_turtle():
    ents, rels, errors = parse_rdf_turtle(TURTLE)
    assert not errors
    by_id = {e[0]: e for e in ents}
    # label attribute becomes the name (data_import.rs:643-649)
    assert by_id["alice"] == ("alice", "Alice Harmon", "Person")
    # 'a' shorthand sets the type; URI objects create entities on both ends
    assert by_id["bob"][2] == "resource"
    assert by_id["acme"] == ("acme", "Acme Corp", "resource")
    assert by_id["initech"][0] == "initech"
    assert ("alice", "bob", "knows") in rels
    # ',' object list → two worksFor relationships
    assert ("bob", "acme", "worksFor") in rels
    assert ("bob", "initech", "worksFor") in rels
    assert len(rels) == 3


def test_parse_graphml():
    ents, rels, errors = parse_graphml(GRAPHML)
    assert not errors
    by_id = {e[0]: e for e in ents}
    assert by_id["n1"] == ("n1", "Alice", "person")
    assert by_id["n2"] == ("n2", "Acme", "node")   # defaults (rs:793-803)
    assert by_id["n3"] == ("n3", "n3", "node")     # id fallback
    assert ("n1", "n2", "works_for") in rels
    assert ("n2", "n3", "related") in rels         # default relation


def test_parse_graphml_bad_xml():
    ents, rels, errors = parse_graphml("<graphml><unclosed>")
    assert ents == [] and rels == []
    assert errors and "parse error" in errors[0]


def test_import_graph_files_distributed(ray_session, tmp_path):
    p1 = tmp_path / "g.graphml"
    p1.write_text(GRAPHML)
    p2 = tmp_path / "t.ttl"
    p2.write_text(TURTLE)
    ds = import_graph_files([str(p1), str(p2)])
    rows = ds.take_all()
    kinds = {}
    for r in rows:
        kinds.setdefault(r["row_kind"], []).append(r)
    assert len(kinds["entity"]) == 3 + 4
    assert len(kinds["relationship"]) == 2 + 3
    assert "error" not in kinds
    # source_file lineage present on every row
    assert all(r["source_file"] for r in rows)
