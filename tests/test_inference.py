"""Implicit relationship inference tests (inference.rs)."""

import pytest

from graphrag_ray.stages.inference import (entities_near_pattern,
                                           evidence_score,
                                           extract_entity_name,
                                           infer_relationships,
                                           proximity_score)


def test_extract_entity_name_quirk():
    # text after the FIRST underscore, underscores → spaces
    assert extract_entity_name("PERSON_aliceharmon") == "aliceharmon"
    assert extract_entity_name("TYPE_alice_harmon") == "alice harmon"
    assert extract_entity_name("plain") == "plain"


def test_proximity_buckets():
    c = "corp is near tokyo now"
    assert proximity_score(c, "corp", "tokyo") == 0.3   # distance 3
    assert proximity_score("corp tokyo", "corp", "tokyo") == 0.4
    # multi-word-derived names never match a single word → 0
    assert proximity_score(c, "aliceharmon", "tokyo") == 0.0


def test_entities_near_pattern_window():
    content = "corp and tokyo are partner cities"
    assert entities_near_pattern(content, "corp", "tokyo", "partner")
    far = "corp " + "x" * 150 + " partner " + "y" * 150 + " tokyo"
    assert not entities_near_pattern(far, "corp", "tokyo", "partner")


def test_evidence_score_components():
    # base 0.2 + proximity 0.4 + 'partner' near both (0.5*0.5)
    s = evidence_score("corp tokyo partner", "ORGANIZATION_corp",
                       "LOCATION_tokyo")
    assert s == pytest.approx(0.2 + 0.4 + 0.25)
    # negative pattern pulls down; family damps ×0.8
    s2 = evidence_score("corp tokyo enemy", "ORGANIZATION_corp",
                        "LOCATION_tokyo")
    assert s2 == pytest.approx(max(0.2 + 0.4 - 0.8 * 1.2, 0.0))
    s3 = evidence_score("corp tokyo brother", "ORGANIZATION_corp",
                        "LOCATION_tokyo")
    assert s3 == pytest.approx((0.2 + 0.4) * 0.8)


def test_infer_relationships_normalization_and_threshold():
    chunk_entities = [("c1", ["T_corp", "T_tokyo"]),
                      ("c2", ["T_corp", "T_tokyo"]),
                      ("c3", ["T_corp", "T_berlin"])]
    contents = {"c1": "corp tokyo", "c2": "corp tokyo",
                "c3": "corp plus berlin far away indeed it is here now"}
    out = infer_relationships("T_corp", "REL", chunk_entities, contents)
    # tokyo: 2×0.6 / 3 chunks = 0.4 ≥ 0.3 kept; berlin below
    assert [r["target"] for r in out] == ["T_tokyo"]
    assert out[0]["confidence"] == pytest.approx(0.4)
    assert out[0]["evidence_count"] == 3
    # low threshold admits berlin too, ordered by confidence
    out2 = infer_relationships("T_corp", "REL", chunk_entities, contents,
                               min_confidence=0.05)
    assert [r["target"] for r in out2] == ["T_tokyo", "T_berlin"]
    # missing target → empty
    assert infer_relationships("T_nope", "REL", chunk_entities,
                               contents) == []
