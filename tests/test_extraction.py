"""Pattern extractor semantics tests (reference: entity/mod.rs:114-1108,
inline tests at entity/mod.rs:1110-1154)."""

from graphrag_ray.functions.extraction import (
    calculate_confidence,
    extract_entities,
    extract_relationships,
    infer_relationship_type,
)


def names_of(ents, etype=None):
    return [e.name for e in ents if etype is None or e.entity_type == etype]


def test_two_word_person():
    ents = extract_entities("Alice Harmon went home.", 0.7)
    assert "Alice Harmon" in names_of(ents, "PERSON")
    e = next(e for e in ents if e.name == "Alice Harmon")
    assert e.entity_id == "PERSON_aliceharmon"
    assert abs(e.confidence - 0.8) < 1e-6  # 0.5 + 0.2 (two words) + 0.1 (cap)


def test_title_based_person():
    ents = extract_entities("We met Dr. Vasquez at noon.", 0.7)
    assert "Vasquez" in names_of(ents, "PERSON")
    e = next(e for e in ents if e.name == "Vasquez")
    assert abs(e.confidence - 0.9) < 1e-6


def test_title_two_word_person():
    ents = extract_entities("Prof. Elena Vasquez spoke.", 0.7)
    assert "Elena Vasquez" in names_of(ents, "PERSON")


def test_single_word_filtered_at_default_confidence():
    # single capitalized word → 0.6 < 0.7 → dropped (entity/mod.rs:325-344)
    ents = extract_entities("Then Gandalf vanished quietly.", 0.7)
    assert "Gandalf" not in names_of(ents)
    # at lower threshold it appears
    ents2 = extract_entities("Then Gandalf vanished quietly.", 0.5)
    assert "Gandalf" in names_of(ents2, "PERSON")


def test_known_fixture_names():
    ents = extract_entities("The Guardian Entity appeared.", 0.7)
    assert "Guardian Entity" in names_of(ents, "PERSON")


def test_org_suffix_extracts_suffix_token_only():
    # reference quirk: rfind(' ') before the suffix lands ON the separating
    # space, so only the suffix token is captured (entity/mod.rs:517-538)
    ents = extract_entities("She joined Acme Corp yesterday.", 0.7)
    orgs = names_of(ents, "ORGANIZATION")
    assert "Corp" in orgs
    assert "Acme Corp" not in orgs
    # and "Acme Corp" is ALSO a two-word PERSON candidate (parity quirk)
    assert "Acme Corp" in names_of(ents, "PERSON")


def test_org_prefix():
    ents = extract_entities("The University of Westfield opened.", 0.7)
    assert "University of Westfield opened" in names_of(ents, "ORGANIZATION")
    # with a sentence end, the name stops at the dot
    ents2 = extract_entities("The University of Westfield. Next.", 0.7)
    assert "University of Westfield" in names_of(ents2, "ORGANIZATION")


def test_department_of_filtered_at_default():
    # "Department of X" scores 0.5+0.1=0.6 < 0.7 (no University/Institute
    # indicator in calculate_confidence) — entity/mod.rs:734-741
    ents = extract_entities("The Department of Magic ruled.", 0.7)
    assert not any("Department" in n for n in names_of(ents, "ORGANIZATION"))


def test_known_locations():
    ents = extract_entities("They flew from New York to Tokyo.", 0.7)
    locs = names_of(ents, "LOCATION")
    assert "New York" in locs and "Tokyo" in locs
    e = next(e for e in ents if e.name == "Tokyo" and e.entity_type == "LOCATION")
    assert abs(e.confidence - 0.9) < 1e-6


def test_mentions_and_dedup():
    text = "Alice Harmon met Bob Tanner. Alice Harmon smiled."
    ents = extract_entities(text, 0.7)
    alice = [e for e in ents if e.name == "Alice Harmon"]
    assert len(alice) == 1  # deduped per chunk
    # reference quirk: PHASE 3 fires once per occurrence and create_entity
    # re-finds ALL occurrences each time; dedup then concatenates the
    # mention lists (entity/mod.rs:613-625 + :788-809) → 2 × 2 mentions
    assert len(alice[0].mentions) == 4
    assert alice[0].mentions[0] == (0, len("Alice Harmon"))


def test_confidence_formula():
    assert abs(calculate_confidence("Alice Harmon", "PERSON") - 0.8) < 1e-6
    # 0.5 + 0.3 (Dr.) + 0.2 (two words) + 0.1 (cap) → capped at 1.0
    assert abs(calculate_confidence("Dr. Smith", "PERSON") - 1.0) < 1e-6
    assert abs(calculate_confidence("Acme Inc", "ORGANIZATION") - 0.9) < 1e-6
    assert abs(calculate_confidence("University of X", "ORGANIZATION") - 0.8) < 1e-6
    assert abs(calculate_confidence("New York", "LOCATION") - 0.9) < 1e-6
    assert calculate_confidence("lowercase", "PERSON") == 0.5


def test_relationship_type_matrix():
    assert infer_relationship_type("PERSON", "ORGANIZATION", "she works for them") == "WORKS_FOR"
    assert infer_relationship_type("PERSON", "ORGANIZATION", "he founded it") == "LEADS"
    assert infer_relationship_type("PERSON", "ORGANIZATION", "nothing") == "ASSOCIATED_WITH"
    assert infer_relationship_type("PERSON", "LOCATION", "born in x") == "BORN_IN"
    # "from" substring also triggers BORN_IN (reference contains() check)
    assert infer_relationship_type("PERSON", "LOCATION", "he came from afar") == "BORN_IN"
    assert infer_relationship_type("PERSON", "LOCATION", "lives in x") == "LOCATED_IN"
    assert infer_relationship_type("ORGANIZATION", "LOCATION", "headquartered here") == "HEADQUARTERED_IN"
    assert infer_relationship_type("ORGANIZATION", "LOCATION", "zzz") == "LOCATED_IN"
    assert infer_relationship_type("PERSON", "PERSON", "they married") == "MARRIED_TO"
    assert infer_relationship_type("PERSON", "PERSON", "colleague of") == "COLLEAGUE_OF"
    assert infer_relationship_type("PERSON", "PERSON", "met") == "KNOWS"
    assert infer_relationship_type("EVENT", "OBJECT", "x") == "RELATED_TO"


def test_relationships_all_pairs():
    text = "Alice Harmon works for Acme Corp in Tokyo."
    ents = extract_entities(text, 0.7)
    rels = extract_relationships(ents, text)
    n = len(ents)
    assert len(rels) == n * (n - 1) // 2
    triples = {(s, d, r) for s, d, r in rels}
    assert ("PERSON_aliceharmon", "ORGANIZATION_corp", "WORKS_FOR") in triples


def test_pattern_filtering():
    from graphrag_ray.functions.extraction import extract_entities

    text = "Alice Harmon met Bob Tanner in Tokyo."
    # deny: drop names containing 'Tanner'
    ents = extract_entities(text, 0.7, excluded_patterns=("Tanner",))
    names = {e.name for e in ents}
    assert "Alice Harmon" in names and "Bob Tanner" not in names
    # allow: only names matching 'Harmon'
    ents2 = extract_entities(text, 0.7, allowed_patterns=("Harmon",))
    assert {e.name for e in ents2} == {"Alice Harmon"}


def test_quality_filter():
    from graphrag_ray.functions.extraction import ExtractedEntity, quality_filter

    ents = [
        ExtractedEntity("P_ok", "Ok Name", "PERSON", 0.8, 1),
        ExtractedEntity("P_low", "Low", "PERSON", 0.2, 1),
        ExtractedEntity("P_tiny", "X", "PERSON", 0.9, 1),
    ]
    out = quality_filter(ents)
    assert [e.entity_id for e in out] == ["P_ok"]
