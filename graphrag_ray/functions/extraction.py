"""Deterministic pattern-based entity + relationship extraction (per chunk).

Behavioral transcription of the reference's ``EntityExtractor``
(graphrag-core/src/entity/mod.rs:114-1108): four-phase PERSON heuristics,
ORG suffix/prefix scans, known-LOCATION list, the confidence formula
(:721-759), per-chunk (name,type) dedup with mention merge (:788-809), and
co-occurrence relationship typing (:812-879).

This is a pure function of chunk text → ideal for parity testing: the same
function drives both the distributed pipeline (inside ``map_batches``) and
the single-process oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

from .textfns import clean_word, is_capitalized, normalize_name

# word lists — entity/mod.rs:182-296
PERSON_TITLES = frozenset(
    "mr mrs ms dr prof professor sir lady lord captain major colonel general "
    "admiral judge father mother brother sister aunt uncle grandfather grandmother".split()
)

NON_PERSON_WORDS = frozenset(
    """chapter the and but or in on at to for with by from about into through
    during before after above below up down out off over under again further
    then once here there when where why how all any both each few more most
    other some such only own same so than too very can will just should now
    temptations strategic movements decides upon whitewashing saturday monday
    tuesday wednesday thursday friday sunday january february march april may
    june july august september october november december adventures complete""".split()
)

# entity/mod.rs:358-371 (test-fixture names kept for behavioral parity)
KNOWN_PERSON_NAMES = (
    "Entity Name", "Second Entity", "Guardian Entity", "Friend Entity",
    "Companion Entity", "Third Entity", "Fourth Entity", "Fifth Entity",
    "Sixth Entity", "Seventh Entity", "Eighth Entity", "Ninth Entity",
)

NAME_ENDINGS = ("son", "sen", "ton", "ham", "ford", "ley", "ment", "ard", "ert")
NAME_PREFIXES = ("mc", "mac", "o'", "de", "van", "von", "la", "le")
SHORT_NON_NAMES = frozenset(
    "it is as at be by do go he if in me my no of on or so to up us we".split()
)

ORG_SUFFIXES = (
    "Inc", "Corp", "LLC", "Ltd", "Company", "Corporation", "Group",
    "Solutions", "Technologies",
)
ORG_PREFIXES = ("University of", "Institute of", "Department of")
ORG_INDICATORS = (
    "Inc", "Corp", "LLC", "Ltd", "Company", "Corporation", "University", "Institute",
)

KNOWN_LOCATIONS = (
    "United States", "New York", "California", "London", "Paris", "Tokyo",
    "Berlin", "Washington", "Boston", "Chicago",
)

EVENT_WORDS = (
    "meeting", "conference", "ceremony", "celebration", "festival",
    "competition", "war", "battle", "expedition", "journey", "trial",
)
OBJECT_WORDS = (
    "sword", "shield", "book", "manuscript", "scroll", "tablet", "ring",
    "crown", "treasure", "coin", "tool", "weapon",
)
CONCEPT_INDICATORS = (
    "Theory", "Concept", "Principle", "Philosophy", "Doctrine", "Idea",
    "Method", "Approach", "Framework", "Model", "Paradigm", "Thesis",
)
COMMON_WORDS = frozenset(
    w.lower()
    for w in """the and but or in on at to for with by from about into through
    during before after above below up down out off over under again further
    then once here there when where why how all any both each few more most
    other some such only own same so than too very can will just should now
    could would said says told asked went came come going chapter page
    section part book volume""".split()
)


@dataclass
class ExtractedEntity:
    """One entity occurrence set within a chunk.

    ``n_mentions`` is always populated; ``mentions`` offsets are only
    materialized when extraction runs ``with_offsets=True`` (the hot KG
    path counts occurrences with C-level ``str.count`` instead of the
    find-loop — same non-overlapping semantics, entity/mod.rs:613-625)."""

    entity_id: str
    name: str
    entity_type: str
    confidence: float
    n_mentions: int = 0
    mentions: list[tuple[int, int]] = field(default_factory=list)  # (start, end)


@lru_cache(maxsize=131072)
def _is_likely_person_word(word: str) -> bool:
    """entity/mod.rs:648-689. Cached (hot loop, small vocabulary)."""
    if len(word) < 2:
        return False
    lower = word.lower()
    if len(word) <= 2 and lower in SHORT_NON_NAMES:
        return False
    proper = word[0].isupper() and all(c.isalpha() or c == "'" for c in word)
    if not proper:
        return False
    return (
        len(word) >= 3
        or lower.endswith(NAME_ENDINGS)
        or lower.startswith(NAME_PREFIXES)
    )


def _is_likely_person_name(name: str) -> bool:
    """entity/mod.rs:698-701: exactly two capitalized parts."""
    parts = name.split()
    return (len(parts) == 2 and parts[0][0].isupper()
            and parts[1][0].isupper())


def _is_likely_organization(name: str) -> bool:
    """entity/mod.rs:704-718."""
    return any(ind in name for ind in ORG_INDICATORS)


@lru_cache(maxsize=131072)
def calculate_confidence(name: str, entity_type: str) -> float:
    """entity/mod.rs:721-759. Cached — pure function of (name, type) and
    entity names repeat heavily under any Zipf-ish corpus."""
    confidence = 0.5
    if entity_type == "PERSON":
        if "Dr." in name or "Prof." in name:
            confidence += 0.3
        if len(name.split()) == 2:
            confidence += 0.2
    elif entity_type == "ORGANIZATION":
        if "Inc" in name or "Corp" in name or "LLC" in name:
            confidence += 0.3
        if "University" in name or "Institute" in name:
            confidence += 0.2
    elif entity_type == "LOCATION":
        if "," in name:
            confidence += 0.2
        if any(loc in name for loc in KNOWN_LOCATIONS):
            confidence += 0.3
    if name and name[0].isupper():
        confidence += 0.1
    return min(confidence, 1.0)


def _find_mentions(text: str, name: str) -> list[tuple[int, int]]:
    """Successive non-overlapping occurrences (entity/mod.rs:613-625)."""
    mentions = []
    start = 0
    while True:
        pos = text.find(name, start)
        if pos == -1:
            break
        mentions.append((pos, pos + len(name)))
        start = pos + len(name)
    return mentions


@lru_cache(maxsize=131072)
def _entity_id(name: str, entity_type: str) -> str:
    return f"{entity_type}_{normalize_name(name)}"


def _make_entity(name: str, entity_type: str, confidence: float, text: str,
                 with_offsets: bool = True) -> ExtractedEntity:
    """entity/mod.rs:602-631."""
    if with_offsets:
        mentions = _find_mentions(text, name)
        return ExtractedEntity(
            entity_id=_entity_id(name, entity_type),
            name=name,
            entity_type=entity_type,
            confidence=confidence,
            n_mentions=len(mentions),
            mentions=mentions,
        )
    return ExtractedEntity(
        entity_id=_entity_id(name, entity_type),
        name=name,
        entity_type=entity_type,
        confidence=confidence,
        n_mentions=text.count(name),
    )


_KNOWN_LOWER = tuple(tuple(w.lower() for w in n.split()) for n in KNOWN_PERSON_NAMES)
_KNOWN_FIRST = frozenset(w[0] for w in _KNOWN_LOWER)

# per-RAW-token attribute cache: one dict hit replaces clean_word +
# .lower() + isupper + _is_likely_person_word + three set-membership
# checks per token in the hottest loop of the pipeline. Capacity-bounded
# for open web vocabularies (Zipf heads saturate far below the cap; misses
# past the cap just recompute).
_WATTRS: dict[str, tuple] = {}
_WATTRS_CAP = 1 << 20


def _word_attrs(w: str) -> tuple:
    """(cleaned, lower, raw_cap, person_word, is_title, non_person,
    known_first, cleaned_cap) for a whitespace token ``w``."""
    c = clean_word(w)
    lo = c.lower()
    a = (
        c,
        lo,
        bool(w) and w[0].isupper(),
        _is_likely_person_word(c),
        lo in PERSON_TITLES,
        lo in NON_PERSON_WORDS,
        lo in _KNOWN_FIRST,
        bool(c) and c[0].isupper(),
    )
    if len(_WATTRS) < _WATTRS_CAP:
        _WATTRS[w] = a
    return a


def _extract_persons(text: str, min_confidence: float, with_offsets: bool = True) -> list[ExtractedEntity]:
    """Four-phase PERSON extraction (entity/mod.rs:176-499).

    Per-token attributes (cleaned form, capitalization, class-membership
    flags) come from the corpus-wide ``_WATTRS`` cache — semantics
    identical to the reference's per-phase recomputation."""
    out: list[ExtractedEntity] = []
    words = text.split()
    n = len(words)
    wa = _WATTRS
    attrs = [wa.get(w) or _word_attrs(w) for w in words]
    processed: set[int] = set()

    # PHASE 1 — known fixture names (entity/mod.rs:349-407)
    for i in range(n):
        if i in processed or not attrs[i][6]:
            continue
        for name, name_lower in zip(KNOWN_PERSON_NAMES, _KNOWN_LOWER):
            k = len(name_lower)
            if i + k <= n and all(attrs[i + j][1] == name_lower[j] for j in range(k)):
                if 0.95 >= min_confidence:
                    out.append(_make_entity(name, "PERSON", 0.95, text, with_offsets))
                processed.update(range(i, i + k))
                break

    # PHASE 2 — title-based names (entity/mod.rs:409-457)
    for i in range(n):
        if i in processed:
            continue
        if attrs[i][4] and i + 1 < n and (i + 1) not in processed:
            a1 = attrs[i + 1]
            if a1[2] and a1[3]:
                name = a1[0]
                if i + 2 < n and (i + 2) not in processed:
                    a2 = attrs[i + 2]
                    if a2[2] and a2[3]:
                        processed.add(i + 2)
                        name = f"{a1[0]} {a2[0]}"
                if 0.9 >= min_confidence:
                    out.append(_make_entity(name, "PERSON", 0.9, text, with_offsets))
                processed.add(i)
                processed.add(i + 1)

    # PHASE 3 — two-word First Last (entity/mod.rs:459-499)
    for i in range(n - 1):
        if i in processed or (i + 1) in processed:
            continue
        a0 = attrs[i]
        a1 = attrs[i + 1]
        if a0[2] and a1[2] and a0[3] and a1[3] and not a0[5] and not a1[5]:
            # cleaned words carry no spaces, so the reference's
            # _is_likely_person_name(join) == both cleaned parts nonempty
            # and capitalized
            if a0[7] and a1[7]:
                name = f"{a0[0]} {a1[0]}"
                confidence = calculate_confidence(name, "PERSON")
                if confidence >= min_confidence:
                    out.append(_make_entity(name, "PERSON", confidence, text, with_offsets))
                processed.add(i)
                processed.add(i + 1)

    # PHASE 4 — remaining single capitalized words (entity/mod.rs:325-344)
    for i in range(n):
        if i in processed:
            continue
        a = attrs[i]
        word = a[0]
        if len(word) < 2 or a[5]:
            continue
        if a[2] and a[3]:
            confidence = calculate_confidence(word, "PERSON")
            if confidence >= min_confidence:
                out.append(_make_entity(word, "PERSON", confidence, text, with_offsets))
    return out


def _extract_organizations(text: str, min_confidence: float, with_offsets: bool = True) -> list[ExtractedEntity]:
    """ORG suffix/prefix scan — note: only the FIRST occurrence of each
    suffix/prefix is considered (entity/mod.rs:501-566 uses ``text.find``)."""
    out: list[ExtractedEntity] = []
    for suffix in ORG_SUFFIXES:
        pos = text.find(suffix)
        if pos != -1:
            sp = text.rfind(" ", 0, pos)
            start = sp + 1 if sp != -1 else 0
            name = text[start: pos + len(suffix)].strip()
            if name and _is_likely_organization(name):
                confidence = calculate_confidence(name, "ORGANIZATION")
                if confidence >= min_confidence:
                    out.append(_make_entity(name, "ORGANIZATION", confidence, text, with_offsets))
    for prefix in ORG_PREFIXES:
        pos = text.find(prefix)
        if pos != -1:
            dot = text.find(".", pos)
            end = dot if dot != -1 else min(len(text), pos + 50)
            name = text[pos:end].strip()
            if name and len(name) > len(prefix):
                confidence = calculate_confidence(name, "ORGANIZATION")
                if confidence >= min_confidence:
                    out.append(_make_entity(name, "ORGANIZATION", confidence, text, with_offsets))
    return out


def _extract_locations(text: str, min_confidence: float, with_offsets: bool = True) -> list[ExtractedEntity]:
    """Known-location containment scan (entity/mod.rs:569-600)."""
    out = []
    for location in KNOWN_LOCATIONS:
        if location in text:
            confidence = calculate_confidence(location, "LOCATION")
            if confidence >= min_confidence:
                out.append(_make_entity(location, "LOCATION", confidence, text, with_offsets))
    return out


def _extract_events(text: str, min_confidence: float, with_offsets: bool = True) -> list[ExtractedEntity]:
    """entity/mod.rs:985-1019."""
    lowered = text.lower()
    return [
        _make_entity(w, "EVENT", 0.7, text, with_offsets)
        for w in EVENT_WORDS
        if w in lowered and 0.7 >= min_confidence
    ]


def _extract_objects(text: str, min_confidence: float, with_offsets: bool = True) -> list[ExtractedEntity]:
    """entity/mod.rs:1022-1057."""
    lowered = text.lower()
    return [
        _make_entity(w, "OBJECT", 0.65, text, with_offsets)
        for w in OBJECT_WORDS
        if w in lowered and 0.65 >= min_confidence
    ]


def _extract_concepts(text: str, min_confidence: float, entity_type: str, with_offsets: bool = True) -> list[ExtractedEntity]:
    """entity/mod.rs:917-982."""
    out = []
    for raw in text.split():
        cw = clean_word(raw)
        if any(ind in cw for ind in CONCEPT_INDICATORS) and 0.75 >= min_confidence:
            out.append(_make_entity(cw, entity_type, 0.75, text, with_offsets))
        if is_capitalized(raw) and len(raw) > 4:
            cw2 = clean_word(raw)
            if cw2.lower() not in COMMON_WORDS and 0.6 >= min_confidence:
                out.append(_make_entity(cw2, entity_type, 0.6, text, with_offsets))
    return out


def _extract_generic(text: str, min_confidence: float, entity_type: str,
                     with_offsets: bool = True) -> list[ExtractedEntity]:
    """Generic extraction for unrecognized entity types
    (entity/mod.rs:1060-1089): capitalized words longer than 3 chars that
    aren't common words, flat confidence 0.5."""
    out = []
    if 0.5 < min_confidence:
        return out
    for raw in text.split():
        if is_capitalized(raw) and len(raw) > 3:
            cw = clean_word(raw)
            if cw.lower() not in COMMON_WORDS:
                out.append(_make_entity(cw, entity_type, 0.5, text, with_offsets))
    return out


_CONCEPT_TYPES = frozenset(
    {"CONCEPT", "THEORY", "THEME", "ARGUMENT", "IDEA"})

_TYPE_DISPATCH = {
    # entity/mod.rs:138-160 type-alias arms
    "PERSON": _extract_persons, "CHARACTER": _extract_persons,
    "RESEARCHER": _extract_persons, "SPEAKER": _extract_persons,
    "DIALOGUE_SPEAKER": _extract_persons,
    "ORGANIZATION": _extract_organizations, "INSTITUTION": _extract_organizations,
    "BRAND": _extract_organizations, "COMPANY": _extract_organizations,
    "LOCATION": _extract_locations, "SETTING": _extract_locations,
    "PLACE": _extract_locations,
    "EVENT": _extract_events, "EXPERIMENT": _extract_events,
    "HAPPENING": _extract_events,
    "OBJECT": _extract_objects, "TOOL": _extract_objects,
    "ARTIFACT": _extract_objects, "ITEM": _extract_objects,
}


def apply_pattern_filtering(
    entities: list[ExtractedEntity],
    allowed_patterns: tuple[str, ...] = (),
    excluded_patterns: tuple[str, ...] = (),
) -> list[ExtractedEntity]:
    """M8 allow/deny regex filtering on entity names
    (entity/mod.rs:882-915): with allow-patterns present an entity must
    match at least one; any excluded-pattern match drops it."""
    import re

    if not allowed_patterns and not excluded_patterns:
        return entities
    allow = [re.compile(p) for p in allowed_patterns]
    deny = [re.compile(p) for p in excluded_patterns]
    out = []
    for e in entities:
        if allow and not any(p.search(e.name) for p in allow):
            continue
        if deny and any(p.search(e.name) for p in deny):
            continue
        out.append(e)
    return out


def quality_filter(entities: list[ExtractedEntity],
                   min_confidence: float = 0.3,
                   min_name_len: int = 2) -> list[ExtractedEntity]:
    """M7 corpus-level quality gate (corpus/collection_processor.rs:293-306):
    drop entities below the confidence floor or with names shorter than 2."""
    return [e for e in entities
            if e.confidence >= min_confidence and len(e.name) >= min_name_len]


def extract_entities(
    text: str,
    min_confidence: float = 0.7,
    entity_types: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION"),
    with_offsets: bool = True,
    allowed_patterns: tuple[str, ...] = (),
    excluded_patterns: tuple[str, ...] = (),
) -> list[ExtractedEntity]:
    """Per-chunk extraction pipeline (entity/mod.rs:114-173):
    type dispatch → per-chunk (name,type) dedup (merge mentions, max
    confidence, first-seen order) → confidence filter."""
    entities: list[ExtractedEntity] = []
    for etype in entity_types:
        fn = _TYPE_DISPATCH.get(etype)
        if fn is not None:
            entities.extend(fn(text, min_confidence, with_offsets))
        elif etype in _CONCEPT_TYPES:
            entities.extend(_extract_concepts(text, min_confidence, etype, with_offsets))
        else:
            # any other type: generic capitalized-word extraction
            # (entity/mod.rs:156-159 fallthrough arm)
            entities.extend(_extract_generic(text, min_confidence, etype, with_offsets))

    entities = apply_pattern_filtering(entities, allowed_patterns, excluded_patterns)

    # dedup by (name, type), merging mentions and keeping max confidence
    # (entity/mod.rs:788-809); Python dict preserves first-seen order, which
    # pins the otherwise-unspecified Rust HashMap iteration order.
    unique: dict[tuple[str, str], ExtractedEntity] = {}
    for ent in entities:
        key = (ent.name, ent.entity_type)
        existing = unique.get(key)
        if existing is None:
            unique[key] = ent
        else:
            existing.mentions.extend(ent.mentions)
            existing.n_mentions += ent.n_mentions
            if ent.confidence > existing.confidence:
                existing.confidence = ent.confidence
    return [e for e in unique.values() if e.confidence >= min_confidence]


# relationship-type inference matrix (entity/mod.rs:841-879)
def infer_relationship_type(type1: str, type2: str, context: str) -> str:
    pair = (type1, type2)
    if pair in (("PERSON", "ORGANIZATION"), ("ORGANIZATION", "PERSON")):
        if "works for" in context or "employed by" in context:
            return "WORKS_FOR"
        if "founded" in context or "CEO" in context:
            return "LEADS"
        return "ASSOCIATED_WITH"
    if pair in (("PERSON", "LOCATION"), ("LOCATION", "PERSON")):
        if "born in" in context or "from" in context:
            return "BORN_IN"
        if "lives in" in context or "based in" in context:
            return "LOCATED_IN"
        return "ASSOCIATED_WITH"
    if pair in (("ORGANIZATION", "LOCATION"), ("LOCATION", "ORGANIZATION")):
        if "headquartered" in context or "based in" in context:
            return "HEADQUARTERED_IN"
        return "LOCATED_IN"
    if pair == ("PERSON", "PERSON"):
        if "married" in context or "spouse" in context:
            return "MARRIED_TO"
        if "colleague" in context or "partner" in context:
            return "COLLEAGUE_OF"
        return "KNOWS"
    return "RELATED_TO"


_CONTEXT_KEYWORDS = (
    "works for", "employed by", "founded", "CEO", "born in", "from",
    "lives in", "based in", "headquartered", "married", "spouse",
    "colleague", "partner",
)


def _pair_rel_table(text: str) -> dict[tuple[str, str], str]:
    """Precompute the relation type per (type, type) pair for one chunk.

    The reference re-scans the chunk text per entity pair
    (entity/mod.rs:812-879); the keyword hits depend only on the chunk, so
    we scan once and type all pairs via lookup — identical output."""
    has = {kw: kw in text for kw in _CONTEXT_KEYWORDS}
    po = ("WORKS_FOR" if has["works for"] or has["employed by"]
          else "LEADS" if has["founded"] or has["CEO"]
          else "ASSOCIATED_WITH")
    pl = ("BORN_IN" if has["born in"] or has["from"]
          else "LOCATED_IN" if has["lives in"] or has["based in"]
          else "ASSOCIATED_WITH")
    ol = ("HEADQUARTERED_IN" if has["headquartered"] or has["based in"]
          else "LOCATED_IN")
    pp = ("MARRIED_TO" if has["married"] or has["spouse"]
          else "COLLEAGUE_OF" if has["colleague"] or has["partner"]
          else "KNOWS")
    return {
        ("PERSON", "ORGANIZATION"): po, ("ORGANIZATION", "PERSON"): po,
        ("PERSON", "LOCATION"): pl, ("LOCATION", "PERSON"): pl,
        ("ORGANIZATION", "LOCATION"): ol, ("LOCATION", "ORGANIZATION"): ol,
        ("PERSON", "PERSON"): pp,
    }


def extract_relationships(
    entities: list[ExtractedEntity], text: str
) -> list[tuple[str, str, str]]:
    """All co-occurring pairs (i<j) in this chunk, typed by context keywords
    (entity/mod.rs:812-879). Entity order is this engine's deterministic
    extraction order; the reference's order is petgraph insertion order,
    which only affects (source, target) orientation, not the pair set."""
    table = _pair_rel_table(text)
    rels = []
    for i in range(len(entities)):
        e1 = entities[i]
        for j in range(i + 1, len(entities)):
            e2 = entities[j]
            rel = table.get((e1.entity_type, e2.entity_type), "RELATED_TO")
            rels.append((e1.entity_id, e2.entity_id, rel))
    return rels
