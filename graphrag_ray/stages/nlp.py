"""Rule-based NLP: POS tagging, dependencies, noun phrases, custom NER
(reference graphrag-core/src/nlp/{syntax_analyzer,custom_ner}.rs).

Dictionary POS tagger with suffix-pattern fallbacks and the reference's
dictionary-precedence quirks (determiners beat pronouns for "what"/
"which"/"this"/"that", verbs beat nouns for "work", conjunctions beat
adverbs for "so"), a first-match dependency heuristic, DET/ADJ/NOUN-run
noun-phrase chunking, and a rule-based NER with seven rule kinds and the
greedy position/confidence overlap resolution.

All rules are pure functions over text; the surfaces run them inside one
`map_batches` pass over the corpus sentences.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# POS dictionaries (syntax_analyzer.rs:521-662) — lookup precedence:
# determiners, pronouns, prepositions, conjunctions, adverbs, verbs,
# adjectives, nouns (tag_word, rs:245-321)

POS_DICTS: tuple[tuple[str, frozenset[str]], ...] = (
    ("determiner", frozenset(
        "the a an this that these those my your his her its our their all "
        "both each every some any no another such what which".split())),
    ("pronoun", frozenset(
        "i you he she it we they me him her us them who whom what which "
        "this that".split())),
    ("preposition", frozenset(
        "of in to for with on at from by about into through during before "
        "after above below between under since without within along among "
        "across".split())),
    ("conjunction", frozenset(
        "and or but nor yet so for because although though while if unless "
        "until when where".split())),
    ("adverb", frozenset(
        "not so out up now only just more also very well back there even "
        "still too here then always never often quite really almost "
        "again".split())),
    ("verb", frozenset(
        "be have do say get make go know take see come think look want "
        "give use find tell ask work seem feel try leave call".split())),
    ("adjective", frozenset(
        "good new first last long great little own other old right big "
        "high different small large next early young important few public "
        "bad same able".split())),
    ("noun", frozenset(
        "time person year way day thing man world life hand part child eye "
        "woman place work week case point government company number group "
        "problem fact".split())),
)

_PUNCT = set(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")


def tokenize(text: str) -> list[tuple[str, int]]:
    """syntax_analyzer.rs:194-222 — alnum/'/- word runs plus single-char
    punctuation tokens with char positions."""
    tokens = []
    cur = []
    start = 0
    for i, ch in enumerate(text):
        if ch.isalnum() or ch in "'-":
            if not cur:
                start = i
            cur.append(ch)
        else:
            if cur:
                tokens.append(("".join(cur), start))
                cur = []
            if not ch.isspace():
                tokens.append((ch, i))
    if cur:
        tokens.append(("".join(cur), start))
    return tokens


def tag_word(word: str) -> str:
    """syntax_analyzer.rs:245-321."""
    lower = word.lower()
    if all(c in _PUNCT for c in word):
        return "punctuation"
    if word.isascii() and word.isdigit():
        return "number"
    for tag, words in POS_DICTS:
        if lower in words:
            return tag
    if word[0].isupper():
        return "proper_noun"
    if lower.endswith("ing"):
        return "verb_gerund"
    if lower.endswith("ed"):
        return "verb_past"
    if lower.endswith("s") and not lower.endswith("ss"):
        return "noun_plural"
    if lower.endswith(("ive", "ous", "ful")):
        return "adjective"
    if lower.endswith("ly"):
        return "adverb"
    return "noun"


def lemmatize(word: str, pos: str) -> str:
    """syntax_analyzer.rs:323-356."""
    lower = word.lower()
    if pos == "noun_plural":
        if lower.endswith("ies"):
            return lower[:-3] + "y"
        if lower.endswith("s") and not lower.endswith("ss"):
            return lower[:-1]
        return lower
    if pos in ("verb_past", "verb_3rd_sing"):
        if lower.endswith("ed"):
            return lower[:-2]
        if lower.endswith("s"):
            return lower[:-1]
        return lower
    if pos == "verb_gerund":
        if lower.endswith("ing"):
            return lower[:-3]
        return lower
    return lower


def pos_tag(text: str) -> list[dict]:
    out = []
    for word, position in tokenize(text):
        pos = tag_word(word)
        out.append({"text": word, "position": position, "pos": pos,
                    "lemma": lemmatize(word, pos)})
    return out


_VERBISH = ("verb", "verb_past", "verb_3rd_sing")
_SUBJ = ("noun", "proper_noun", "pronoun")
_OBJ = ("noun", "proper_noun")
_NOUNISH = ("noun", "proper_noun", "noun_plural", "proper_noun_plural")


def parse_dependencies(tokens: list[dict]) -> list[dict]:
    """syntax_analyzer.rs:359-448 — first-verb root, first noun before /
    after as subject / object, adjective→next-noun, adverb→first-verb and
    determiner→next-noun modifiers."""
    deps: list[dict] = []
    if not tokens:
        return deps
    root = next((i for i, t in enumerate(tokens) if t["pos"] in _VERBISH),
                0)
    for i in range(root):
        if tokens[i]["pos"] in _SUBJ:
            deps.append({"head": root, "dependent": i,
                         "relation": "subject"})
            break
    for i in range(root + 1, len(tokens)):
        if tokens[i]["pos"] in _OBJ:
            deps.append({"head": root, "dependent": i,
                         "relation": "direct_object"})
            break
    first_verb = next((i for i, t in enumerate(tokens)
                       if t["pos"] in _VERBISH), None)
    for i, t in enumerate(tokens):
        if t["pos"] == "adjective":
            nxt = next((j for j in range(i + 1, len(tokens))
                        if tokens[j]["pos"] in _OBJ), None)
            if nxt is not None:
                deps.append({"head": nxt, "dependent": i,
                             "relation": "modifier"})
        elif t["pos"] == "adverb":
            if first_verb is not None:
                deps.append({"head": first_verb, "dependent": i,
                             "relation": "modifier"})
        elif t["pos"] == "determiner":
            nxt = next((j for j in range(i + 1, len(tokens))
                        if tokens[j]["pos"] in _OBJ), None)
            if nxt is not None:
                deps.append({"head": nxt, "dependent": i,
                             "relation": "determiner"})
    return deps


def extract_noun_phrases(tokens: list[dict]) -> list[dict]:
    """syntax_analyzer.rs:451-509 — DET/ADJ continue a phrase, noun-ish
    tokens set the head, anything else closes it."""
    phrases = []
    cur: list[str] = []
    head = 0
    for t in tokens:
        if t["pos"] in ("determiner", "adjective"):
            cur.append(t["text"])
        elif t["pos"] in _NOUNISH:
            head = len(cur)
            cur.append(t["text"])
        else:
            if cur:
                phrases.append({"text": " ".join(cur), "head_idx": head})
                cur = []
                head = 0
    if cur:
        phrases.append({"text": " ".join(cur), "head_idx": head})
    return phrases


def segment_sentences(text: str) -> list[str]:
    """syntax_analyzer.rs:511-519 — split on terminal-punctuation runs
    followed by whitespace."""
    return [s for s in
            (p.strip() for p in re.split(r"[.!?]+\s+", text)) if s]


# ---------------------------------------------------------------------------
# custom NER (custom_ner.rs:104-390)


def _word_offsets(text: str) -> list[tuple[str, int]]:
    """custom_ner.rs word-position accounting: cumulative len+1 (assumes
    single spaces — a faithful reference quirk)."""
    out = []
    pos = 0
    for word in text.split():
        out.append((word, pos))
        pos += len(word) + 1
    return out


def ner_extract(text: str, rules: list[dict],
                dictionaries: dict[str, list[str]] | None = None
                ) -> list[dict]:
    """CustomNER::extract — rules applied in REGISTRATION order (the
    priority field is never consulted by the reference's extract loop,
    custom_ner.rs:144-156), then greedy overlap resolution.

    Rule dict: {name, entity_type, rule_type, pattern}; rule types:
    exact, regex, prefix, suffix, contains, dictionary, contextual."""
    dictionaries = dictionaries or {}
    entities: list[dict] = []

    def emit(txt, rule, start, end, conf):
        entities.append({"text": txt, "entity_type": rule["entity_type"],
                         "start": start, "end": end, "confidence": conf,
                         "rule_name": rule["name"]})

    tl = text.lower()
    for rule in rules:
        kind = rule["rule_type"]
        pat = rule["pattern"]
        pl = pat.lower()
        if kind == "exact":
            start = 0
            while (pos := tl.find(pl, start)) != -1:
                emit(text[pos:pos + len(pat)], rule, pos, pos + len(pat),
                     1.0)
                start = pos + len(pat)
        elif kind == "regex":
            for m in re.finditer(pat, text):
                emit(m.group(0), rule, m.start(), m.end(), 0.9)
        elif kind in ("prefix", "suffix", "contains"):
            conf = 0.7 if kind in ("prefix", "suffix") else 0.6
            for word, pos in _word_offsets(text):
                wl = word.lower()
                hit = (wl.startswith(pl) if kind == "prefix"
                       else wl.endswith(pl) if kind == "suffix"
                       else pl in wl)
                if hit:
                    emit(word, rule, pos, pos + len(word), conf)
        elif kind == "dictionary":
            for entry in dictionaries.get(rule["entity_type"], []):
                start = 0
                while (pos := tl.find(entry, start)) != -1:
                    emit(text[pos:pos + len(entry)], rule, pos,
                         pos + len(entry), 0.95)
                    start = pos + len(entry)
        elif kind == "contextual":
            parts = pat.split("|")
            if len(parts) != 3:
                continue
            before, target, after = (p.lower() for p in parts)
            words = text.split()
            for w0, w1, w2 in zip(words, words[1:], words[2:]):
                if (before in w0.lower() and target in w1.lower()
                        and after in w2.lower()):
                    # reference quirk: position = FIRST occurrence of the
                    # middle word anywhere in the text
                    pos = text.find(w1)
                    if pos != -1:
                        emit(w1, rule, pos, pos + len(w1), 0.85)
    return resolve_overlaps(entities)


def resolve_overlaps(entities: list[dict]) -> list[dict]:
    """custom_ner.rs:356-385 — stable sort by (start, confidence DESC)
    then greedy skip of anything starting before the last kept end."""
    entities = sorted(entities, key=lambda e: (e["start"],
                                               -e["confidence"]))
    out = []
    last_end = 0
    for e in entities:
        if e["start"] < last_end:
            continue
        last_end = e["end"]
        out.append(e)
    return out


# Fixed rule set for the driver-oracled NER surface over the kgx corpus —
# one rule per kind (the regex targets the ORG-suffix names so every
# char-level match is unique within a sentence, keeping the SQL position
# replay single-occurrence; word-level rules handle repeats naturally).
NER_RULES: tuple[dict, ...] = (
    {"name": "loc_exact", "entity_type": "LOCATION", "rule_type": "exact",
     "pattern": "tokyo"},
    {"name": "org_regex", "entity_type": "ORGANIZATION",
     "rule_type": "regex", "pattern": r"[A-Z][a-z]+ (?:Corp|Inc|LLC)"},
    {"name": "har_prefix", "entity_type": "PERSON", "rule_type": "prefix",
     "pattern": "har"},
    {"name": "son_suffix", "entity_type": "PERSON", "rule_type": "suffix",
     "pattern": "son"},
    {"name": "corp_contains", "entity_type": "ORGANIZATION",
     "rule_type": "contains", "pattern": "corp"},
    {"name": "title_dict", "entity_type": "TITLE",
     "rule_type": "dictionary", "pattern": ""},
    {"name": "works_ctx", "entity_type": "RELATION",
     "rule_type": "contextual", "pattern": "works|for|acme"},
)

NER_DICTIONARIES: dict[str, list[str]] = {
    "TITLE": ["dr.", "prof."],
}
