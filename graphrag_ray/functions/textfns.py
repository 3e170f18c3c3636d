"""Scalar string helpers shared by extraction and canonicalization.

Semantics match the reference implementations (behavioral transcription from
Rust, cited per function); these run inside batch UDFs, so they are plain
Python operating on small strings (entity names), never on whole documents.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------------------
# normalization


@lru_cache(maxsize=131072)
def normalize_name(name: str) -> str:
    """Entity-id normalization (entity/mod.rs:779-785).

    Lowercase, then keep only alphanumerics and underscores. Note the
    reference filters spaces *out* before its (dead) space→underscore
    replace, so "Alice Harmon" → "aliceharmon". Cached (hot loop, small
    name vocabulary).
    """
    return "".join(c for c in name.lower() if c.isalnum() or c == "_")


def normalize_string(s: str) -> str:
    """Similarity-comparison normalization (string_similarity_linker.rs:168-184).

    Lowercase, strip punctuation (keep alnum + whitespace), collapse runs of
    whitespace to single spaces.
    """
    s = s.lower()
    s = "".join(c for c in s if c.isalnum() or c.isspace())
    return " ".join(s.split())


@lru_cache(maxsize=131072)
def clean_word(word: str) -> str:
    """Remove non-alphabetic chars except apostrophes, trim trailing
    apostrophes (entity/mod.rs:638-645). Cached — token vocabulary is small
    relative to token count in the hot extraction loop."""
    if word.isalpha():
        return word
    kept = "".join(c for c in word if c.isalpha() or c == "'")
    return kept.rstrip("'")


def is_capitalized(word: str) -> bool:
    """First character uppercase (entity/mod.rs:633-636)."""
    return bool(word) and word[0].isupper()


# ---------------------------------------------------------------------------
# string similarity metrics (string_similarity_linker.rs:186-405)


def levenshtein(s1: str, s2: str) -> int:
    """Classic edit distance, char-based (string_similarity_linker.rs:203-245)."""
    if s1 == s2:
        return 0
    len1, len2 = len(s1), len(s2)
    if len1 == 0:
        return len2
    if len2 == 0:
        return len1
    if len1 < len2:  # iterate over the shorter row
        s1, s2, len1, len2 = s2, s1, len2, len1
    prev = list(range(len2 + 1))
    for i in range(1, len1 + 1):
        cur = [i] + [0] * len2
        c1 = s1[i - 1]
        for j in range(1, len2 + 1):
            cost = 0 if c1 == s2[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[len2]


def levenshtein_similarity(s1: str, s2: str, max_edit_distance: int | None = None) -> float:
    """1 - dist/max_len, gated by max_edit_distance
    (string_similarity_linker.rs:186-200; ungated variant:
    corpus/entity_linker.rs:479-493)."""
    dist = levenshtein(s1, s2)
    if max_edit_distance is not None and dist > max_edit_distance:
        return 0.0
    max_len = max(len(s1), len(s2))
    if max_len == 0:
        return 1.0
    return 1.0 - dist / max_len


def jaro_similarity(s1: str, s2: str) -> float:
    """Jaro similarity (string_similarity_linker.rs:262-322)."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 and len2 == 0:
        return 1.0
    if len1 == 0 or len2 == 0:
        return 0.0
    match_distance = max(len1, len2) // 2 - 1
    if match_distance < 0:
        match_distance = 0
    s1_matches = [False] * len1
    s2_matches = [False] * len2
    matches = 0
    for i in range(len1):
        start = max(0, i - match_distance)
        end = min(i + match_distance + 1, len2)
        for j in range(start, end):
            if s2_matches[j] or s1[i] != s2[j]:
                continue
            s1_matches[i] = True
            s2_matches[j] = True
            matches += 1
            break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if not s1_matches[i]:
            continue
        while not s2_matches[k]:
            k += 1
        if s1[i] != s2[k]:
            transpositions += 1
        k += 1
    m = float(matches)
    return (m / len1 + m / len2 + (m - transpositions / 2.0) / m) / 3.0


def jaro_winkler(s1: str, s2: str) -> float:
    """Jaro with Winkler prefix bonus, prefix capped at 4
    (string_similarity_linker.rs:248-260)."""
    jaro = jaro_similarity(s1, s2)
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1.0 - jaro)


def token_jaccard(s1: str, s2: str) -> float:
    """Whitespace-token Jaccard (string_similarity_linker.rs:325-341)."""
    t1, t2 = set(s1.split()), set(s2.split())
    if not t1 and not t2:
        return 1.0
    union = len(t1 | t2)
    if union == 0:
        return 0.0
    return len(t1 & t2) / union


_SOUNDEX_CODES = {}
for _letters, _code in (
    ("BFPV", "1"),
    ("CGJKQSXZ", "2"),
    ("DT", "3"),
    ("L", "4"),
    ("MN", "5"),
    ("R", "6"),
):
    for _ch in _letters:
        _SOUNDEX_CODES[_ch] = _code


def _soundex_code(c: str) -> str:
    return _SOUNDEX_CODES.get(c.upper(), "0")


@lru_cache(maxsize=65536)
def soundex(s: str) -> str:
    """Simplified Soundex (string_similarity_linker.rs:356-405):
    first letter kept, consecutive duplicate codes collapsed, vowels reset
    nothing (no 'HW' rule), padded/truncated to 4."""
    if not s:
        return ""
    chars = s.upper()
    result = chars[0] if chars[0].isalpha() else ""
    prev_code = _soundex_code(chars[0])
    for c in chars[1:]:
        code = _soundex_code(c)
        if code != "0" and code != prev_code:
            result += code
        prev_code = code
        if len(result) >= 4:
            break
    return (result + "0000")[:4]


def phonetic_similarity(s1: str, s2: str) -> float:
    """0.9 on soundex match else 0 (string_similarity_linker.rs:343-353)."""
    return 0.9 if soundex(s1) == soundex(s2) else 0.0


def name_similarity(
    norm1: str,
    norm2: str,
    *,
    max_edit_distance: int = 2,
    use_phonetic: bool = False,
) -> float:
    """Max over the metric family on already-normalized names
    (string_similarity_linker.rs:126-165). Type equality is checked by the
    caller; exact normalized match short-circuits to 1.0."""
    if norm1 == norm2:
        return 1.0
    scores = [
        levenshtein_similarity(norm1, norm2, max_edit_distance),
        jaro_winkler(norm1, norm2),
        token_jaccard(norm1, norm2),
    ]
    if use_phonetic:
        scores.append(phonetic_similarity(norm1, norm2))
    return max(scores)
