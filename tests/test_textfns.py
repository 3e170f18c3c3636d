"""Known-value tests for the string helpers, ported from the reference's
unit tests (string_similarity_linker.rs:468-563)."""

from graphrag_ray.functions import textfns as tf


def test_levenshtein_known_values():
    assert tf.levenshtein("kitten", "sitting") == 3  # classic reference case
    assert tf.levenshtein("", "abc") == 3
    assert tf.levenshtein("abc", "") == 3
    assert tf.levenshtein("same", "same") == 0


def test_levenshtein_similarity_gate():
    # distance 3 > max_edit_distance 2 → 0.0 (string_similarity_linker.rs:186-200)
    assert tf.levenshtein_similarity("kitten", "sitting", 2) == 0.0
    assert tf.levenshtein_similarity("kitten", "sitten", 2) == 1.0 - 1 / 6


def test_jaro_winkler():
    assert tf.jaro_winkler("", "") == 1.0
    assert tf.jaro_winkler("abc", "") == 0.0
    assert tf.jaro_winkler("martha", "marhta") > 0.94
    assert tf.jaro_winkler("abc", "abc") == 1.0


def test_soundex_known_values():
    # Robert → R163 (reference test case)
    assert tf.soundex("Robert") == "R163"
    assert tf.soundex("Rupert") == "R163"
    assert tf.soundex("") == ""
    assert tf.soundex("A") == "A000"


def test_token_jaccard():
    assert tf.token_jaccard("alice harmon", "alice harmon") == 1.0
    assert tf.token_jaccard("alice harmon", "alice smith") == 1 / 3
    assert tf.token_jaccard("", "") == 1.0


def test_normalize_name_drops_spaces():
    # entity/mod.rs:779-785: spaces are filtered before the (dead) replace
    assert tf.normalize_name("Alice Harmon") == "aliceharmon"
    assert tf.normalize_name("O'Connor & Sons!") == "oconnorsons"


def test_normalize_string():
    assert tf.normalize_string("  Alice   HARMON. ") == "alice harmon"


def test_clean_word():
    assert tf.clean_word("Alice,") == "Alice"
    assert tf.clean_word("O'Connor's'") == "O'Connor's"
    assert tf.clean_word("123abc") == "abc"


def test_name_similarity_exact_short_circuit():
    assert tf.name_similarity("alice harmon", "alice harmon") == 1.0
    assert tf.name_similarity("alice harmon", "alice harmn") >= 0.85
    assert tf.name_similarity("alice harmon", "zed qux") < 0.5
