from el.text import (
    collapse_ws,
    content_tokens,
    initials,
    is_acronym,
    normalize_name,
    stem,
    term_vector,
    tokenize,
)


def test_tokenize():
    assert tokenize("Hello, World 42!") == ["hello", "world", "42"]
    assert tokenize("") == []


def test_stem():
    assert stem("running") == "runn"
    assert stem("cities") == "citi"
    assert stem("classes") == "class"
    assert stem("cats") == "cat"
    assert stem("is") == "is"  # too short to strip
    assert stem("pass") == "pass"  # -ss protected


def test_normalize_name():
    assert normalize_name("  Austin,  TX ") == "austin tx"
    assert normalize_name("J.  Harper-Smith") == "j harper smith"
    assert normalize_name("UWCC") == "uwcc"


def test_initials_and_acronym():
    assert initials("United Western Commerce Council") == "UWCC"
    assert is_acronym("UWCC")
    assert not is_acronym("Uwcc")
    assert not is_acronym("U")


def test_term_vector_topk():
    tv = term_vector("alpha alpha beta gamma gamma gamma", top_k=2)
    assert tv == {"gamma": 3, "alpha": 2}


def test_content_tokens_drop_stopwords():
    assert "the" not in content_tokens("the quick brown fox")


def test_collapse_ws():
    assert collapse_ws("  a \n b\tc ") == "a b c"
