"""Sentence segmentation unit tests (core/sentseg.py)."""

from pdf_spark.core.sentseg import sentence_split


def test_basic_boundaries_and_terminator_kept():
    r = sentence_split("First one. Second two! Third three? Tail")
    assert r["sentences"] == [
        "First one.", "Second two!", "Third three?", "Tail",
    ]
    assert r["n_sentences"] == 4 and r["n_guards"] == 0
    assert r["max_chars"] == 12


def test_abbreviation_and_initial_guards():
    r = sentence_split("Mr. Smith met Dr. Jones. J. K. Rowling left.")
    assert r["sentences"] == [
        "Mr. Smith met Dr. Jones.", "J. K. Rowling left.",
    ]
    assert r["n_guards"] == 4  # Mr. Dr. J. K.


def test_decimals_and_lowercase_never_split():
    r = sentence_split("Pi is 3.14 about. and then lowercase continues")
    assert r["n_sentences"] == 1 and r["n_guards"] == 0
    r = sentence_split("Version 2.0 shipped. Next came 3.1 fast.")
    assert r["n_sentences"] == 2


def test_ellipsis_collapses_to_one_boundary():
    r = sentence_split("Wait... Now go.")
    assert r["sentences"] == ["Wait...", "Now go."]


def test_empty_and_whitespace():
    assert sentence_split("")["n_sentences"] == 0
    assert sentence_split("   ")["n_sentences"] == 0
    assert sentence_split("")["max_chars"] == 0


def test_exclamation_never_guarded():
    # guards apply only to periods: "etc!" still splits
    r = sentence_split("Bring pens etc! Also paper.")
    assert r["n_sentences"] == 2 and r["n_guards"] == 0
