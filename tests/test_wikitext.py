"""core/wikitext.py — nested-construct stripping, MediaWiki markup."""

from pdf_spark.core.wikitext import wikitext_strip


def test_nested_templates_count_toplevel_only():
    m = wikitext_strip("{{Infobox|a={{nested|x}}|b=2}}Body text.{{cite}}")
    assert m["text"] == "Body text."
    assert m["n_templates"] == 2


def test_links_internal_external_and_pipe():
    m = wikitext_strip(
        "See [[Alan Turing|Turing]] and [[Enigma]] plus "
        "[https://e.x/p paper] and bare [https://e.x/q]."
    )
    assert m["text"] == "See Turing and Enigma plus paper and bare ."
    assert m["n_internal_links"] == 2
    assert m["n_external_links"] == 2


def test_file_with_nested_caption_link_dropped_whole():
    m = wikitext_strip(
        "[[File:X.jpg|thumb|A [[caption link]] here]]Prose stays."
    )
    assert m["text"] == "Prose stays."
    assert m["n_internal_links"] == 0


def test_refs_headings_lists_emphasis():
    src = (
        "== History ==\n"
        "'''Bold''' and ''italic'' claim.<ref>Smith 2020</ref>\n"
        "* item one\n"
        "# item two\n"
        "<ref name=x/>\n"
        "__TOC__\n"
    )
    m = wikitext_strip(src)
    assert m["text"] == "History\nBold and italic claim.\nitem one\nitem two"
    assert m["n_sections"] == 1 and m["n_refs"] == 2


def test_tables_and_comments_dropped():
    src = "Before{| class=wikitable\n|cell\n|}After<!-- hidden -->."
    m = wikitext_strip(src)
    assert m["text"] == "BeforeAfter."
