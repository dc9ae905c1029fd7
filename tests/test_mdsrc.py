"""core/mdsrc.py — markdown source strip/structure, CommonMark-core cases."""

from pdf_spark.core.mdsrc import md_structure


def test_atx_headings_and_title():
    m = md_structure("# Top\n\nPara one.\n\n## Sub ##\n\nPara two.")
    assert m["title"] == "Top"
    assert m["n_headings"] == 2
    assert m["prose"] == "Top\nPara one.\nSub\nPara two."


def test_setext_heading_and_thematic_break():
    m = md_structure("Head\n===\n\ntext\n\n---\n\nmore")
    # the --- after a BLANK line is a thematic break, not a setext h2
    assert m["title"] == "Head" and m["n_headings"] == 1
    assert m["prose"] == "Head\ntext\nmore"


def test_fenced_code_excluded_and_lang_captured():
    m = md_structure(
        "intro\n```python\nx = 1\n# not a heading\n```\noutro\n~~~\nraw\n~~~\n"
    )
    assert m["n_code_blocks"] == 2
    assert m["code_lang"] == "python"
    assert m["prose"] == "intro\noutro"
    assert m["n_headings"] == 0


def test_links_images_inline_code_emphasis():
    m = md_structure(
        "See [docs](http://e.x/d) and ![pic](i.png), use `cfg.load()` "
        "with **bold** and _it_."
    )
    assert m["n_links"] == 1 and m["n_images"] == 1
    assert m["prose"] == "See docs and pic, use cfg.load() with bold and it."


def test_lists_and_blockquotes_stripped():
    m = md_structure("- item a\n- item b\n1. first\n> quoted line\n")
    assert m["prose"] == "item a\nitem b\nfirst\nquoted line"


def test_unclosed_fence_swallows_tail():
    m = md_structure("keep\n```\ntrailing code never closed\n")
    assert m["prose"] == "keep" and m["n_code_blocks"] == 1
