"""core/latex.py — detex-grade extraction over arXiv-style sources."""

from pdf_spark.core.latex import latex_text


def test_preamble_sliced_title_captured():
    src = (
        "\\documentclass{article}\n\\usepackage{amsmath}\n"
        "\\title{A Study of Things}\n"
        "\\begin{document}\nBody text here.\n\\end{document}\n"
    )
    m = latex_text(src)
    assert m["title"] == "A Study of Things"
    assert m["text"] == "Body text here."


def test_comments_stripped_escaped_percent_kept():
    m = latex_text("Keep 50\\% of this. % drop this\nNext line")
    assert m["text"] == "Keep 50% of this.\nNext line"


def test_sections_counted_and_unwrapped():
    src = (
        "\\section{Intro}\nWe study \\textbf{bold} and \\emph{it}.\n"
        "\\subsection*{Setup}\nMore."
    )
    m = latex_text(src)
    assert m["n_sections"] == 2
    assert m["text"] == "Intro\nWe study bold and it.\nSetup\nMore."


def test_math_dropped_and_counted():
    src = (
        "Let $x$ and \\(y\\) be real. Then\n"
        "\\begin{equation}x=y\\end{equation}\n"
        "and $$z=0$$ hold; see \\begin{align*}a&=b\\end{align*}."
    )
    m = latex_text(src)
    assert m["n_inline_math"] == 2
    assert m["n_equations"] == 3
    assert "x=y" not in m["text"] and "z=0" not in m["text"]


def test_citations_refs_and_environments():
    src = (
        "Prior work \\cite{a,b} and \\citep[p.~3]{c} agree; see "
        "Fig.\\ref{fig:x}.\n"
        "\\begin{figure}\\includegraphics{x.png}\\caption{nope}\\end{figure}\n"
        "\\begin{itemize}\\item First point\\item Second\\end{itemize}\n"
    )
    m = latex_text(src)
    assert m["n_citations"] == 2
    assert "nope" not in m["text"]
    assert "First point" in m["text"] and "Second" in m["text"]
    assert "ref" not in m["text"]


def test_linebreak_nbsp_and_nested_wrappers():
    m = latex_text("A\\\\B and x~y plus \\textbf{\\emph{deep}} end")
    assert m["text"] == "A\nB and x y plus deep end"


def test_prose_environment_names_never_leak():
    m = latex_text("\\begin{itemize}\\item One\\end{itemize}")
    assert m["text"] == "One"
    m = latex_text("\\begin{abstract}The gist.\\end{abstract}")
    assert m["text"] == "The gist."
