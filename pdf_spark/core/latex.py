"""LaTeX source text extraction — the arXiv/paper-corpus tier.

Scientific-paper source dumps are a standing training-corpus tier and
ship as TeX, not PDF. The pipeline contract is detex-grade: keep the
prose, drop the typesetting, and COUNT the structure that routes the
document (sections, math density, citation density — the features
quality classifiers for academic text actually use).

Processing order matters and is fixed (each stage sees the previous
stage's output):

1. comments: unescaped ``%`` to end-of-line (``\\%`` survives);
2. body slice: between ``\\begin{document}``/``\\end{document}`` when
   present (preamble macros never leak into prose); ``\\title{}`` is
   captured from the WHOLE source first;
3. non-prose environments dropped wholesale: figure/table/tikzpicture/
   verbatim/lstlisting (+ starred forms); math environments
   (equation/align/gather/multline/eqnarray/displaymath + starred)
   dropped and COUNTED;
4. display math ``$$..$$`` / ``\\[..\\]`` dropped+counted, then inline
   ``$..$`` / ``\\(..\\)`` dropped+counted (order prevents ``$$``
   being eaten as two empty inline spans);
5. ``\\cite/\\citep/\\citet{..}`` counted+dropped; ``\\ref/\\eqref/
   \\autoref/\\label{..}`` dropped;
6. sectioning unwrapped to their titles (counted);
   ``\\textbf/\\textit/\\emph/\\underline/\\texttt{..}`` unwrapped;
7. residue: ``\\item`` markers off, ``\\\\`` → newline, ``~`` → space,
   special-char escapes (``\\% \\& \\_ \\# \\$``) unescaped, remaining
   ``\\command`` tokens (with optional ``[..]``) dropped, braces
   stripped, whitespace normalized per line, blank lines dropped.

Bounded, report-don't-raise; not a container format, so no gate —
structure counts are the classifier signal (like E190).
"""

from __future__ import annotations

import re

__all__ = ["latex_text"]

_COMMENT = re.compile(r"(?<!\\)%.*")
_TITLE = re.compile(r"\\title\s*\{([^{}]*)\}")
_DOC = re.compile(r"\\begin\{document\}(.*)\\end\{document\}", re.S)

_DROP_ENVS = "figure|table|tikzpicture|verbatim|lstlisting"
_MATH_ENVS = "equation|align|gather|multline|eqnarray|displaymath"
_DROP_ENV_RE = re.compile(
    r"\\begin\{(" + _DROP_ENVS + r")\*?\}.*?\\end\{\1\*?\}", re.S
)
_MATH_ENV_RE = re.compile(
    r"\\begin\{(" + _MATH_ENVS + r")\*?\}.*?\\end\{\1\*?\}", re.S
)
_DISPLAY = re.compile(r"\$\$.*?\$\$|\\\[.*?\\\]", re.S)
_INLINE = re.compile(r"\$[^$]*\$|\\\(.*?\\\)", re.S)
_CITE = re.compile(r"\\cite[pt]?\*?(?:\[[^\]]*\])?\s*\{[^{}]*\}")
_REF = re.compile(r"\\(?:ref|eqref|autoref|pageref|label)\s*\{[^{}]*\}")
_SECTION = re.compile(
    r"\\(?:sub){0,2}section\*?\s*\{([^{}]*)\}|\\chapter\*?\s*\{([^{}]*)\}"
)
_UNWRAP = re.compile(
    r"\\(?:textbf|textit|emph|underline|texttt|textsc|mbox)\s*\{([^{}]*)\}"
)
_ESCAPES = {r"\%": "%", r"\&": "&", r"\_": "_", r"\#": "#", r"\$": "$"}
_COMMAND = re.compile(r"\\[a-zA-Z@]+\*?(?:\[[^\]]*\])?")


def latex_text(src: str) -> dict:
    """TeX source → prose + routing structure counts."""
    title_m = _TITLE.search(_COMMENT.sub("", src))
    text = "\n".join(_COMMENT.sub("", ln) for ln in src.split("\n"))
    doc = _DOC.search(text)
    if doc:
        text = doc.group(1)
    text = _DROP_ENV_RE.sub(" ", text)
    n_eq = len(_MATH_ENV_RE.findall(text))
    text = _MATH_ENV_RE.sub(" ", text)
    n_eq += len(_DISPLAY.findall(text))
    text = _DISPLAY.sub(" ", text)
    n_inline = len(_INLINE.findall(text))
    text = _INLINE.sub(" ", text)
    n_cites = len(_CITE.findall(text))
    text = _CITE.sub("", text)
    text = _REF.sub("", text)

    sections: list[str] = []

    def _sec(m: re.Match) -> str:
        sections.append((m.group(1) or m.group(2)).strip())
        return "\n" + (m.group(1) or m.group(2)) + "\n"

    text = _SECTION.sub(_sec, text)
    for _ in range(3):  # nested wrappers (\textbf{\emph{x}})
        text, n = _UNWRAP.subn(lambda m: m.group(1), text)
        if not n:
            break
    # prose environments (itemize/enumerate/abstract/center...): the
    # begin/end tokens go, their CONTENT stays
    text = re.sub(r"\\(?:begin|end)\s*\{[^{}]*\}", " ", text)
    text = text.replace("\\item", " ").replace("\\\\", "\n")
    for esc, ch in _ESCAPES.items():
        text = text.replace(esc, ch)
    text = text.replace("~", " ")
    text = _COMMAND.sub(" ", text)
    text = text.replace("{", "").replace("}", "")
    lines = [re.sub(r"[ \t]+", " ", ln).strip() for ln in text.split("\n")]
    prose = "\n".join(ln for ln in lines if ln)
    return {
        "title": title_m.group(1).strip() if title_m else None,
        "n_sections": len(sections),
        "n_equations": n_eq,
        "n_inline_math": n_inline,
        "n_citations": n_cites,
        "text": prose,
    }
