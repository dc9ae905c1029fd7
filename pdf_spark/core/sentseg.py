"""Rule-based sentence segmentation — the unit every downstream text op
(bitext alignment, chunking, perplexity windows, PII scanning) actually
wants when "paragraph" is too coarse and "word" too fine.

The splitter is the classic abbreviation-guarded boundary rule (the
pre-statistical core of Punkt and of every production tokenizer's
fallback path, all public knowledge):

- a candidate boundary is ``. ! ?`` followed by whitespace and an
  upper-case letter, digit, or opening quote/bracket;
- a period is NOT a boundary after a known abbreviation (``Mr. Smith``),
  after a single capital initial (``J. Smith``), or inside a decimal
  (``3.14`` has no whitespace after the dot, so it never becomes a
  candidate in the first place);
- ellipses (``...``) collapse to one candidate at the final dot.

Deterministic and dependency-free: no trained model, so the same bytes
always segment identically on every executor — the property the oracle
certifies. The reference has no sentence tier (it stops at spans); this
extends the text-analysis tier the way E19 extended extraction to HTML.
"""

from __future__ import annotations

import re

# The high-frequency English abbreviation set every rule splitter carries;
# matching is case-insensitive on the token preceding the period.
_ABBREV = frozenset(
    "mr mrs ms dr prof rev gen sen rep st mt ft no vs etc inc ltd co corp "
    "jr sr dept univ assn bros fig vol pp ed al".split()
)

# candidate boundary: terminator run, whitespace, sentence-opening char
_BOUNDARY_RE = re.compile(r"([.!?]+)(\s+)(?=[A-Z0-9\"'(\[])")

_WORD_BEFORE_RE = re.compile(r"([A-Za-z]+)\.$")


def sentence_split(text: str) -> dict:
    """Segment ``text`` into sentences; return segmentation + audit counts.

    Returns ``{sentences, n_sentences, n_guards, max_chars}`` where
    ``sentences`` is the list of sentence strings (whitespace-trimmed,
    terminators kept), ``n_guards`` counts candidate boundaries that an
    abbreviation/initial guard suppressed, and ``max_chars`` is the
    longest sentence's character count (0 for empty input).
    """
    sentences = []
    n_guards = 0
    start = 0
    for m in _BOUNDARY_RE.finditer(text):
        # the text from current start through the terminator run
        end = m.end(1)
        chunk = text[start:end]
        if m.group(1) == ".":
            w = _WORD_BEFORE_RE.search(chunk)
            if w is not None:
                word = w.group(1)
                if word.lower() in _ABBREV or (
                    len(word) == 1 and word.isupper()
                ):
                    n_guards += 1
                    continue
        s = chunk.strip()
        if s:
            sentences.append(s)
        start = m.end()
    tail = text[start:].strip()
    if tail:
        sentences.append(tail)
    return {
        "sentences": sentences,
        "n_sentences": len(sentences),
        "n_guards": n_guards,
        "max_chars": max((len(s) for s in sentences), default=0),
    }
