"""Unicode script-mixing audit — the homoglyph/spoof tier.

Mixed-script TOKENS (Latin letters interleaved with Cyrillic or Greek
lookalikes — "pаypal" with U+0430) are the standard phishing/spam
obfuscation and also poison tokenizers: one confusable character
splits a common word into rare subwords. Document-level language ID
(qt04) cannot see this — the signal is per-token script CO-OCCURRENCE.

Script classification is by explicit public Unicode block ranges
(Latin A-Z/a-z + Latin-1/Extended, Cyrillic U+0400-04FF, Greek
U+0370-03FF); anything else (digits, punctuation, CJK) is neutral and
never makes a token "mixed" by itself.
"""

from __future__ import annotations

__all__ = ["script_mix"]


def _script(ch: str) -> str | None:
    cp = ord(ch)
    if 0x41 <= cp <= 0x5A or 0x61 <= cp <= 0x7A:
        return "latin"
    if 0xC0 <= cp <= 0x24F:  # Latin-1 Supplement + Extended A/B letters
        return "latin"
    if 0x400 <= cp <= 0x4FF:
        return "cyrillic"
    if 0x370 <= cp <= 0x3FF:
        return "greek"
    return None


def script_mix(text: str) -> dict:
    """Whitespace tokens → mixing profile (integer counts only)."""
    n_tokens = n_mixed = n_cyr = n_latin = 0
    for token in text.split():
        scripts = set()
        for ch in token:
            s = _script(ch)
            if s:
                scripts.add(s)
        if not scripts:
            continue
        n_tokens += 1
        if len(scripts) > 1:
            n_mixed += 1
        elif scripts == {"cyrillic"}:
            n_cyr += 1
        elif scripts == {"latin"}:
            n_latin += 1
    return {
        "n_tokens": n_tokens,
        "n_latin": n_latin,
        "n_cyrillic": n_cyr,
        "n_mixed": n_mixed,
        "has_spoof": int(n_mixed > 0),
    }
