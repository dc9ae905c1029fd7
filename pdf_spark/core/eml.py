"""RFC 5322 / MIME email text extraction — the mailing-list-archive tier.

Crawls carry large volumes of archived email (mailing lists, support
forums, .eml attachments); the training-data contract is the same as
every document tier: subject + sender domain for routing, ONE body text
(prefer ``text/plain``, fall back to stripped ``text/html``), report-
don't-raise on the malformed framing real archives serve.

Scope (all public specs):

- RFC 5322 header block: CRLF or bare-LF line endings, folded
  (whitespace-continued) header lines, case-insensitive names;
- RFC 2047 encoded-words in Subject (``=?charset?B|Q?...?=``, B=base64,
  Q=quoted-printable with ``_``=space; adjacent words concatenate with
  the separating whitespace dropped, per the spec);
- RFC 2045 transfer encodings: ``base64``, ``quoted-printable``
  (soft line breaks), ``7bit``/``8bit`` identity;
- multipart/* walk on the ``boundary`` parameter, nested one-in-another
  to ``DEPTH_CAP``; part selection prefers the FIRST text/plain leaf
  anywhere, else the first text/html leaf (stripped with the HTML
  tier's block segmenter, no boilerplate classifier — email HTML is
  body text);
- charsets: utf-8 (default, replace-tolerant) and latin-1.

stdlib ``email`` is deliberately not used: the parser must stay
tolerant of the truncated/misfolded framing crawls serve, and the
fixture side hand-builds wire bytes — reader and writer share nothing.

Reference parity note: the C reference (someone13574/pdf) has no email
surface — net-new in the E19/E183/E184 document-tier tradition.
"""

from __future__ import annotations

import base64
import binascii
import re

from pdf_spark.core.htmltext import decode_html, segment_blocks

__all__ = ["eml_text", "parse_headers", "DEPTH_CAP", "PART_CAP"]

DEPTH_CAP = 4  # nested-multipart bomb
PART_CAP = 256  # part-count bomb

_HDR_LINE = re.compile(r"^([!-9;-~]+):[ \t]*(.*)$")
_ENC_WORD = re.compile(r"=\?([^?]+)\?([bBqQ])\?([^?]*)\?=")
_ADDR = re.compile(r"<?[^<>\s@]+@([A-Za-z0-9.-]+)>?")
_QP_BYTE = re.compile(rb"=([0-9A-Fa-f]{2})")


def _charset_decode(raw: bytes, charset: str) -> str:
    cs = charset.lower()
    if cs in ("iso-8859-1", "latin-1", "latin1", "windows-1252", "cp1252"):
        return raw.decode("latin-1")
    return raw.decode("utf-8", "replace")


def _decode_qp(raw: bytes, header_mode: bool = False) -> bytes:
    if header_mode:
        raw = raw.replace(b"_", b" ")
    else:
        raw = raw.replace(b"=\r\n", b"").replace(b"=\n", b"")  # soft breaks
    return _QP_BYTE.sub(lambda m: bytes([int(m.group(1), 16)]), raw)


def _decode_word(charset: str, kind: str, payload: str) -> str:
    raw = payload.encode("ascii", "replace")
    if kind in "bB":
        try:
            dec = base64.b64decode(raw + b"=" * (-len(raw) % 4))
        except (binascii.Error, ValueError):
            return payload
    else:
        dec = _decode_qp(raw, header_mode=True)
    return _charset_decode(dec, charset)


def _decode_2047(value: str) -> str:
    # Whitespace BETWEEN adjacent encoded words is dropped (RFC 2047 §6.2).
    value = re.sub(r"(\?=)\s+(=\?)", r"\1\2", value)
    return _ENC_WORD.sub(
        lambda m: _decode_word(m.group(1), m.group(2), m.group(3)), value
    )


def parse_headers(block: str) -> dict:
    """Folded header block → {lower-name: value} (first wins)."""
    out: dict[str, str] = {}
    name = None
    for line in block.split("\n"):
        line = line.rstrip("\r")
        if line[:1] in (" ", "\t") and name:
            out[name] += " " + line.strip()
            continue
        m = _HDR_LINE.match(line)
        if not m:
            name = None
            continue
        name = m.group(1).lower()
        out.setdefault(name, m.group(2))
    return out


def _split_message(data: bytes) -> tuple[str, bytes] | None:
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = data.find(sep)
        if idx != -1:
            head = data[:idx].decode("utf-8", "replace")
            if _HDR_LINE.match(head.split("\n", 1)[0].rstrip("\r")):
                return head, data[idx + len(sep) :]
            return None
    return None


def _ctype(headers: dict) -> tuple[str, dict]:
    raw = headers.get("content-type", "text/plain")
    parts = raw.split(";")
    mime = parts[0].strip().lower()
    params = {}
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            params[k.strip().lower()] = v.strip().strip('"')
    return mime, params


def _decode_body(headers: dict, body: bytes) -> bytes:
    cte = headers.get("content-transfer-encoding", "7bit").strip().lower()
    if cte == "base64":
        try:
            return base64.b64decode(re.sub(rb"\s+", b"", body) + b"==")
        except (binascii.Error, ValueError):
            return b""
    if cte == "quoted-printable":
        return _decode_qp(body)
    return body


def _leaves(headers: dict, body: bytes, depth: int) -> list[tuple[str, str]]:
    """→ [(mime, decoded_text)] for every text-bearing leaf, in order."""
    mime, params = _ctype(headers)
    if mime.startswith("multipart/") and depth < DEPTH_CAP:
        boundary = params.get("boundary")
        if not boundary:
            return []
        delim = b"--" + boundary.encode("ascii", "replace")
        chunks = body.split(delim)[1:]  # preamble dropped
        out: list[tuple[str, str]] = []
        for chunk in chunks[:PART_CAP]:
            if chunk[:2] == b"--":  # closing delimiter
                break
            chunk = chunk.lstrip(b"\r\n")
            split = _split_message(chunk)
            if split is None:
                continue
            sub_head, sub_body = split
            out.extend(_leaves(parse_headers(sub_head), sub_body, depth + 1))
        return out
    if mime in ("text/plain", "text/html"):
        raw = _decode_body(headers, body)
        text = _charset_decode(raw, params.get("charset", "utf-8"))
        return [(mime, text)]
    return []


def eml_text(data: bytes) -> dict:
    """Wire bytes → subject / sender domain / one body text."""
    null = {
        "is_email": 0,
        "subject": None,
        "from_domain": None,
        "n_parts": None,
        "body_kind": None,
        "body_text": None,
    }
    split = _split_message(data)
    if split is None:
        return null
    head, body = split
    headers = parse_headers(head)
    if "from" not in headers and "subject" not in headers:
        return null
    leaves = _leaves(headers, body, 0)
    kind, text = None, None
    for want in ("text/plain", "text/html"):
        for mime, leaf in leaves:
            if mime == want:
                kind, text = want.split("/")[1], leaf
                break
        if kind:
            break
    if kind == "html":
        text = "\n".join(
            b.text for b in segment_blocks(decode_html(text.encode())) if b.text
        )
    elif text is not None:
        text = text.replace("\r\n", "\n").strip("\n")
    domain = None
    m = _ADDR.search(headers.get("from", ""))
    if m:
        domain = m.group(1).lower().rstrip(".")
    return {
        "is_email": 1,
        "subject": _decode_2047(headers.get("subject", "")).strip() or None,
        "from_domain": domain,
        "n_parts": len(leaves),
        "body_kind": kind,
        "body_text": text,
    }


# --- Reply/signature stripping (mailing-list corpus cleaning) ---------------------

_ATTRIB = re.compile(r"wrote:\s*$")
_SIG_DELIM = re.compile(r"^-- ?$")


def strip_reply(text: str) -> dict:
    """Email BODY text → the author's own prose.

    Mailing-list archives quote the whole thread under every reply; a
    corpus that keeps quotes trains on the same paragraph once per
    thread position. Strips, in one line pass:

    - quoted lines (``>`` prefix, any nesting depth) — counted;
    - the attribution line introducing a quote (ends with ``wrote:``,
      the convention every mainstream client emits) when a quoted
      line follows before any non-blank prose line;
    - the signature block: everything from the ``-- `` delimiter line
      (RFC 3676 signature separator, trailing space optional) to EOF;
    - blank-line runs left behind collapse to one.
    """
    lines = text.split("\n")
    kept: list[str] = []
    n_quoted = 0
    has_sig = 0
    has_attrib = 0
    pending_attrib: str | None = None
    for raw in lines:
        line = raw.rstrip("\r")
        if _SIG_DELIM.match(line):
            has_sig = 1
            break
        if line.lstrip().startswith(">"):
            n_quoted += 1
            if pending_attrib is not None:
                has_attrib = 1  # confirmed: attribution introduced a quote
                pending_attrib = None
            continue
        if pending_attrib is not None:
            kept.append(pending_attrib)
            pending_attrib = None
        if _ATTRIB.search(line):
            pending_attrib = line  # held until we see what follows
            continue
        kept.append(line)
    if pending_attrib is not None:
        kept.append(pending_attrib)
    # collapse blank runs and trim edges
    out: list[str] = []
    for ln in kept:
        if ln.strip():
            out.append(ln)
        elif out and out[-1] != "":
            out.append("")
    while out and out[-1] == "":
        out.pop()
    return {
        "clean_text": "\n".join(out),
        "n_quoted_lines": n_quoted,
        "has_signature": has_sig,
        "has_attribution": has_attrib,
    }
