"""Web-page text extraction.

The driver's input table is (url, warc_ts, html, text, lang). The
per-row invariant mirrors the reference's CC-News reader, whose doc
text is ``title.strip() + ' ' + text.strip()``
(/root/reference/patapsco/docs.py:92): when a pre-extracted ``text``
column is present it is used byte-identically; otherwise the html is
reduced deterministically to ``title.strip() + ' ' + body_text.strip()``
with tags stripped and HTML entities unescaped.
"""

from __future__ import annotations

import html as _htmllib
import re

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_BODY_RE = re.compile(r"<body[^>]*>(.*?)</body>", re.IGNORECASE | re.DOTALL)
_SCRIPT_RE = re.compile(
    r"<(script|style)[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]+>")


def html_to_text(raw: bytes | str) -> str:
    """Deterministic html -> text: title.strip() + ' ' + body.strip()."""
    if isinstance(raw, bytes):
        try:
            raw = raw.decode("utf-8")
        except UnicodeDecodeError:
            raw = raw.decode("utf-8", errors="replace")
    m = _TITLE_RE.search(raw)
    title = _htmllib.unescape(_TAG_RE.sub(" ", m.group(1))).strip() if m else ""
    m = _BODY_RE.search(raw)
    body_html = m.group(1) if m else raw
    body_html = _SCRIPT_RE.sub(" ", body_html)
    body = _htmllib.unescape(_TAG_RE.sub(" ", body_html)).strip()
    if title:
        return title + " " + body
    return body


def extract_text(text, html) -> str:
    """Pick the pre-extracted text column when present, else parse html."""
    if text is not None and text != "":
        return text
    if html is None:
        return ""
    return html_to_text(html)
