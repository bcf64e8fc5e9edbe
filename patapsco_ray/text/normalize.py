"""Text normalization matching the reference semantics.

Reference: /root/reference/patapsco/util/normalize.py:205-271.
The pre-normalization chain is (in order):

1. ``fix_encoding``  — repair UTF-8-as-latin1/cp1252 mojibake
   (reference delegates to ``ftfy.fix_encoding``; we implement a
   self-contained repair for the common double-encoding cases since
   ftfy is not available in this environment).
2. ``update_spaces`` — collapse any run of non-newline whitespace to a
   single space (regex ``[^\\S\\n]+`` -> " ").
3. ``remove_control_chars`` — drop every non-printable char except
   ``\\n`` (``str.isprintable`` semantics).
4. ``remove_format_chars`` — strip bidi / joiner / variation-selector /
   Arabic-shaping format characters (same ranges as the reference).
5. ``standardize_combining_chars`` — Unicode NFC.

Post-normalization is lowercasing when enabled (default: enabled,
reference schema.py:32-34).

All per-language normalizers in the reference are identical to the
generic one (normalize.py:264-302); we keep a factory seam but a single
implementation.
"""

from __future__ import annotations

import re
import unicodedata

# Format characters removed by the reference normalizer
# (normalize.py:208-213): bidi controls, Arabic shaping controls,
# variation selectors, joiners/non-joiners, NBSP, soft hyphen.
_FORMAT_RANGES = [
    (0x200E, 0x200F),  # LTR/RTL marks
    (0x202A, 0x202E),  # directional embedding/override/pop
    (0x2066, 0x206B),  # isolates + symmetric swapping
    (0x061C, 0x061C),  # Arabic letter mark
    (0x206C, 0x206F),  # Arabic shaping / digit shape selection
    (0xFE01, 0xFE0F),  # variation selectors
    (0x00A0, 0x00A0),  # no-break space
    (0x00AD, 0x00AD),  # soft hyphen
    (0x200B, 0x200D),  # zero-width space / non-joiner / joiner
    (0x2060, 0x2063),  # word joiner .. invisible separator
]

_FORMAT_TRANS = {cp: None for lo, hi in _FORMAT_RANGES for cp in range(lo, hi + 1)}

_SPACES_RE = re.compile(r"[^\S\n]+")

# ASCII fast-path: control chars other than \n are deleted.
_ASCII_CTRL_TRANS = {cp: None for cp in list(range(0x00, 0x0A)) + list(range(0x0B, 0x20)) + [0x7F]}

# cp1252 with the five unassigned bytes mapped to their C1 controls, so
# that any char in U+0000..U+00FF or the cp1252 repertoire encodes.
_SLOPPY_CP1252_ENC = {}
for _b in range(256):
    try:
        _c = bytes([_b]).decode("cp1252")
    except UnicodeDecodeError:
        _c = chr(_b)
    _SLOPPY_CP1252_ENC[_c] = _b

# Chars that suggest UTF-8 bytes were decoded with a single-byte codec:
# a char mapping to a UTF-8 lead byte (0xC2-0xF4) followed by one
# mapping to a continuation byte (0x80-0xBF) is the mojibake signature
# ("\u00e2\u20ac\u2122" for a curly apostrophe, "\u00c3\u00a9" for "\u00e9").
# Both the cp1252 and the raw latin-1 (C1 control) forms are covered.
_LEAD = "".join(re.escape(c) for c, b in _SLOPPY_CP1252_ENC.items() if 0xC2 <= b <= 0xF4)
_CONT = "".join(
    sorted({re.escape(c) for c, b in _SLOPPY_CP1252_ENC.items() if 0x80 <= b <= 0xBF}
           | {re.escape(chr(b)) for b in range(0x80, 0xC0)})
)
_MOJIBAKE_RE = re.compile(f"[{_LEAD}][{_CONT}]")
del _b, _c, _LEAD, _CONT

# Maximal runs of characters that can be mapped back to single bytes
# (latin-1 range or cp1252 repertoire) - candidate spans for repair.
import re as _re
_ENCODABLE_CLASS = "".join(
    sorted({_re.escape(c) for c in _SLOPPY_CP1252_ENC}
           | {_re.escape(chr(i)) for i in range(0x100)})
)
_ENCODABLE_RUN_RE = _re.compile(f"[{_ENCODABLE_CLASS}]+")


def _encode_sloppy_cp1252(text: str) -> bytes | None:
    out = bytearray()
    enc = _SLOPPY_CP1252_ENC
    for ch in text:
        b = enc.get(ch)
        if b is None:
            if ord(ch) < 0x100:
                b = ord(ch)
            else:
                return None
        out.append(b)
    return bytes(out)


def _fix_span(span: str) -> str:
    for _ in range(3):
        if not _MOJIBAKE_RE.search(span):
            return span
        raw = _encode_sloppy_cp1252(span)
        if raw is None:
            return span
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            return span
        if fixed == span:
            return span
        span = fixed
        if span.isascii():
            return span
    return span


def fix_encoding(text: str) -> str:
    """Repair UTF-8 text mistakenly decoded as latin-1/cp1252.

    Mirrors the behavior of ``ftfy.fix_encoding`` for the dominant
    real-world corruption (reference normalize.py:256-258 and its test
    ``test_fix_encoding``: "we\\u00e2\\u0080\\u0099ve" -> "we've" with a
    curly apostrophe). Applied repeatedly to undo double encoding.
    Repair runs per encodable span so that surrounding characters
    outside the latin-1/cp1252 repertoire don't block the fix.
    """
    if text.isascii() or not _MOJIBAKE_RE.search(text):
        return text
    return _ENCODABLE_RUN_RE.sub(lambda m: _fix_span(m.group(0)), text)


def update_spaces(text: str) -> str:
    """Collapse non-newline whitespace runs to one space (normalize.py:228-230)."""
    return _SPACES_RE.sub(" ", text)


def remove_control_chars(text: str) -> str:
    """Drop non-printable chars except newline (normalize.py:236-238)."""
    if text.isascii():
        return text.translate(_ASCII_CTRL_TRANS)
    return "".join(ch for ch in text if ch.isprintable() or ch == "\n")


def remove_format_chars(text: str) -> str:
    """Strip bidi/joiner/format characters (normalize.py:208-213,232-234)."""
    if text.isascii():
        return text
    return text.translate(_FORMAT_TRANS)


def standardize_combining_chars(text: str) -> str:
    """Unicode NFC (normalize.py:244-246)."""
    if text.isascii():
        return text
    return unicodedata.normalize("NFC", text)


class Normalizer:
    """Generic normalizer; all reference language subclasses share this
    behavior (normalize.py:264-302)."""

    def __init__(self, lowercase: bool = True):
        self.lowercase = lowercase

    def pre_normalize(self, text: str) -> str:
        text = fix_encoding(text)
        text = update_spaces(text)
        text = remove_control_chars(text)
        text = remove_format_chars(text)
        return standardize_combining_chars(text)

    def post_normalize(self, text: str) -> str:
        if self.lowercase:
            return text.lower()
        return text


def pre_normalize_batch(texts):
    """Vectorized ``pre_normalize`` over a pyarrow string array.

    ASCII rows (the vast majority of web text after extraction) run
    entirely through Arrow RE2 kernels: for ASCII input the chain
    reduces to collapsing non-newline whitespace runs to one space and
    deleting the remaining control bytes (fix_encoding, format-char
    strip and NFC are identities on ASCII). Non-ASCII rows fall back to
    the per-string Python chain and are scattered back with
    ``replace_with_mask`` — output is byte-identical to calling
    ``Normalizer.pre_normalize`` per row (asserted by
    tests/test_normalize.py::test_pre_normalize_batch_parity).

    Nulls pass through as nulls.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    # ASCII chain: collapse [space \t \x0b \x0c \r]+ -> " ", then drop
    # control bytes that survive the collapse (\n is kept)
    out = pc.replace_substring_regex(
        texts, pattern="[ \t\x0b\x0c\r]+", replacement=" ")
    out = pc.replace_substring_regex(
        out, pattern="[\x00-\x08\x0e-\x1f\x7f]", replacement="")
    non_ascii = pc.fill_null(pc.invert(pc.string_is_ascii(texts)), False)
    if pc.any(non_ascii).as_py():
        import numpy as np

        idx = np.flatnonzero(non_ascii.to_numpy(zero_copy_only=False))
        fixed = [pre_normalize(s)
                 for s in texts.take(pa.array(idx)).to_pylist()]
        out = pc.replace_with_mask(out, non_ascii,
                                   pa.array(fixed, type=out.type))
    return out


def pre_normalize(text: str) -> str:
    """Module-level pre_normalize (the full per-string chain)."""
    text = fix_encoding(text)
    text = update_spaces(text)
    text = remove_control_chars(text)
    text = remove_format_chars(text)
    return standardize_combining_chars(text)


def compare_strings(s1: str, s2: str) -> "collections.Counter[str]":
    """Single-character change report between a raw and normalized
    string (reference util/normalize.py:164-180): counts one-char
    deletions, insertions, and <=2-char -> 1-char replacements.
    Report-only metric — never feeds the token stream."""
    import collections
    import difflib

    changes: collections.Counter[str] = collections.Counter()
    for tag, i1, i2, j1, j2 in difflib.SequenceMatcher(
            None, s1, s2).get_opcodes():
        if tag == "delete" and i2 - i1 == 1:
            changes[f"del {s1[i1:i2]}"] += 1
        elif tag == "replace" and i2 - i1 <= 2 and j2 - j1 == 1:
            changes[f"{s1[i1:i2]} -> {s2[j1:j2]}"] += 1
        elif tag == "insert" and j2 - j1 == 1:
            changes[f"ins {s2[j1:j2]}"] += 1
    return changes


def normalization_report(ds, text_column: str = "text"):
    """Distributed ``normalize_report.txt`` equivalent (reference
    docs.py:250-270): per-batch change Counters (partial aggregation —
    only tiny (change, count) rows cross the shuffle), summed by
    change, sorted by count desc. Rows containing a newline are
    skipped as in the reference writer. Returns a Dataset with columns
    (change, count)."""
    import pyarrow as pa

    schema = pa.schema([("change", pa.string()), ("count", pa.int64())])

    def partial(tbl: pa.Table) -> pa.Table:
        import collections

        import numpy as np
        import pyarrow.compute as pc

        texts = pc.cast(tbl.column(text_column), pa.string())
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        total: collections.Counter[str] = collections.Counter()
        # vectorized gate: pre_normalize_batch (Arrow RE2 fast path,
        # byte-identical to the per-string chain) finds the rows
        # normalization actually changes; only THOSE pay the per-row
        # difflib cost — on clean web text the batch is pure Arrow
        # kernels and the Python loop below runs over ~zero rows
        normed = pre_normalize_batch(texts)
        changed = pc.fill_null(pc.invert(pc.equal(texts, normed)), False)
        for i in np.flatnonzero(
                np.asarray(changed.to_numpy(zero_copy_only=False),
                           dtype=bool)):
            s = texts[int(i)].as_py()
            out = normed[int(i)].as_py()
            total += compare_strings(s, out)
        if not total:
            return schema.empty_table()
        return pa.table({
            "change": [c for c in total if "\n" not in c],
            "count": [n for c, n in total.items() if "\n" not in c],
        }, schema=schema)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("change").sum("count")
        .rename_columns({"sum(count)": "count"})
        .sort("count", descending=True)
    )


# Factory seam kept for parity with NormalizerFactory (normalize.py:183-202).
_LANGS = {"ara", "eng", "fas", "heb", "ind", "kor", "rus", "spa", "zho"}


def create_normalizer(lang: str, lowercase: bool = True) -> Normalizer:
    return Normalizer(lowercase=lowercase)
