"""WARC (Web ARChive, ISO 28500) document source.

The reference's web-corpus readers consume pre-extracted JSONL/TSV/SGML
(docs.py:42-125); real web-scale corpora (Common Crawl et al.) ship as
WARC — one gzip member per record so segments are independently
seekable. This module adds a Ray-Data-native WARC reader with the same
output contract as the other document readers (doc_id, lang, text,
date[, url]) plus a deterministic writer used by tests and the
round-trip oracle.

Scale posture: crawl WARC files are ~1 GB each and the standard
processing granularity is one task per file (each gzip member must be
decoded sequentially anyway), so ``read_warc_documents`` maps one parse
task over ``read_binary_files`` — the same shape as the SGML reader.
Parsing is a single forward byte scan per file (no regex over the
payload); only the text extraction touches per-record Python.
"""

from __future__ import annotations

import gzip
import io
import pathlib
from typing import Iterable, Iterator

import pyarrow as pa

import ray.data

from .extract import html_to_text
from .readers import _expand

_CRLF = b"\r\n"


# --------------------------------------------------------------- writer


def build_warc_record(
    record_type: str,
    block: bytes,
    *,
    record_id: str,
    target_uri: str | None = None,
    date: str = "2026-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    """Serialize one WARC/1.0 record (spec §4: version line, named
    fields, CRLF CRLF, block, CRLF CRLF)."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + record_type.encode(),
        b"WARC-Record-ID: <urn:uuid:" + record_id.encode() + b">",
        b"WARC-Date: " + date.encode(),
    ]
    if target_uri is not None:
        headers.append(b"WARC-Target-URI: " + target_uri.encode())
    headers.append(b"Content-Type: " + content_type.encode())
    headers.append(b"Content-Length: " + str(len(block)).encode())
    return _CRLF.join(headers) + _CRLF * 2 + block + _CRLF * 2


def build_http_response(
    payload: bytes,
    *,
    content_type: str = "text/html; charset=utf-8",
    chunked: bool = False,
) -> bytes:
    """Serialize the HTTP response message stored in a ``response``
    record's block (status line + headers + CRLF CRLF + entity)."""
    headers = [
        b"HTTP/1.1 200 OK",
        b"Content-Type: " + content_type.encode(),
    ]
    if chunked:
        headers.append(b"Transfer-Encoding: chunked")
        body = b""
        for i in range(0, len(payload), 1024):
            chunk = payload[i:i + 1024]
            body += f"{len(chunk):x}".encode() + _CRLF + chunk + _CRLF
        body += b"0" + _CRLF * 2
    else:
        headers.append(b"Content-Length: " + str(len(payload)).encode())
        body = payload
    return _CRLF.join(headers) + _CRLF * 2 + body


def write_warc_file(
    records: Iterable[bytes], path: str | pathlib.Path,
    *, compress: bool | None = None,
) -> None:
    """Write records to ``path``; ``.gz`` paths get one gzip member PER
    RECORD (the crawl convention that keeps records independently
    decodable). ``mtime=0`` keeps output byte-deterministic."""
    path = pathlib.Path(path)
    if compress is None:
        compress = path.suffix == ".gz"
    with open(path, "wb") as fp:
        for rec in records:
            fp.write(
                gzip.compress(rec, compresslevel=6, mtime=0)
                if compress else rec
            )


# --------------------------------------------------------------- parser


def _decompress_warc(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        # multi-member stream: GzipFile reads members back to back
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
            return gz.read()
    return data


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, block) per record from raw (possibly gzipped)
    WARC bytes. Header names are lower-cased; values stripped. A single
    forward scan — no per-byte Python, only per-record slicing."""
    data = _decompress_warc(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        sep = 4
        if head_end == -1:
            head_end = data.find(b"\n\n", pos)
            sep = 2
        if head_end == -1:
            return
        head = data[pos:head_end].decode("utf-8", errors="replace")
        lines = head.splitlines()
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(
                f"not a WARC record at byte {pos}: {lines[:1]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        block_start = head_end + sep
        block = data[block_start:block_start + length]
        yield headers, block
        pos = block_start + length


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer encoding."""
    out = io.BytesIO()
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol == -1:
            break
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            break
        if size == 0:
            break
        out.write(body[eol + 2:eol + 2 + size])
        pos = eol + 2 + size + 2  # skip chunk CRLF
    return out.getvalue()


def _charset_of(content_type: str) -> str:
    for part in content_type.split(";")[1:]:
        part = part.strip()
        if part.lower().startswith("charset="):
            return part[8:].strip("\"' ") or "utf-8"
    return "utf-8"


def parse_http_block(block: bytes) -> tuple[str, bytes]:
    """Split an ``application/http`` block into (entity content-type,
    entity bytes), honoring chunked transfer encoding."""
    head_end = block.find(b"\r\n\r\n")
    if head_end == -1:
        return "", block
    headers: dict[str, str] = {}
    for line in block[:head_end].decode(
            "iso-8859-1", errors="replace").splitlines()[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    body = block[head_end + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    return headers.get("content-type", ""), body


_DOC_TYPES = frozenset({"response", "resource", "conversion"})


def warc_records_to_rows(
    data: bytes, lang: str,
    record_types: frozenset[str] = _DOC_TYPES,
) -> pa.Table:
    """Parse one WARC file's bytes into the document-row schema.
    request/warcinfo/metadata records are skipped (they describe the
    crawl, not the content)."""
    ids, texts, dates, urls = [], [], [], []
    for headers, block in iter_warc_records(data):
        if headers.get("warc-type") not in record_types:
            continue
        ctype = headers.get("content-type", "")
        if ctype.split(";")[0].strip().lower() == "application/http":
            ctype, payload = parse_http_block(block)
        else:
            payload = block
        media = ctype.split(";")[0].strip().lower()
        if media in ("text/html", "application/xhtml+xml") or (
                media == "" and payload[:1] == b"<"):
            text = html_to_text(payload)
        else:
            try:
                text = payload.decode(_charset_of(ctype))
            except (UnicodeDecodeError, LookupError):
                text = payload.decode("utf-8", errors="replace")
        rid = headers.get("warc-record-id", "").strip("<>")
        if rid.startswith("urn:uuid:"):
            rid = rid[len("urn:uuid:"):]
        ids.append(rid or headers.get("warc-target-uri", ""))
        texts.append(text)
        dates.append(headers.get("warc-date"))
        urls.append(headers.get("warc-target-uri"))
    return pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "lang": pa.array([lang] * len(ids), pa.string()),
        "text": pa.array(texts, pa.string()),
        "date": pa.array(dates, pa.string()),
        "url": pa.array(urls, pa.string()),
    })


def read_warc_documents(
    paths: str | list[str], lang: str = "eng",
    record_types: Iterable[str] = _DOC_TYPES,
) -> ray.data.Dataset:
    """Read WARC file(s) into the standard document schema
    (doc_id, lang, text, date, url). One parse task per file — the
    crawl-corpus processing granularity; gzip members force a
    sequential decode per file anyway."""
    types = frozenset(record_types)
    files = _expand(paths)
    ds = ray.data.read_binary_files(files)
    return ds.map_batches(
        lambda tbl: pa.concat_tables([
            warc_records_to_rows(payload, lang, types)
            for payload in tbl.column("bytes").to_pylist()
        ]),
        batch_format="pyarrow",
    )
