"""WARC source reader tests (ISO 28500 record grammar, HTTP payload
extraction, gzip-member layout, Ray Dataset contract)."""

import gzip

import pyarrow as pa
import pytest

from patapsco_ray.sources.warc import (
    build_http_response,
    build_warc_record,
    iter_warc_records,
    parse_http_block,
    read_warc_documents,
    warc_records_to_rows,
    write_warc_file,
)


def _response_record(i: int, html: bytes, **kw) -> bytes:
    return build_warc_record(
        "response",
        build_http_response(html, **kw),
        record_id=f"{i:08d}",
        target_uri=f"http://example.org/doc/{i}",
    )


HTML = (b"<html><head><title>T%d</title></head>"
        b"<body><p>hello world %d</p></body></html>")


def test_record_grammar_roundtrip():
    recs = [_response_record(i, HTML % (i, i)) for i in range(5)]
    parsed = list(iter_warc_records(b"".join(recs)))
    assert len(parsed) == 5
    h0, block0 = parsed[0]
    assert h0["warc-type"] == "response"
    assert h0["warc-record-id"] == "<urn:uuid:00000000>"
    assert h0["warc-target-uri"] == "http://example.org/doc/0"
    assert int(h0["content-length"]) == len(block0)


def test_gzip_member_per_record(tmp_path):
    recs = [_response_record(i, HTML % (i, i)) for i in range(3)]
    p = tmp_path / "f.warc.gz"
    write_warc_file(recs, p)
    raw = p.read_bytes()
    # one gzip member per record: the magic appears 3 times at member
    # boundaries (decompress-and-count is the robust check)
    assert raw[:2] == b"\x1f\x8b"
    assert len(list(iter_warc_records(raw))) == 3
    # deterministic output (mtime=0)
    p2 = tmp_path / "g.warc.gz"
    write_warc_file(recs, p2)
    assert raw == p2.read_bytes()


def test_http_block_parse_plain_and_chunked():
    payload = b"x" * 3000
    ct, body = parse_http_block(build_http_response(
        payload, content_type="text/plain"))
    assert ct == "text/plain" and body == payload
    ct, body = parse_http_block(build_http_response(
        payload, content_type="text/plain", chunked=True))
    assert ct == "text/plain" and body == payload


def test_rows_extraction_and_type_filter():
    recs = [
        build_warc_record(
            "warcinfo", b"software: test", record_id="info",
            content_type="application/warc-fields"),
        _response_record(1, HTML % (1, 1)),
        build_warc_record(
            "request", b"GET / HTTP/1.1\r\n\r\n", record_id="req",
            target_uri="http://example.org/doc/1",
            content_type="application/http; msgtype=request"),
        build_warc_record(
            "conversion", "plain text é".encode("utf-8"),
            record_id="conv", target_uri="http://example.org/conv",
            content_type="text/plain; charset=utf-8"),
    ]
    tbl = warc_records_to_rows(b"".join(recs), "eng")
    assert tbl.num_rows == 2  # warcinfo + request skipped
    rows = tbl.to_pylist()
    assert rows[0]["doc_id"] == "00000001"
    assert rows[0]["text"] == "T1 hello world 1"
    assert rows[0]["url"] == "http://example.org/doc/1"
    assert rows[1]["text"] == "plain text é"
    assert rows[1]["lang"] == "eng"


def test_charset_and_bad_bytes():
    rec = build_warc_record(
        "resource", "café".encode("latin-1"), record_id="r1",
        content_type="text/plain; charset=iso-8859-1")
    tbl = warc_records_to_rows(rec, "fra")
    assert tbl.to_pylist()[0]["text"] == "café"
    # undecodable bytes degrade to replacement, never raise
    rec2 = build_warc_record(
        "resource", b"\xff\xfe\xfd", record_id="r2",
        content_type="text/plain; charset=utf-8")
    assert "�" in warc_records_to_rows(rec2, "eng").to_pylist()[0]["text"]


def test_non_warc_bytes_raise():
    with pytest.raises(ValueError, match="not a WARC record"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_read_warc_documents_dataset(ray_session, tmp_path):
    for f in range(2):
        write_warc_file(
            [_response_record(f * 10 + i, HTML % (f * 10 + i, f * 10 + i))
             for i in range(4)],
            tmp_path / f"part-{f}.warc.gz")
    ds = read_warc_documents(str(tmp_path / "*.warc.gz"), lang="eng")
    tbl = pa.concat_tables(
        [pa.Table.from_pandas(ds.to_pandas())]).sort_by("doc_id")
    assert tbl.num_rows == 8
    assert tbl.schema.names == ["doc_id", "lang", "text", "date", "url"]
    assert tbl.to_pylist()[0]["text"] == "T0 hello world 0"


def test_plain_uncompressed_file(ray_session, tmp_path):
    p = tmp_path / "plain.warc"
    write_warc_file([_response_record(7, HTML % (7, 7))], p)
    assert p.read_bytes()[:5] == b"WARC/"
    ds = read_warc_documents(str(p))
    assert ds.count() == 1
