"""URL canonicalization/dedup and the quality filter gate."""

import duckdb
import pyarrow as pa
import pytest

import ray.data

from patapsco_ray.functions import (
    canonicalize_url,
    canonicalize_urls,
    quality_filter,
    url_duplicates,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_canonicalize_url_rules():
    assert canonicalize_url("HTTP://Example.COM:80/a/b/") == \
        "http://example.com/a/b"
    assert canonicalize_url("https://example.com:8443/x") == \
        "https://example.com:8443/x"
    assert canonicalize_url(
        "https://ex.org/p?utm_source=tw&id=3&fbclid=z#frag") == \
        "https://ex.org/p?id=3"
    assert canonicalize_url("https://ex.org") == "https://ex.org/"


def test_canonicalize_urls_batch(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "url": ["HTTP://A.com/", "http://a.com", None],
        "doc_id": [1, 2, 3],
    }))
    got = canonicalize_urls(ds).to_pandas()
    assert got["canonical_url"].tolist()[:2] == ["http://a.com/",
                                                 "http://a.com/"]
    assert got["canonical_url"].isna().tolist() == [False, False, True]


def test_url_duplicates(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "url": ["http://a.com/x?utm_source=1", "http://A.COM/x",
                "http://b.com/", "http://a.com/x/"],
        "doc_id": [5, 2, 3, 9],
    }))
    got = url_duplicates(ds).to_pandas().sort_values("keep_id")
    assert got["keep_id"].tolist() == [2, 3]
    assert got["n_copies"].tolist() == [3, 1]


def test_quality_filter_vs_sql(ray_session):
    from patapsco_ray.text.stopwords import load_stopwords

    ds = ray.data.read_parquet(DOCS)
    got = quality_filter(ds, min_tokens=20, max_stopword_ratio=0.5,
                         min_unique_ratio=0.3).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    sw = ",".join(f"'{w}'" for w in sorted(load_stopwords("lucene", "eng")))
    want = duckdb.sql(f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split(lower(text),' '),
            x -> x <> '')) AS term FROM '{DOCS}'),
        sig AS (
          SELECT d.doc_id, count(t.term) AS n_tokens,
            count(DISTINCT t.term) AS nu,
            count(CASE WHEN t.term IN ({sw}) THEN 1 END) AS nsw
          FROM '{DOCS}' d LEFT JOIN toks t USING (doc_id)
          GROUP BY d.doc_id)
        SELECT doc_id, n_tokens FROM sig
        WHERE n_tokens >= 20 AND nsw*1.0/n_tokens <= 0.5
          AND nu*1.0/n_tokens >= 0.3
        ORDER BY doc_id""").df()
    assert len(got) == len(want) > 0
    assert (got["doc_id"].values == want["doc_id"].values).all()
    assert (got["n_tokens"].values == want["n_tokens"].values).all()


def test_extract_hosts_edge_cases(ray_session):
    import pyarrow as pa

    from patapsco_ray.functions import extract_hosts

    urls = pa.array([
        "https://WWW.Example.ORG/path",        # www + case
        "http://user:pw@site.com:8080/x?y#z",  # userinfo + port
        "https://example.com",                 # bare host
        "ftp://Files.example.net:21/a",        # other scheme
        "no-scheme.example.com/path",          # no scheme -> empty
        "https://host.com:443/",               # port stripped (any port)
        None,                                  # null -> empty
        "",                                    # empty -> empty
    ])
    got = extract_hosts(urls).to_pylist()
    assert got == ["example.org", "site.com", "example.com",
                   "files.example.net", "", "host.com", "", ""]


def test_host_stats(ray_session):
    import pyarrow as pa
    import ray.data

    from patapsco_ray.functions import host_stats

    tbl = pa.table({
        "url": ["https://a.com/1", "https://WWW.A.com/2", "http://b.org/",
                "https://a.com:9999/3"],
        "text": ["xx", "yyy", "z", "wwww"],
    })
    got = host_stats(ray.data.from_arrow(tbl)).to_pandas()
    got = got.sort_values("host").reset_index(drop=True)
    assert got["host"].tolist() == ["a.com", "b.org"]
    assert got["n_docs"].tolist() == [3, 1]
    assert got["total_chars"].tolist() == [2 + 3 + 4, 1]
    # url-only mode
    lo = host_stats(ray.data.from_arrow(tbl), text_column=None).to_pandas()
    assert sorted(lo.columns) == ["host", "n_docs"]
