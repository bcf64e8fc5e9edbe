"""URL canonicalization and URL-based deduplication.

Web-corpus staples the reference lacks: normalize crawl URLs to a
canonical form (lowercase scheme/host, default-port strip, fragment
drop, tracking-parameter removal, trailing-slash normalization) and
keep one row per canonical URL. Vectorized per batch; the dedup
shuffle moves only (canonical_url_hash, id).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ray.data.aggregate import Count, Min

from .hashing import hash_strings

TRACKING_PARAMS = frozenset({
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "ref", "mc_cid", "mc_eid",
})


def canonicalize_url(url: str) -> str:
    """Deterministic canonical form (pure function, reused by tests
    and the SQL oracle via precomputed columns)."""
    from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode

    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower() or "http"
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    if port and not (
        (scheme == "http" and port == 80)
        or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    path = parts.path or "/"
    if path.endswith("/") and len(path) > 1:
        path = path[:-1]
    query = urlencode(
        [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
         if k.lower() not in TRACKING_PARAMS]
    )
    return urlunsplit((scheme, host, path, query, ""))


def canonicalize_urls(
    ds: ray.data.Dataset, *, url_column: str = "url",
    out_column: str = "canonical_url",
) -> ray.data.Dataset:
    def fn(tbl: pa.Table) -> pa.Table:
        urls = tbl.column(url_column).to_pylist()
        canon = [canonicalize_url(u) if u is not None else None
                 for u in urls]
        return tbl.append_column(out_column, pa.array(canon, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def url_duplicates(
    ds: ray.data.Dataset, *, url_column: str = "url",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """One row per canonical URL: (keep_id = min id, n_copies)."""
    canon = canonicalize_urls(ds, url_column=url_column)

    def project(tbl: pa.Table) -> pa.Table:
        c = tbl.column("canonical_url").combine_chunks()
        h1 = hash_strings(c, seed=11)
        h2 = hash_strings(c, seed=12)
        key = [f"{a:016x}{b:016x}" for a, b in zip(h1, h2)]
        return pa.table({"url_hash": pa.array(key, pa.string()),
                         id_column: tbl.column(id_column)})

    agg = (
        canon.map_batches(project, batch_format="pyarrow")
        .groupby("url_hash")
        .aggregate(Min(id_column), Count())
    )
    return agg.map_batches(
        lambda t: pa.table({
            "keep_id": t.column(f"min({id_column})"),
            "n_copies": t.column("count()"),
        }),
        batch_format="pyarrow",
    )
