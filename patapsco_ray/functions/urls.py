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


def extract_hosts(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """URL column -> normalized host column, pure RE2 kernels (the
    identical chain runs in the DuckDB oracle): text after ``://`` cut
    at the first ``/?#``, lowercased, userinfo / port / leading
    ``www.`` stripped. Empty string when no scheme is present."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(pc.cast(col, pa.string()), "")
    h = pc.replace_substring_regex(col, r"^[A-Za-z][A-Za-z0-9+.-]*://",
                                   "\x01", max_replacements=1)
    # rows that had no scheme keep their original text: blank them
    had = pc.starts_with(h, "\x01")
    h = pc.if_else(had, pc.replace_substring(h, "\x01", "",
                                             max_replacements=1),
                   pa.scalar("", pa.string()))
    h = pc.replace_substring_regex(h, r"[/?#].*$", "")
    h = pc.utf8_lower(h)
    h = pc.replace_substring_regex(h, r"^.*@", "")
    h = pc.replace_substring_regex(h, r":[0-9]+$", "")
    h = pc.replace_substring_regex(h, r"^www\.", "")
    return h


def host_stats(
    ds: ray.data.Dataset, *, url_column: str = "url",
    text_column: str | None = "text",
) -> ray.data.Dataset:
    """Per-host corpus statistics: (host, n_docs[, total_chars]).

    The 100-TB shape: per-batch PARTIAL aggregation (Arrow group_by
    inside the map stage) so only one row per (batch, host) crosses
    the shuffle, then a global ``groupby(host).sum`` — the standard
    combiner pattern; host cardinality, not corpus size, bounds the
    exchange."""
    import pyarrow.compute as pc

    has_text = text_column is not None

    def partial(tbl: pa.Table) -> pa.Table:
        host = extract_hosts(tbl.column(url_column))
        cols = {"host": host}
        if has_text:
            txt = pc.fill_null(pc.cast(tbl.column(text_column),
                                       pa.string()), "")
            cols["chars"] = pc.cast(pc.utf8_length(txt), pa.int64())
        t = pa.table(cols)
        aggs = [([], "count_all")] + ([("chars", "sum")] if has_text
                                      else [])
        g = t.group_by(["host"]).aggregate(aggs)
        out = {"host": g.column("host"),
               "n_docs": pc.cast(g.column("count_all"), pa.int64())}
        if has_text:
            out["total_chars"] = pc.cast(g.column("chars_sum"), pa.int64())
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    gb = parts.groupby("host")
    agg = gb.sum(["n_docs", "total_chars"]) if has_text else \
        gb.sum(["n_docs"])

    def finish(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("host", pa.string()), ("n_docs", pa.int64())]
            + ([("total_chars", pa.int64())] if has_text else []))
        if t.num_rows == 0:  # schema-less empty shuffle partitions
            return schema.empty_table()
        cols = {"host": t.column("host"),
                "n_docs": t.column("sum(n_docs)")}
        if has_text:
            cols["total_chars"] = t.column("sum(total_chars)")
        return pa.table(cols, schema=schema)

    return agg.map_batches(finish, batch_format="pyarrow")


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
