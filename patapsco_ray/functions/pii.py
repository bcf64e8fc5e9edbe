"""PII detection / redaction over a document table (id, text).

A standard pre-training scrub stage (emails, phone numbers, IP
addresses, US SSNs). Both operators are single `map_batches` stages
built on pyarrow's RE2 kernels — no Python loop over rows, no shuffle;
at 100 TB this is embarrassingly parallel and I/O-bound.

The patterns are RE2 syntax evaluated identically by pyarrow and
DuckDB's regexp functions, so the driver oracle re-runs the SAME
patterns in SQL and value-checks counts AND redacted text.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# RE2-compatible patterns (shared verbatim with the DuckDB oracles).
# Order matters for redaction: emails first (their local part can
# contain digits that phone/ssn patterns would otherwise chew on).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\+?\b[0-9]{1,2}[-. ][0-9]{3}[-. ][0-9]{3}[-. ]?[0-9]{4}\b",
     "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "[IP]"),
]


def pii_counts(
    ds: ray.data.Dataset, *, id_column: str = "doc_id",
    text_column: str = "text",
) -> ray.data.Dataset:
    """Per-document PII match counts: (id, n_email, n_ssn, n_phone,
    n_ipv4). Counts are over the RAW text independently per pattern
    (no cascading), matching ``len(regexp_extract_all(...))``."""

    def fn(tbl: pa.Table) -> pa.Table:
        texts = pc.cast(tbl.column(text_column), pa.string())
        cols = {id_column: tbl.column(id_column)}
        for name, pat, _rep in PII_PATTERNS:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(texts, pat), pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def redact_pii(
    ds: ray.data.Dataset, *, id_column: str = "doc_id",
    text_column: str = "text",
) -> ray.data.Dataset:
    """Replace PII matches with typed placeholders: (id, text) with
    patterns applied in ``PII_PATTERNS`` order (cascading — each
    pattern sees the previous pattern's output, exactly like chained
    ``regexp_replace(..., 'g')`` calls in the oracle)."""

    def fn(tbl: pa.Table) -> pa.Table:
        texts = pc.cast(tbl.column(text_column), pa.string())
        for _name, pat, rep in PII_PATTERNS:
            texts = pc.replace_substring_regex(texts, pat, rep)
        return pa.table({id_column: tbl.column(id_column),
                         text_column: texts})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
