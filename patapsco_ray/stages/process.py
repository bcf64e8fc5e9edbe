"""Document processing as a Ray Data stage.

The reference's DocumentProcessor.process (docs.py:221-259): reject
over-length docs, pre-normalize, stash the normalized original text
for the database, tokenize / stopword / stem, lowercase-join. Here it
is an actor-pool ``map_batches`` class over zero-copy Arrow batches;
the text chain state (stopword sets, stemmer memo, compiled regexes)
is built once per actor in ``__init__``.

Output columns: ``doc_id`` (string), ``original_text`` (the
pre-tokenization normalized text the reference stores in its doc
database, database.py:98-100), ``text`` (the processed/searchable
text, = DocWriter's documents.jsonl payload, docs.py:161-192).
Rejected docs are dropped (process() -> None, pipeline.py:171-172).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..util import fixed_pool

from ..sources.extract import extract_text
from ..text import TextConfig, TextProcessor


class DocumentProcessor:
    def __init__(
        self,
        text_config: TextConfig = TextConfig(),
        lang: str = "eng",
        id_column: str = "url",
        text_column: str = "text",
        html_column: str | None = "html",
    ):
        self.processor = TextProcessor(text_config, lang)
        self.id_column = id_column
        self.text_column = text_column
        self.html_column = html_column

    def __call__(self, tbl: pa.Table) -> pa.Table:
        names = tbl.schema.names
        ids = tbl.column(self.id_column).to_pylist()
        texts = (
            tbl.column(self.text_column).to_pylist()
            if self.text_column in names
            else [None] * len(ids)
        )
        htmls = (
            tbl.column(self.html_column).to_pylist()
            if self.html_column and self.html_column in names
            else [None] * len(ids)
        )
        raw = [extract_text(t, h) for t, h in zip(texts, htmls)]
        normalized, processed = self.processor.process_batch(raw)
        out_id, out_orig, out_text = [], [], []
        for i, n, p in zip(ids, normalized, processed):
            if p is None:  # over-length rejection (docs.py:245-247)
                continue
            out_id.append(str(i))
            out_orig.append(n)
            out_text.append(p)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.string()),
                "original_text": pa.array(out_orig, pa.large_string()),
                "text": pa.array(out_text, pa.large_string()),
            }
        )


def process_documents(
    ds: ray.data.Dataset,
    *,
    text_config: TextConfig = TextConfig(),
    lang: str = "eng",
    id_column: str = "url",
    text_column: str = "text",
    html_column: str | None = "html",
    concurrency: int | tuple[int, int] = (2, 8),
    batch_size: int = 1024,
) -> ray.data.Dataset:
    return ds.map_batches(
        DocumentProcessor,
        fn_constructor_kwargs={
            "text_config": text_config,
            "lang": lang,
            "id_column": id_column,
            "text_column": text_column,
            "html_column": html_column,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=fixed_pool(concurrency),
        batch_size=batch_size,
    )
