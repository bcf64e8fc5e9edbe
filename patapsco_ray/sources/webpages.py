"""Deterministic synthetic Common-Crawl-style web-page tables.

Schema per the driver's input hint (BASELINE.json):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Used by tests and bench.py (BASELINE.md protocol: fixed seed, no
external data). Token frequencies are Zipf-distributed over a synthetic
vocabulary so df/idf and BM25 rankings are non-trivial; a sample of
rows carries html (with the text column empty) to exercise the
extraction fallback, and a few rows carry mojibake / format characters
to exercise normalization.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 30_000
MEAN_DOC_TOKENS = 120


def _vocab(size: int = VOCAB_SIZE) -> list[str]:
    # small head of common-looking words + synthetic tail
    head = (
        "the of and to in a is that for it with as was on be at by this "
        "from are or an they which you had not were his have but has when "
        "all one their there been if more out so said what up its about "
        "into than them can only other new some could time these two may "
        "then do first any my now such like our over man me even most made "
        "after also did many before must through years where much your way "
        "well down should because each just those people how too little "
        "state good very make world still own see men work long get here "
        "between both life being under never day same another know while "
        "last might us great old year off come since against go came right "
        "used take three"
    ).split()
    tail = [f"term{i:05d}" for i in range(size - len(head))]
    return head + tail


def _zipf_probs(size: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    return p / p.sum()


def generate_webpages(
    out_dir: str | pathlib.Path,
    num_rows: int,
    *,
    seed: int = 42,
    num_files: int = 8,
    html_fraction: float = 0.05,
    lang: str = "eng",
) -> list[str]:
    """Write a deterministic synthetic web-page parquet dataset.

    Returns the list of file paths written. Files are written one at a
    time with independent per-file RNG streams so any subset is
    reproducible.
    """
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    vocab = np.array(_vocab(), dtype=object)
    probs = _zipf_probs(len(vocab))
    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    paths = []
    rows_per_file = (num_rows + num_files - 1) // num_files
    row0 = 0
    for fi in range(num_files):
        n = min(rows_per_file, num_rows - row0)
        if n <= 0:
            break
        rng = np.random.default_rng(seed * 1_000_003 + fi)
        lengths = np.maximum(
            5, rng.lognormal(np.log(MEAN_DOC_TOKENS), 0.6, size=n).astype(np.int64)
        )
        total = int(lengths.sum())
        tok_idx = rng.choice(len(vocab), size=total, p=probs)
        toks = vocab[tok_idx]
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        texts = [
            " ".join(toks[offsets[i]:offsets[i + 1]]) for i in range(n)
        ]
        # sprinkle normalization challenges deterministically
        for i in range(0, n, 997):
            texts[i] = texts[i] + " caf" + chr(0xC3) + chr(0xA9) + "\t\ttabbed"
        urls = [f"https://example.org/{seed}/{fi:04d}/{row0 + i:09d}.html"
                for i in range(n)]
        ts = base_ts + (np.arange(row0, row0 + n) * 1_000_000).astype("timedelta64[us]")
        html_mask = rng.random(n) < html_fraction
        htmls: list[bytes | None] = [None] * n
        out_texts = list(texts)
        for i in np.flatnonzero(html_mask):
            words = texts[i].split()
            title = " ".join(words[:4])
            body = " ".join(words[4:])
            htmls[i] = (
                f"<html><head><title>{title}</title></head>"
                f"<body><p>{body}</p></body></html>"
            ).encode("utf8")
            out_texts[i] = ""  # force extraction from html
        table = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(out_texts, pa.string()),
                "lang": pa.array([lang] * n, pa.string()),
            }
        )
        path = out_dir / f"pages-{fi:05d}.parquet"
        pq.write_table(table, path, row_group_size=2048)
        paths.append(str(path))
        row0 += n
    return paths
