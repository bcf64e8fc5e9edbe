"""Parity tests: the vectorized index-build fast path must produce
byte-identical segments to the per-row TextProcessor chain."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from patapsco_ray.text import TextConfig, TextProcessor
from patapsco_ray.text.normalize import Normalizer, pre_normalize_batch

ADVERSARIAL = [
    "plain ascii text with words",
    "  leading   and \t trailing\t whitespace  ",
    "tabs\tand\x0bvertical\x0cfeeds\rand\rcarriage",
    "control\x01chars\x02here\x7fdel",
    "newlines\nare\npreserved\nby normalize",
    "weâ€™ve got mojibake cafÃ© again",
    "ZWJ‍and​ZWSP and NBSP and­soft-hyphen",
    "combining cháracters for NFC",
    "MIXED Case And UPPER",
    "stopword the of and sprinkle",
    "unicode spaces em en thin",
    "bidi ‮override‬ marks‏‎",
    "",
    "x",
    "ligature ﬁnal ﬂow",  # not changed by NFC, exercises non-ascii
    "CJK 中文 空格 测试",
    "emoji 🎉 party 🎊 time",
    "a" * 50,
    "repeat repeat repeat repeat",
    "\x00null\x00bytes\x00",
]


def test_pre_normalize_batch_parity():
    norm = Normalizer()
    arr = pa.array(ADVERSARIAL + [None], pa.string())
    got = pre_normalize_batch(arr).to_pylist()
    want = [norm.pre_normalize(s) for s in ADVERSARIAL] + [None]
    assert got == want


@pytest.mark.parametrize("config", [
    TextConfig(),                                  # default: lucene stopwords
    TextConfig(stopwords=False),
    TextConfig(lowercase=False),
    TextConfig(stopwords=False, lowercase=False),
    TextConfig(stem="porter"),
    TextConfig(stem="porter", lowercase=False),
    TextConfig(stem="porter", stopwords=False),
])
def test_fast_processor_matches_text_processor(config):
    from patapsco_ray.index.fastpath import FastDocProcessor

    proc = TextProcessor(config, "eng")
    fast = FastDocProcessor(config, "eng")
    texts = ADVERSARIAL + ["the of and"]  # stopword-only doc
    batch = pa.table({
        "url": [f"u{i}" for i in range(len(texts))],
        "text": texts,
        "html": pa.array([None] * len(texts), pa.binary()),
    })
    r = fast.process_batch(batch, "url", "text", "html")
    assert r["keep"].all()
    # reconstruct per-doc term multisets from the pair arrays
    got = [dict() for _ in texts]
    vocab = r["dict_strings"]
    for d, c, tf in zip(r["pair_doc"], r["pair_code"], r["pair_tf"]):
        got[d][vocab[c]] = int(tf)
    for i, text in enumerate(texts):
        processed = proc.process(text)
        terms = processed.split()
        want = {}
        for t in terms:
            want[t] = want.get(t, 0) + 1
        assert got[i] == want, (i, text, got[i], want)
        assert r["dl"][i] == len(terms)


def test_fast_processor_rejects_and_html(ray_session):
    from patapsco_ray.index.fastpath import FastDocProcessor

    fast = FastDocProcessor(TextConfig(), "eng")
    batch = pa.table({
        "url": ["a", "b", "c"],
        "text": ["short doc", "x" * 1_000_001, ""],
        "html": pa.array(
            [None, None, b"<html><title>T1</title>"
             b"<body>unique bodyterm</body></html>"], pa.binary()),
    })
    r = fast.process_batch(batch, "url", "text", "html")
    assert r["keep"].tolist() == [True, False, True]
    # html row extracted: title + body terms present
    got_terms = set()
    for d, c in zip(r["pair_doc"], r["pair_code"]):
        if d == 1:  # kept-row index of "c"
            got_terms.add(r["dict_strings"][c])
    assert {"t1", "unique", "bodyterm"} <= got_terms


def _adversarial_corpus(tmp_path, nfiles=2):
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "the", "of", "Zeta", "café",
             "weâ€™ve", "mixedCASE", "term123"]
    paths = []
    for f in range(nfiles):
        n = 300
        texts, htmls = [], []
        for i in range(n):
            k = int(rng.integers(3, 40))
            toks = list(rng.choice(words, size=k))
            if i % 17 == 0:
                toks.append("ctrl\x01char")
            if i % 23 == 0:
                toks.append("nb sp")
            text = " ".join(toks)
            if i % 11 == 0:
                htmls.append(
                    f"<html><title>Ti {i}</title><body>{text}"
                    f"</body></html>".encode())
                texts.append("")
            else:
                htmls.append(None)
                texts.append(text)
        t = pa.table({
            "url": [f"http://x/{f}/{i}" for i in range(n)],
            "text": texts,
            "html": pa.array(htmls, pa.binary()),
        })
        p = tmp_path / f"part-{f}.parquet"
        pq.write_table(t, p, row_group_size=100)
        paths.append(str(p))
    return paths


@pytest.mark.parametrize("config", [
    TextConfig(),
    TextConfig(stopwords=False, lowercase=False),
    TextConfig(stem="porter"),
])
def test_build_index_fast_slow_identical(ray_session, tmp_path, config):
    """End-to-end: segments built by the vectorized path are
    byte-identical (terms + docs tables) to the per-row path."""
    from patapsco_ray.index import build_index

    (tmp_path / "corpus").mkdir(exist_ok=True)
    paths = _adversarial_corpus(tmp_path / "corpus", 2)
    m_fast = build_index(paths, tmp_path / "idx_fast", text_config=config,
                         rows_per_segment=200, vectorize=True)
    m_slow = build_index(paths, tmp_path / "idx_slow", text_config=config,
                         rows_per_segment=200, vectorize=False)
    assert [s["seg_id"] for s in m_fast["segments"]] == \
        [s["seg_id"] for s in m_slow["segments"]]
    assert m_fast["ndocs"] == m_slow["ndocs"]
    assert m_fast["total_tf"] == m_slow["total_tf"]
    for s in m_fast["segments"]:
        sid = s["seg_id"]
        tf = pq.read_table(tmp_path / "idx_fast" / f"seg={sid}"
                           / "terms.parquet")
        ts = pq.read_table(tmp_path / "idx_slow" / f"seg={sid}"
                           / "terms.parquet")
        assert tf.equals(ts), f"terms mismatch in seg {sid}"
        df = pq.read_table(tmp_path / "idx_fast" / f"seg={sid}"
                           / "docs.parquet")
        ds_ = pq.read_table(tmp_path / "idx_slow" / f"seg={sid}"
                            / "docs.parquet")
        assert df.equals(ds_), f"docs mismatch in seg {sid}"


def test_build_index_fast_rejects_overlength(ray_session, tmp_path):
    from patapsco_ray.index import build_index

    t = pa.table({
        "url": ["keep", "drop", "keep2"],
        "text": ["normal words here", "y" * 1_000_001, "more words"],
        "html": pa.array([None, None, None], pa.binary()),
    })
    p = tmp_path / "c.parquet"
    pq.write_table(t, p)
    m = build_index([str(p)], tmp_path / "idx", vectorize=True)
    assert m["ndocs"] == 2
    assert m["segments"][0]["rejected"] == 1


def test_shuffle_build_fast_slow_identical(ray_session, tmp_path):
    """The vectorized FragmentEmitter must yield the same merged index
    as the per-row path (terms + docs tables equal)."""
    from patapsco_ray.index import build_index_shuffle

    (tmp_path / "corpus").mkdir(exist_ok=True)
    paths = _adversarial_corpus(tmp_path / "corpus", 2)
    m_f = build_index_shuffle(paths, tmp_path / "sf", rows_per_block=200,
                              salt_range_rows=128, vectorize=True)
    m_s = build_index_shuffle(paths, tmp_path / "ss", rows_per_block=200,
                              salt_range_rows=128, vectorize=False)
    assert m_f["ndocs"] == m_s["ndocs"]
    assert m_f["total_tf"] == m_s["total_tf"]
    from patapsco_ray.index.segment import read_docs, read_terms
    tf = read_terms(tmp_path / "sf", "g00000")
    ts = read_terms(tmp_path / "ss", "g00000")
    assert tf.equals(ts)
    df = read_docs(tmp_path / "sf", "g00000")
    ds_ = read_docs(tmp_path / "ss", "g00000")
    assert df.equals(ds_)


def test_ascii_split_matches_python_split_on_unicode_ws():
    """Guards the ascii_split_whitespace choice: after
    _pre_normalize_for_tokens, every Unicode whitespace char has been
    collapsed to ASCII space (or the row was ASCII all along), so the
    ASCII kernel must produce exactly Python str.split() tokens."""
    import pyarrow.compute as pc

    from patapsco_ray.index.fastpath import _pre_normalize_for_tokens
    from patapsco_ray.text.normalize import pre_normalize

    NBSP, LSEP, PSEP = chr(0xA0), chr(0x2028), chr(0x2029)
    NEL, IDEO, THIN = chr(0x85), chr(0x3000), chr(0x2009)
    rows = [
        f"a{NBSP}b", f"x{LSEP}y", f"p{PSEP}q", f"n{NEL}m", f"t{IDEO}u",
        f"thin{THIN}space", f"nbsp{NBSP}{NBSP}run of{NBSP}them",
        f"{NBSP}leading and trailing{NBSP}", "ctl\x01here", "", "solo",
    ]
    norm = _pre_normalize_for_tokens(pa.array(rows, pa.string()))
    got = pc.ascii_split_whitespace(norm).to_pylist()
    for r, toks in zip(rows, got):
        assert [t for t in toks if t != ""] == pre_normalize(r).split(), r
