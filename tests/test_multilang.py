"""Multi-language pipelines: per-language stopwords, CJK n-gram
tokenization, end-to-end build + search per language."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from patapsco_ray.index import build_index
from patapsco_ray.search import IndexSearcher
from patapsco_ray.text import TextConfig, TextProcessor
from patapsco_ray.text.stopwords import load_stopwords
from patapsco_ray.text.tokenize import NgramTokenizer


def test_stopword_coverage_langs():
    for lang in ("ara", "eng", "fas", "heb", "ind", "kor", "rus", "spa",
                 "zho"):
        assert len(load_stopwords("lucene", lang)) > 10, lang
    assert len(load_stopwords("baidu", "zho")) > 10


def test_russian_chain():
    proc = TextProcessor(TextConfig(stopwords="lucene", stem=False), "rus")
    out = proc.process("И Новый Тест Не Системы")
    # "и"/"не" are Lucene Russian stopwords (identified case-insensitively
    # pre-stem); the rest lowercased
    assert "и" not in out.split() and "не" not in out.split()
    assert "новый" in out.split()


def test_ngram_tokenizer_cjk():
    tok = NgramTokenizer("zho")
    assert tok.n == 2
    grams = tok.tokenize("中文测试")
    assert grams == ["中文", "文测", "测试"]
    # sentence boundary resets the window: no gram spans the boundary
    # (terminal punctuation stays inside its sentence, like spaCy sents)
    grams2 = tok.tokenize("中文。测试")
    assert "。测" not in grams2
    assert grams2 == ["中文", "文。", "测试"]


def test_ngram_tokenizer_default_n5():
    tok = NgramTokenizer("eng")
    assert tok.n == 5
    assert tok.tokenize("abcdefg") == ["abcde", "bcdef", "cdefg"]
    assert tok.tokenize("abc") == ["abc"]


@pytest.mark.parametrize("lang,cfg,docs,query,expect_top", [
    ("rus", TextConfig(stopwords="lucene", stem=False),
     [("r1", "новый поиск по тексту"), ("r2", "старый архив документов"),
      ("r3", "поиск поиск поиск")],
     "поиск", "r3"),
    ("zho", TextConfig(tokenize="ngram", stopwords=False, stem=False),
     [("z1", "中文信息检索系统"), ("z2", "天气预报系统"), ("z3", "信息检索 信息检索")],
     "信息检索", "z3"),
])
def test_end_to_end_per_language(ray_session, tmp_path, lang, cfg, docs,
                                 query, expect_top):
    pq.write_table(
        pa.table({"doc_id": [d for d, _ in docs],
                  "text": [t for _, t in docs]}),
        tmp_path / "docs.parquet",
    )
    idx = tmp_path / "idx"
    m = build_index(str(tmp_path / "docs.parquet"), idx, text_config=cfg,
                    lang=lang, id_column="doc_id", html_column=None)
    assert m["lang"] == lang
    s = IndexSearcher(idx)
    hits = s.search(query, k=3)
    assert hits and hits[0]["doc_id"] == expect_top
