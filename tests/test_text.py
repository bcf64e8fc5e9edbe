"""Tokenizer / stemmer / stopword golden tests.

Mirrors /root/reference/tests/test_text.py (whitespace + porter +
lucene stopwords — the reference's default pipeline config).
"""
import pytest

from patapsco_ray.text import (
    NgramTokenizer,
    PorterStemmer,
    StopWordsRemover,
    TextConfig,
    TextProcessor,
    WhiteSpaceTokenizer,
    create_tokenizer,
)


def test_stop_words_english():
    swr = StopWordsRemover("lucene", "eng")
    tokens = ["this", "is", "a", "test"]
    assert swr.remove(tokens, swr.identify(tokens)) == ["test"]


def test_stop_words_english_uppercase():
    swr = StopWordsRemover("lucene", "eng")
    tokens = ["This", "is", "a", "test"]
    assert swr.remove(tokens, swr.identify(tokens, is_lower=True)) == ["This", "test"]


def test_stop_words_english_caseless():
    swr = StopWordsRemover("lucene", "eng")
    tokens = ["This", "is", "a", "test"]
    assert swr.remove(tokens, swr.identify(tokens, is_lower=False)) == ["test"]


def test_stop_words_indonesian():
    swr = StopWordsRemover("lucene", "ind")
    tokens = ["antar", "belanja"]
    assert swr.remove(tokens, swr.identify(tokens)) == ["belanja"]


def test_porter_stemmer_english():
    # reference tests/test_text.py:38-43 golden
    tokens = ["It", "was", "a", "bright", "cold", "day", "in", "April", ",",
              "and", "the", "clocks", "were", "striking", "thirteen", "."]
    ans = ["It", "wa", "a", "bright", "cold", "day", "in", "April", ",",
           "and", "the", "clock", "were", "strike", "thirteen", "."]
    assert PorterStemmer("eng").stem(tokens) == ans


def test_porter_stemmer_long_token():
    # reference tests/test_text.py:46-50: a huge consonant-chain token
    # trips the recursive y/consonant check and is returned unchanged
    tok = "h" + "y" * 2000
    assert PorterStemmer("eng").stem_word(tok) == tok


def test_porter_classic_vocabulary():
    pairs = {
        "caresses": "caress", "ponies": "poni", "ties": "tie",
        "cats": "cat", "feed": "feed", "agreed": "agre",
        "plastered": "plaster", "motoring": "motor", "hopping": "hop",
        "falling": "fall", "filing": "file", "happy": "happi",
        "sky": "sky", "dying": "die", "died": "die", "day": "day",
        "relational": "relat", "operator": "oper", "electrical": "electr",
        "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
        "flooding": "flood", "articles": "articl",
    }
    p = PorterStemmer("eng")
    for w, want in pairs.items():
        assert p.stem_word(w) == want, w


def test_porter_rejects_other_languages():
    with pytest.raises(ValueError):
        PorterStemmer("fra")


def test_farsi_stemmer_fallback():
    from patapsco_ray.text.stem import FarsiStemmer, create_stemmer

    s = FarsiStemmer("fas")
    # plural ها with and without ZWNJ strips to the noun stem
    assert s.stem_word("کتاب‌ها") == "کتاب"
    assert s.stem_word("کتابها") == "کتاب"
    assert s.stem_word("بهترین") == "به"
    # short tokens never shrink below two letters
    assert s.stem_word("ها") == "ها"
    # only Farsi is accepted (reference text.py:58-60)
    with pytest.raises(ValueError):
        FarsiStemmer("eng")
    # registry wires the cached variant
    st = create_stemmer("parsivar", "fas")
    assert st.stem(["کتاب‌ها", "ها"]) == ["کتاب", "ها"]


def test_whitespace_tokenizer():
    assert WhiteSpaceTokenizer("eng").tokenize("a  b\tc") == ["a", "b", "c"]


def test_ngram_tokenizer():
    # reference tests/test_text.py ngram golden (sentence-split + 5-grams)
    text = "Roses are red. Violets are blue."
    ans = [
        "Roses", "oses ", "ses a", "es ar", "s are", " are ", "are r",
        "re re", "e red", " red.",
        "Viole", "iolet", "olets", "lets ", "ets a", "ts ar", "s are",
        " are ", "are b", "re bl", "e blu", " blue", "blue.",
    ]
    assert NgramTokenizer("eng").tokenize(text) == ans


def test_unknown_tokenizer():
    with pytest.raises(ValueError):
        create_tokenizer("stanford", "eng")


def test_unavailable_tokenizer_seam():
    with pytest.raises(NotImplementedError):
        create_tokenizer("stanza", "eng")


def test_processor_chain_order():
    # stopwords identified pre-stem, removed post-stem
    # (reference docs.py:253-256): "This is a test" with porter:
    # "this"->"thi" after stem, but it was identified as a stopword
    # BEFORE stemming so it is still removed.
    proc = TextProcessor(TextConfig(stem="porter"), "eng")
    assert proc.process("This is a test of clocks striking") == \
        "test clock strike"


def test_processor_rejects_long_doc():
    proc = TextProcessor(TextConfig(), "eng")
    assert proc.process("x" * 1_000_001) is None


def test_processor_query_doc_identical():
    cfg = TextConfig(stem="porter")
    proc = TextProcessor(cfg, "eng")
    assert proc.process("Flooding") == "flood"
    assert proc.process("Articles related to floods.") == "articl relat floods."


class TestMosesFallback:
    """Rule-based Moses fallback (sacremoses absent here); goldens are
    the reference's own test cases (reference tests/test_text.py:
    279-305)."""

    def test_english(self):
        from patapsco_ray.text.tokenize import MosesTokenizer

        text = "Mary had a little lamb. It's fleece was white as snow."
        ans = ["Mary", "had", "a", "little", "lamb", ".",
               "It", "'s", "fleece", "was", "white", "as", "snow", "."]
        assert MosesTokenizer(lang="eng").tokenize(text) == ans

    def test_arabic(self):
        from patapsco_ray.text.tokenize import MosesTokenizer

        text = ("تمول النفقات الجديدة من خلال حساب كلينتون المصرفي "
                "الكبير. الحد الأقصى المسموح به للشخص الواحد هو 5000 "
                "دولار.")
        ans = ["تمول", "النفقات", "الجديدة", "من", "خلال", "حساب",
               "كلينتون", "المصرفي", "الكبير", ".", "الحد", "الأقصى",
               "المسموح", "به", "للشخص", "الواحد", "هو", "5000",
               "دولار", "."]
        assert MosesTokenizer(lang="ara").tokenize(text) == ans

    def test_rejects_chinese(self):
        from patapsco_ray.text.tokenize import MosesTokenizer
        import pytest as _pytest

        with _pytest.raises(ValueError):
            MosesTokenizer(lang="zho")


class TestJiebaFallback:
    def test_zho_only(self):
        from patapsco_ray.text.tokenize import JiebaTokenizer
        import pytest as _pytest

        with _pytest.raises(ValueError):
            JiebaTokenizer(lang="spa")  # reference tests/test_text.py:274

    def test_bigram_fallback(self):
        from patapsco_ray.text.tokenize import JiebaTokenizer

        tok = JiebaTokenizer(lang="zho")
        # NOT jieba-parity (jieba's lexicon yields ['不但','要','看',...]);
        # the fallback indexes overlapping CJK bigrams, Lucene
        # CJKAnalyzer style, with punctuation as standalone tokens
        got = tok.tokenize("不但要看,而且要帮。")
        assert got == ["不但", "但要", "要看", ",",
                       "而且", "且要", "要帮", "。"]

    def test_mixed_text(self):
        from patapsco_ray.text.tokenize import JiebaTokenizer

        tok = JiebaTokenizer(lang="zho")
        assert tok.tokenize("abc 中文 def") == ["abc", "中文", "def"]
        assert tok.tokenize("中") == ["中"]
        assert tok.tokenize("x中文y") == ["x", "中文", "y"]


def test_english_lemmatizer_fallback():
    """stem='spacy' resolves to the rule-based eng lemma fallback when
    spaCy is absent (reference text.py:344-386 seam)."""
    import pytest

    from patapsco_ray.text.stem import EnglishLemmatizer, create_stemmer

    s = create_stemmer("spacy", "eng")
    cases = {
        "running": "run", "made": "make", "cities": "city",
        "dogs": "dog", "glasses": "glass", "boxes": "box",
        "was": "be", "children": "child", "played": "play",
        "making": "make", "happiest": "happy", "funnier": "funny",
        "bus": "bus", "analysis": "analysis", "see": "see",
        "goes": "go", "stopped": "stop", "hoped": "hope",
        # ambiguous without vocab: left alone on purpose
        "paper": "paper", "water": "water",
    }
    got = s.stem(list(cases))
    assert got == list(cases.values())
    # determinism through the cache
    assert s.stem(["running", "running"]) == ["run", "run"]
    # non-eng lemma fallback and stanza stay explicit seams
    with pytest.raises(NotImplementedError):
        create_stemmer("spacy", "rus")
    with pytest.raises(NotImplementedError):
        create_stemmer("stanza", "eng")
    with pytest.raises(NotImplementedError):
        EnglishLemmatizer("fra")
