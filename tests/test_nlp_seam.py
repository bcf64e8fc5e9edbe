"""The spacy/stanza model seams (reference text.py:163-386).

Neither library is installed here, so these tests inject minimal fake
modules into sys.modules and assert the seam constructs and drives the
REAL pipeline API exactly as the reference does: model-map lookup,
exclude/disable lists, pipe re-enabling for lemma configs, doc caching
between tokenize and stem, Arabic de-diacritization, and the shared
tokenizer==stemmer object (reference tests/test_text.py:130-141).
"""

from __future__ import annotations

import sys
import types

import pytest

from patapsco_ray.text import TextConfig, TextProcessor, create_stemmer
from patapsco_ray.text.stem import EnglishLemmatizer
from patapsco_ray.text.tokenize import create_tokenizer


# --------------------------------------------------------------- fakes


class _SpacyTok:
    def __init__(self, text, lemma):
        self.text, self.lemma_ = text, lemma

    def __str__(self):
        return self.text


_LEMMAS = {"Mary": "Mary", "had": "have", "a": "a", "little": "little",
           "lamb": "lamb", ".": ".", "told": "tell", "attacked": "attack"}


class _SpacyDoc(list):
    pass


class _SpacyPipeline:
    def __init__(self, name):
        self.name = name
        self.component_names = ["tok2vec", "tagger", "attribute_ruler",
                                "lemmatizer", "senter"]
        self.enabled = []

    def enable_pipe(self, name):
        self.enabled.append(name)

    def __call__(self, text):
        return _SpacyDoc(
            _SpacyTok(w, _LEMMAS.get(w, w)) for w in text.replace(
                ".", " .").split())


def _fake_spacy(loaded: dict):
    mod = types.ModuleType("spacy")
    util = types.ModuleType("spacy.util")
    util.is_package = lambda name: True
    mod.util = util

    def load(name, exclude=None, disable=None):
        nlp = _SpacyPipeline(name)
        loaded[name] = {"exclude": exclude, "disable": disable, "nlp": nlp}
        return nlp

    mod.load = load
    return mod


class _StanzaWord:
    def __init__(self, text, lemma):
        self.text, self.lemma = text, lemma


class _StanzaDoc:
    def __init__(self, words):
        sent = types.SimpleNamespace(words=words)
        self.sentences = [sent]


class _StanzaPipeline:
    def __init__(self, lang, processors="", package="default"):
        self.lang, self.processors = lang, processors

    def __call__(self, text):
        lemma = "lemma" in self.processors
        return _StanzaDoc([
            _StanzaWord(w, _LEMMAS.get(w, w) if lemma else None)
            for w in text.replace(".", " .").split()])


def _fake_stanza(created: list):
    mod = types.ModuleType("stanza")

    def pipeline(lang, processors="", package="default"):
        p = _StanzaPipeline(lang, processors, package)
        created.append(p)
        return p

    mod.Pipeline = pipeline
    return mod


@pytest.fixture(autouse=True)
def _fresh_model_cache():
    from patapsco_ray.text.nlp import SpacyNLP

    SpacyNLP._models.clear()
    yield
    SpacyNLP._models.clear()


# --------------------------------------------------------------- spacy


def test_spacy_seam_constructs_real_pipeline(monkeypatch):
    loaded = {}
    monkeypatch.setitem(sys.modules, "spacy", _fake_spacy(loaded))
    tok = create_tokenizer("spacy", "eng")
    # reference model_map: eng -> en_core_web_sm, with the documented
    # exclude/disable lists (text.py:277-278)
    assert "en_core_web_sm" in loaded
    assert loaded["en_core_web_sm"]["exclude"] == ["ner", "parser"]
    assert "lemmatizer" in loaded["en_core_web_sm"]["disable"]
    assert tok.tokenize("Mary had a little lamb.") == [
        "Mary", "had", "a", "little", "lamb", "."]


def test_spacy_stem_reads_cached_doc_lemmas(monkeypatch):
    loaded = {}
    monkeypatch.setitem(sys.modules, "spacy", _fake_spacy(loaded))
    nlp = create_tokenizer("spacy", "eng", stem=True)
    # stem=True re-enables the lemmatizer chain (text.py:361-366)
    enabled = loaded["en_core_web_sm"]["nlp"].enabled
    assert "lemmatizer" in enabled and "tok2vec" in enabled
    toks = nlp.tokenize("Mary had a little lamb.")
    assert nlp.stem(toks) == ["Mary", "have", "a", "little", "lamb", "."]


def test_spacy_unknown_lang_falls_back_to_xx(monkeypatch):
    loaded = {}
    monkeypatch.setitem(sys.modules, "spacy", _fake_spacy(loaded))
    create_tokenizer("spacy", "swa")  # not in the model map
    assert "xx_sent_ud_sm" in loaded  # reference text.py:315-317


def test_processor_shares_one_spacy_object(monkeypatch):
    loaded = {}
    monkeypatch.setitem(sys.modules, "spacy", _fake_spacy(loaded))
    p = TextProcessor(TextConfig(tokenize="spacy", stem="spacy",
                                 stopwords=False), "eng")
    # reference tests/test_text.py:130-141: tokenizer == stemmer
    assert p.tokenizer is p.stemmer
    assert p.process_normalized("Mary had a little lamb.") == \
        "mary have a little lamb ."


def test_spacy_missing_raises_seam_error():
    assert "spacy" not in sys.modules or not hasattr(
        sys.modules.get("spacy"), "__version__")
    with pytest.raises(NotImplementedError, match="text.py:344-386"):
        create_tokenizer("spacy", "eng")


def test_standalone_spacy_stemmer_with_lib_is_config_error(monkeypatch):
    monkeypatch.setitem(sys.modules, "spacy", _fake_spacy({}))
    with pytest.raises(ValueError, match="tokenize='spacy'"):
        create_stemmer("spacy", "eng")


def test_standalone_spacy_stemmer_fallback_warns_once():
    from patapsco_ray.text import stem as stem_mod

    stem_mod._warned_fallback.clear()
    with pytest.warns(RuntimeWarning, match="NOT model-parity"):
        s = create_stemmer("spacy", "eng")
    assert s.stem(["told", "attacked", "running"]) == \
        ["tell", "attack", "run"]
    # second construction is silent (one-time warning)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        create_stemmer("spacy", "eng")


# -------------------------------------------------------------- stanza


def test_stanza_seam_constructs_real_pipeline(monkeypatch):
    created = []
    monkeypatch.setitem(sys.modules, "stanza", _fake_stanza(created))
    nlp = create_tokenizer("stanza", "eng", stem=True)
    assert created[0].lang == "en"
    assert created[0].processors == "tokenize,lemma"
    toks = nlp.tokenize("Mary had a little lamb.")
    assert toks == ["Mary", "had", "a", "little", "lamb", "."]
    assert nlp.stem(toks) == ["Mary", "have", "a", "little", "lamb", "."]


def test_stanza_zho_never_requests_lemma(monkeypatch):
    created = []
    monkeypatch.setitem(sys.modules, "stanza", _fake_stanza(created))
    create_tokenizer("stanza", "zho", stem=True)
    # reference text.py:196-198: zh-hans runs tokenize only
    assert created[0].lang == "zh-hans"
    assert created[0].processors == "tokenize"


def test_stanza_arabic_lemmas_dediacritized(monkeypatch):
    created = []
    monkeypatch.setitem(sys.modules, "stanza", _fake_stanza(created))
    nlp = create_tokenizer("stanza", "ara", stem=True)
    word = "فِي"  # fi + kasra
    _LEMMAS[word] = word
    try:
        nlp.tokenize(word)
        assert nlp.stem([word]) == ["في"]  # kasra stripped
    finally:
        del _LEMMAS[word]


def test_stanza_missing_raises_seam_error():
    with pytest.raises(NotImplementedError, match="text.py:163-243"):
        create_tokenizer("stanza", "eng")


def test_stanza_unsupported_lang(monkeypatch):
    monkeypatch.setitem(sys.modules, "stanza", _fake_stanza([]))
    with pytest.raises(ValueError, match="stanza pipeline supports"):
        create_tokenizer("stanza", "deu")


# ------------------------------------------- offline lemma fallback


def test_english_lemmatizer_tracks_reference_goldens():
    """Reference spaCy golden (tests/test_text.py:236-241), lowercased
    — the offline rule fallback lowercases by design."""
    lem = EnglishLemmatizer()
    sent = ("a witness told police that the victim had attacked "
            "the suspect in april .").split()
    assert lem.stem(sent) == (
        "a witness tell police that the victim have attack "
        "the suspect in april .").split()


def test_english_lemmatizer_stanza_golden():
    """Reference stanza golden (tests/test_text.py:175-181)."""
    lem = EnglishLemmatizer()
    assert lem.stem(["it", "'s", "fleece", "was", "white", "as",
                     "snow", "."]) == \
        ["it", "'s", "fleece", "be", "white", "as", "snow", "."]


def test_ngram_plus_stem_rejected():
    with pytest.raises(ValueError, match="ngram tokenizer"):
        TextProcessor(TextConfig(tokenize="ngram", stem="porter"), "eng")
