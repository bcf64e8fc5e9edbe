"""Model-based NLP pipelines (spaCy / Stanza) behind import seams.

The reference runs full NLP pipelines for tokenize+lemma configs
(SpacyNLP, reference text.py:344-386; StanzaNLP, text.py:163-243).
Both are combined tokenizer+stemmer objects: ``tokenize`` runs the
model once and caches the analyzed document, ``stem`` reads lemmas
from that cache (the factory returns the SAME object for both roles,
reference text.py:430-524).

Neither library ships in this environment, so construction lazily
imports them: when importable the REAL pipeline is loaded and drives
tokenization/lemmatization exactly like the reference; when absent a
``NotImplementedError`` with the citation is raised (documents the
seam; the offline ``stem: spacy`` fallback lives in stem.py and is a
deliberately non-parity rule lemmatizer).

Model downloads are NOT attempted here (no network in this sandbox);
a missing installed model raises with the model name so a real
deployment knows what to `spacy download` / `stanza.download`.
"""

from __future__ import annotations

import logging

LOGGER = logging.getLogger(__name__)

# ISO 639-3 -> 639-1 for the model maps (reference util/__init__.py
# LangStandardizer; only codes the reference's own maps cover)
_ISO_639_1 = {
    "ara": "ar", "zho": "zh", "eng": "en", "fas": "fa", "rus": "ru",
    "spa": "es", "fra": "fr", "deu": "de", "ita": "it", "jpn": "ja",
    "nld": "nl", "pol": "pl", "por": "pt", "ron": "ro", "lit": "lt",
    "mkd": "mk", "nob": "nb", "cat": "ca", "dan": "da", "ell": "el",
}


class SpacyNLP:
    """Combined tokenizer+lemmatizer on a spaCy pipeline
    (reference text.py:344-386 SpacyNLP + text.py:247-331
    SpacyModelLoader).

    ``tokenize`` caches the spaCy ``Doc``; ``stem`` returns
    ``token.lemma_ or token.text`` from the cache — identical contract
    to the reference, including the exclude/disable component lists
    and re-enabling the lemmatizer chain when ``stem=True``.
    """

    # spaCy small-model names (reference text.py:256-275 model_map)
    model_map = {
        "ca": "ca_core_news_sm", "da": "da_core_news_sm",
        "de": "de_core_news_sm", "el": "el_core_news_sm",
        "en": "en_core_web_sm", "es": "es_core_news_sm",
        "fr": "fr_core_news_sm", "it": "it_core_news_sm",
        "ja": "ja_core_news_sm", "lt": "lt_core_news_sm",
        "mk": "mk_core_news_sm", "nb": "nb_core_news_sm",
        "nl": "nl_core_news_sm", "pl": "pl_core_news_sm",
        "pt": "pt_core_news_sm", "ro": "ro_core_news_sm",
        "ru": "ru_core_news_sm", "zh": "zh_core_web_sm",
        "xx": "xx_sent_ud_sm",
    }
    exclude = ["ner", "parser"]
    disable = ["tok2vec", "tagger", "attribute_ruler", "lemmatizer",
               "morphologizer"]
    _models: dict = {}  # model-name -> loaded pipeline, shared per proc

    def __init__(self, lang: str = "eng", model_path=None,
                 stem: bool = False):
        try:
            import spacy
        except ImportError as e:  # the documented seam
            raise NotImplementedError(
                "tokenizer/stemmer 'spacy' requires the spaCy package "
                "and its per-language model, neither available in this "
                "environment (reference text.py:344-386 seam)"
            ) from e
        self.lang = lang
        iso = "xx" if lang == "xx" else _ISO_639_1.get(lang, "xx")
        if iso not in self.model_map:
            iso = "xx"
        name = self.model_map[iso]
        nlp = SpacyNLP._models.get(name)
        if nlp is None:
            if not spacy.util.is_package(name):
                raise NotImplementedError(
                    f"spaCy model '{name}' is not installed and model "
                    "downloads are unavailable offline (reference "
                    "text.py:320-328 downloads it on first use)"
                )
            nlp = spacy.load(name, exclude=self.exclude,
                             disable=self.disable)
            SpacyNLP._models[name] = nlp
        self.nlp = nlp
        self.cache = None
        if stem:
            # re-enable the lemmatizer dependency chain
            # (reference text.py:361-366)
            names = set(self.nlp.component_names)
            for comp in names & {"tok2vec", "tagger", "attribute_ruler",
                                 "lemmatizer", "morphologizer"}:
                self.nlp.enable_pipe(comp)

    def tokenize(self, text: str) -> list[str]:
        doc = self.nlp(text)
        self.cache = doc
        return [str(tok) for tok in doc]

    def stem(self, tokens: list[str]) -> list[str]:
        # lemmas come from the cached doc, not the token argument
        # (reference text.py:379-381)
        return [tok.lemma_ if tok.lemma_ else tok.text
                for tok in self.cache]

    def stem_word(self, token: str) -> str:  # registry compatibility
        doc = self.nlp(token)
        return doc[0].lemma_ or token if len(doc) else token


# Arabic lemmas come fully diacritized from stanza; the reference
# strips the 8 harakat (reference text.py:220-221)
_ARABIC_DIACRITICS = "".join(chr(c) for c in range(0x064B, 0x0653))
_DIACRITIC_TABLE = str.maketrans("", "", _ARABIC_DIACRITICS)


class StanzaNLP:
    """Combined tokenizer+lemmatizer on a Stanza pipeline
    (reference text.py:163-243).

    zho runs tokenize-only even when ``stem=True`` (the reference
    never requests the zh lemma processor, text.py:196-204); Arabic
    lemmas are de-diacritized (text.py:220-226).
    """

    lang_map = {"ara": "ar", "eng": "en", "fas": "fa", "rus": "ru",
                "zho": "zh-hans"}

    def __init__(self, lang: str = "eng", model_path=None,
                 stem: bool = False):
        try:
            import stanza
        except ImportError as e:
            raise NotImplementedError(
                "tokenizer/stemmer 'stanza' requires the stanza package "
                "and its per-language model, neither available in this "
                "environment (reference text.py:163-243 seam)"
            ) from e
        if lang not in self.lang_map:
            raise ValueError(
                f"stanza pipeline supports {sorted(self.lang_map)}, got "
                f"{lang!r} (reference text.py:166-172)")
        self.lang = self.lang_map[lang]
        if self.lang == "zh-hans" or not stem:
            processors = "tokenize"
        else:
            processors = "tokenize,lemma"
        self.nlp = stanza.Pipeline(self.lang, processors=processors,
                                   package="default")
        self.cache = None

    def tokenize(self, text: str) -> list[str]:
        doc = self.nlp(text)
        self.cache = doc
        return [word.text for sent in doc.sentences
                for word in sent.words]

    def stem(self, tokens: list[str]) -> list[str]:
        out = []
        for sent in self.cache.sentences:
            for word in sent.words:
                if word.lemma:
                    lemma = word.lemma
                    if self.lang == "ar":
                        lemma = lemma.translate(_DIACRITIC_TABLE)
                    out.append(lemma)
                else:
                    out.append(word.text)
        return out


def create_nlp(name: str, lang: str, model_path=None, stem: bool = False):
    """Construct a combined tokenizer+stemmer pipeline.

    Reference TokenizerStemmerFactory.create_tokenizer
    (text.py:477-482): spacy/stanza tokenizers are built with
    ``stem=(config.stem == config.tokenize)`` and the same object
    serves as the stemmer.
    """
    if name == "spacy":
        return SpacyNLP(lang, model_path, stem=stem)
    if name == "stanza":
        return StanzaNLP(lang, model_path, stem=stem)
    raise ValueError(f"unknown NLP pipeline: {name}")
