"""Document / query text processing.

Re-implements the reference's stage-1 map (DocumentProcessor.process,
reference docs.py:221-259) as batch-friendly pure functions:

    reject docs > 1e6 chars
    -> pre_normalize
    -> (stash normalized "original_text" for the doc store)
    -> tokenize
    -> identify stopwords (pre-stem)
    -> stem
    -> remove stopwords by index (post-stem)
    -> ' '.join -> post_normalize (lowercase)

Queries go through the *same* chain (reference topics.py:338-359,
500-548; the reference enforces identical doc/query processing config,
job.py:952-962).
"""

from __future__ import annotations

from dataclasses import dataclass

from .normalize import Normalizer
from .stem import create_stemmer
from .stopwords import StopWordsRemover
from .tokenize import create_tokenizer

MAX_TEXT_LEN = 1_000_000  # reference docs.py:223


@dataclass(frozen=True)
class TextConfig:
    """Equivalent of TextProcessorConfig (reference schema.py:37-44)."""

    tokenize: str = "whitespace"
    stopwords: bool | str = "lucene"   # False disables
    stem: bool | str = False           # "porter" or False
    lowercase: bool = True             # reference schema.py:32-34


class TextProcessor:
    """Stateful text processor — one instance per Ray actor.

    Construction loads stopword lists / stemmer caches once; use as the
    ``__init__`` payload of a ``map_batches`` actor class.
    """

    def __init__(self, config: TextConfig = TextConfig(), lang: str = "eng"):
        self.config = config
        self.lang = lang
        self.normalizer = Normalizer(lowercase=config.lowercase)
        # spacy/stanza are full pipelines: ONE object serves both the
        # tokenizer and stemmer roles (reference text.py:477-482,
        # 518-519), so lemmas come from the doc the tokenize call
        # analyzed. Validation mirrors reference text.py:455-461.
        if config.stem and config.tokenize == "ngram":
            raise ValueError("ngram tokenizer not compatible with "
                             "stemming (reference text.py:456-457)")
        shared = (config.stem in ("spacy", "stanza")
                  and config.stem == config.tokenize)
        self.tokenizer = create_tokenizer(config.tokenize, lang,
                                          stem=shared)
        if shared:
            self.stemmer = self.tokenizer
        else:
            self.stemmer = (create_stemmer(config.stem, lang)
                            if config.stem else None)
        self.stopword_remover = (
            StopWordsRemover(
                config.stopwords if isinstance(config.stopwords, str) else "lucene",
                lang,
            )
            if config.stopwords
            else None
        )

    def process(self, text: str) -> str | None:
        """Full chain on one document; None = rejected (too long)."""
        if len(text) > MAX_TEXT_LEN:
            return None
        return self.process_normalized(self.normalizer.pre_normalize(text))

    def pre_normalize(self, text: str) -> str:
        return self.normalizer.pre_normalize(text)

    def process_normalized(self, text: str) -> str:
        """Post-normalization part of the chain (tokens onward)."""
        tokens = self.tokenizer.tokenize(text)
        if self.stopword_remover:
            stop_idx = self.stopword_remover.identify(tokens)
        else:
            stop_idx = []
        if self.stemmer:
            tokens = self.stemmer.stem(tokens)
        if self.stopword_remover and stop_idx:
            tokens = self.stopword_remover.remove(tokens, stop_idx)
        return self.normalizer.post_normalize(" ".join(tokens))

    def process_batch(
        self, texts: list[str]
    ) -> tuple[list[str | None], list[str | None]]:
        """Process a batch of raw texts.

        Returns (normalized_texts, processed_texts); entries are None
        for rejected (over-length) documents.
        """
        normalized: list[str | None] = []
        processed: list[str | None] = []
        for text in texts:
            if text is None or len(text) > MAX_TEXT_LEN:
                normalized.append(None)
                processed.append(None)
                continue
            norm = self.normalizer.pre_normalize(text)
            normalized.append(norm)
            processed.append(self.process_normalized(norm))
        return normalized, processed
