"""Tokenizers.

The reference's default (and the config used by its retrieval tests /
sample pipelines) is the whitespace tokenizer (reference text.py:93-95,
samples/configs/eng_basic.yml). Model-based tokenizers (moses, jieba,
spacy, stanza — reference text.py:98-386) are kept as registry seams
but raise, since their model dependencies are not in this environment.
"""

from __future__ import annotations


class WhiteSpaceTokenizer:
    """``text.split()`` (reference text.py:93-95)."""

    def __init__(self, lang: str = "eng", model_path=None):
        self.lang = lang

    def tokenize(self, text: str) -> list[str]:
        return text.split()


class NgramTokenizer:
    """Character n-gram tokenizer (reference text.py:136-160).

    The reference sentence-splits with spaCy then emits character
    n-grams per sentence (n=2 for CJK, else n=5). Without spaCy we
    split sentences on newline / terminal punctuation, which matches
    the reference on single-sentence-per-line text.
    """

    CJK = {"zho", "jpn", "kor"}
    _TERMINALS = ".!?。！？"

    def __init__(self, lang: str = "eng", model_path=None):
        self.lang = lang
        self.n = 2 if lang in self.CJK else 5

    def _sentences(self, text: str) -> list[str]:
        sents, buf = [], []
        for ch in text:
            buf.append(ch)
            if ch in self._TERMINALS:
                sents.append("".join(buf).strip())
                buf = []
        tail = "".join(buf).strip()
        if tail:
            sents.append(tail)
        return [s for s in sents if s]

    def tokenize(self, text: str) -> list[str]:
        n = self.n
        out = []
        for sent in self._sentences(text):
            if len(sent) <= n:
                out.append(sent)
            else:
                out.extend(sent[i:i + n] for i in range(len(sent) - n + 1))
        return out


TOKENIZERS = {
    "whitespace": WhiteSpaceTokenizer,
    "ngram": NgramTokenizer,
}

# Seams for model-based tokenizers (reference text.py:430-524 validation
# matrix). They raise at construction: the models aren't shipped here.
_UNAVAILABLE = {"moses", "jieba", "spacy", "stanza"}


def create_tokenizer(name: str, lang: str, model_path=None):
    if name in TOKENIZERS:
        return TOKENIZERS[name](lang, model_path)
    if name in _UNAVAILABLE:
        raise NotImplementedError(
            f"tokenizer '{name}' requires an NLP model not available in "
            "this environment (reference text.py:98-386 seam)"
        )
    raise ValueError(f"Unknown tokenizer: {name}")
