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


class MosesTokenizer:
    """Moses tokenization; reference text.py:163-200 (sacremoses).

    Uses sacremoses when importable; otherwise a rule-based fallback
    covering the core Moses behaviors the reference's own tests
    exercise (tests/test_text.py:279-305): punctuation split from
    words, apostrophe contractions split ("It's" -> It + 's), digits
    kept whole, Unicode word characters (Arabic etc.) grouped. Like the
    reference, zho is rejected (Moses has no Chinese support,
    text.py:440-449 validation matrix).
    """

    _FALLBACK_RE = None  # compiled lazily (class-level, shared)

    def __init__(self, lang: str = "eng", model_path=None):
        if lang == "zho":
            raise ValueError(
                "moses tokenizer does not support zho (reference "
                "text.py:440-449)")
        self.lang = lang
        try:
            from sacremoses import MosesTokenizer as _MT  # pragma: no cover

            self._mt = _MT(lang=lang[:2])
        except ImportError:
            self._mt = None
            if MosesTokenizer._FALLBACK_RE is None:
                import re

                MosesTokenizer._FALLBACK_RE = re.compile(
                    r"\w+|['’]\w+|[^\w\s]", re.UNICODE)

    def tokenize(self, text: str) -> list[str]:
        if self._mt is not None:  # pragma: no cover
            return self._mt.tokenize(text, escape=False)
        return MosesTokenizer._FALLBACK_RE.findall(text)


# CJK unicode ranges for the bigram fallback (the public Lucene
# CJKAnalyzer approach: index overlapping character bigrams)
_CJK_RANGES = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0xF900, 0xFAFF),
    (0x3040, 0x30FF),  # kana
    (0xAC00, 0xD7AF),  # hangul
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


class JiebaTokenizer:
    """Chinese segmentation; reference text.py:120-133 (jieba).

    Uses jieba when importable; otherwise falls back to overlapping
    CJK character bigrams (Lucene CJKAnalyzer style) with non-CJK runs
    split on whitespace/punctuation. The fallback is NOT
    jieba-parity — dictionary segmentation ('不但' as one token) needs
    jieba's lexicon — but gives deterministic, recall-oriented zho
    tokenization offline. Only zho is accepted (reference
    tests/test_text.py:274-276)."""

    def __init__(self, lang: str = "zho", model_path=None):
        if lang != "zho":
            raise ValueError(
                f"jieba tokenizer supports zho only, got {lang!r} "
                "(reference text.py:120-133)")
        self.lang = lang
        try:
            import jieba  # pragma: no cover

            self._jieba = jieba
        except ImportError:
            self._jieba = None

    def tokenize(self, text: str) -> list[str]:
        if self._jieba is not None:  # pragma: no cover
            return [t for t in self._jieba.lcut(text) if t.strip()]
        out: list[str] = []
        run: list[str] = []
        word: list[str] = []

        def flush_word():
            if word:
                out.append("".join(word))
                word.clear()

        def flush_run():
            if len(run) == 1:
                out.append(run[0])
            else:
                out.extend(run[i] + run[i + 1] for i in range(len(run) - 1))
            run.clear()

        for ch in text:
            if _is_cjk(ch):
                flush_word()
                run.append(ch)
            elif ch.isspace():
                flush_word()
                if run:
                    flush_run()
            elif ch.isalnum():
                if run:
                    flush_run()
                word.append(ch)
            else:  # punctuation: its own token (jieba emits these too)
                flush_word()
                if run:
                    flush_run()
                out.append(ch)
        flush_word()
        if run:
            flush_run()
        return out


TOKENIZERS = {
    "whitespace": WhiteSpaceTokenizer,
    "ngram": NgramTokenizer,
    "moses": MosesTokenizer,
    "jieba": JiebaTokenizer,
}

def create_tokenizer(name: str, lang: str, model_path=None,
                     stem: bool = False):
    """Tokenizer registry (reference text.py:463-496).

    'spacy'/'stanza' construct the REAL model pipeline when the
    library is importable (``stem=True`` mirrors the reference's
    shared tokenizer+stemmer object, text.py:477-482) and raise
    ``NotImplementedError`` with the citation when it is not.
    """
    if name in TOKENIZERS:
        return TOKENIZERS[name](lang, model_path)
    if name in ("spacy", "stanza"):
        from .nlp import create_nlp

        return create_nlp(name, lang, model_path, stem=stem)
    raise ValueError(f"Unknown tokenizer: {name}")
