"""Stemmers.

The reference wraps nltk's PorterStemmer in its default NLTK_EXTENSIONS
mode with ``to_lowercase=False`` (reference text.py:35-52). nltk is not
available here, so this is a self-contained implementation of the Porter
algorithm (M.F. Porter, "An algorithm for suffix stripping", Program
14(3), 1980) including the NLTK-mode departures that affect common web
text:

- words of length <= 2 are returned unchanged
- the irregular-forms pool (sky/dying/lying/... )
- step 1a: "ies" -> "ie" for 4-letter words ("ties" -> "tie")
- step 1b: "ied" -> "ie"/"i" short-circuit ("died" -> "die")
- step 1c: terminal y -> i only when preceded by a consonant and the
  stem is longer than one letter ("day" -> "day", not "dai")
- step 2: "alli" -> "al" applied first with re-entry; "bli" -> "ble";
  "fulli" -> "ful"; "logi" -> "log" measured on word[:-3]
- cvc check admits two-letter vowel-consonant words

Case handling matches ``stem(token, to_lowercase=False)``: the token is
processed as-is and uppercase vowels are treated as consonants, which
reproduces the reference's behavior on capitalized tokens (reference
test golden: "It was ... the clocks were striking" ->
"It wa ... the clock were strike", tests/test_text.py:38-43).
"""

from __future__ import annotations

_VOWELS = "aeiou"


class PorterStemmer:
    """English Porter stemmer (reference text.py:35-52)."""

    def __init__(self, lang: str = "eng"):
        if lang != "eng":
            raise ValueError("Porter stemmer only supports English")
        self.lang = lang
        # NLTK's irregular-forms pool
        self._special = {}
        for stem_, forms in {
            "sky": ["sky", "skies"],
            "die": ["dying"],
            "lie": ["lying"],
            "tie": ["tying"],
            "news": ["news"],
            "inning": ["innings", "inning"],
            "outing": ["outings", "outing"],
            "canning": ["cannings", "canning"],
            "howe": ["howe"],
            "proceed": ["proceed"],
            "exceed": ["exceed"],
            "succeed": ["succeed"],
        }.items():
            for form in forms:
                self._special[form] = stem_

    # -- character classification -------------------------------------
    def _is_cons(self, word: str, i: int) -> bool:
        ch = word[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            if i == 0:
                return True
            return not self._is_cons(word, i - 1)
        return True

    def _measure(self, stem: str) -> int:
        cv = ""
        for i in range(len(stem)):
            cv += "c" if self._is_cons(stem, i) else "v"
        m = 0
        prev = None
        for ch in cv:
            if prev == "v" and ch == "c":
                m += 1
            prev = ch
        return m

    def _has_vowel(self, stem: str) -> bool:
        return any(not self._is_cons(stem, i) for i in range(len(stem)))

    def _ends_double_cons(self, word: str) -> bool:
        return (
            len(word) >= 2
            and word[-1] == word[-2]
            and self._is_cons(word, len(word) - 1)
        )

    def _ends_cvc(self, word: str) -> bool:
        if (
            len(word) >= 3
            and self._is_cons(word, len(word) - 3)
            and not self._is_cons(word, len(word) - 2)
            and self._is_cons(word, len(word) - 1)
            and word[-1] not in ("w", "x", "y")
        ):
            return True
        # NLTK-mode: two-letter vowel-consonant word ("ab") counts
        return (
            len(word) == 2
            and not self._is_cons(word, 0)
            and self._is_cons(word, 1)
        )

    # -- rule application ---------------------------------------------
    def _apply_first(self, word: str, rules) -> str:
        """Apply the first matching (suffix, repl, cond) rule."""
        for suffix, repl, cond in rules:
            if suffix == "*d":
                if self._ends_double_cons(word):
                    stem = word[:-2]
                    if cond is None or cond(stem):
                        return stem + repl(word)
                    return word
                continue
            if word.endswith(suffix):
                stem = word[: len(word) - len(suffix)]
                if cond is None or cond(stem):
                    return stem + repl
                return word
        return word

    def _m_gt0(self, stem: str) -> bool:
        return self._measure(stem) > 0

    def _m_gt1(self, stem: str) -> bool:
        return self._measure(stem) > 1

    # -- steps ---------------------------------------------------------
    def _step1a(self, word: str) -> str:
        if word.endswith("ies") and len(word) == 4:
            return word[:-3] + "ie"
        return self._apply_first(word, [
            ("sses", "ss", None),
            ("ies", "i", None),
            ("ss", "ss", None),
            ("s", "", None),
        ])

    def _step1b(self, word: str) -> str:
        if word.endswith("ied"):
            if len(word) == 4:
                return word[:-3] + "ie"
            return word[:-3] + "i"
        if word.endswith("eed"):
            stem = word[:-3]
            if self._measure(stem) > 0:
                return stem + "ee"
            return word
        rule_applied = False
        intermediate = word
        for suffix in ("ed", "ing"):
            if word.endswith(suffix):
                stem = word[: len(word) - len(suffix)]
                if self._has_vowel(stem):
                    intermediate = stem
                    rule_applied = True
                break
        if not rule_applied:
            return word
        word = intermediate
        if word.endswith(("at", "bl", "iz")):
            return word + "e"
        if self._ends_double_cons(word) and word[-1] not in ("l", "s", "z"):
            return word[:-1]
        if self._measure(word) == 1 and self._ends_cvc(word):
            return word + "e"
        return word

    def _step1c(self, word: str) -> str:
        if word.endswith("y"):
            stem = word[:-1]
            if len(stem) > 1 and self._is_cons(stem, len(stem) - 1):
                return stem + "i"
        return word

    def _step2(self, word: str) -> str:
        # NLTK-mode: ALLI -> AL applied first, with re-entry
        if word.endswith("alli") and self._m_gt0(word[:-4] + "al"):
            return self._step2(word[:-4] + "al")
        if word.endswith("logi") and self._m_gt0(word[:-3]):
            return word[:-3] + "og"
        rules = [
            ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
            ("anci", "ance"), ("izer", "ize"), ("bli", "ble"),
            ("alli", "al"), ("entli", "ent"), ("eli", "e"),
            ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
            ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
            ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
            ("iviti", "ive"), ("biliti", "ble"), ("fulli", "ful"),
        ]
        return self._apply_first(word, [(s, r, self._m_gt0) for s, r in rules])

    def _step3(self, word: str) -> str:
        rules = [
            ("icate", "ic"), ("ative", ""), ("alize", "al"),
            ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""),
        ]
        return self._apply_first(word, [(s, r, self._m_gt0) for s, r in rules])

    def _step4(self, word: str) -> str:
        if word.endswith("ion"):
            stem = word[:-3]
            if stem and stem[-1] in ("s", "t") and self._m_gt1(stem):
                return stem
            # fall through to shorter suffixes that can't match after 'ion'
            return word
        rules = [
            "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
            "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous",
            "ive", "ize",
        ]
        return self._apply_first(word, [(s, "", self._m_gt1) for s in rules])

    def _step5a(self, word: str) -> str:
        if word.endswith("e"):
            stem = word[:-1]
            if self._measure(stem) > 1:
                return stem
            if self._measure(stem) == 1 and not self._ends_cvc(stem):
                return stem
        return word

    def _step5b(self, word: str) -> str:
        if word.endswith("ll") and self._measure(word[:-1]) > 1:
            return word[:-1]
        return word

    def stem_word(self, word: str) -> str:
        try:
            return self._stem_word(word)
        except RecursionError:
            # parity with the reference's guard (text.py:47-52): nltk's
            # consonant check recurses through 'y' chains, so absurd
            # tokens (e.g. 1000+ y's) come back unstemmed
            return word

    def _stem_word(self, word: str) -> str:
        stem = self._special.get(word)
        if stem is not None:
            return stem
        if len(word) <= 2:
            return word
        word = self._step1a(word)
        word = self._step1b(word)
        word = self._step1c(word)
        word = self._step2(word)
        word = self._step3(word)
        word = self._step4(word)
        word = self._step5a(word)
        word = self._step5b(word)
        return word

    def stem(self, tokens: list[str]) -> list[str]:
        """Stem a token list (reference text.py:45-52)."""
        return [self.stem_word(t) for t in tokens]


class FarsiStemmer:
    """Farsi stemmer (reference text.py:55-66: parsivar FindStems).

    Uses parsivar when importable. Otherwise a deterministic
    rule-based fallback: longest-match stripping of the common Persian
    inflectional suffixes (plural ها/ات/ان/ین, comparatives تر/ترین,
    possessive/copular clitics, indefinite ی) with ZWNJ (U+200C)
    handling, never shortening a stem below two letters. This is an
    approximation of parsivar's lexicon-based stemmer — documented as
    such, not claimed identical — mirroring how the Moses/Jieba
    offline fallbacks are seamed (tokenize.py:62-108).
    """

    # longest first; entries may start with ZWNJ so 'کتاب‌ها' strips
    # cleanly. Clitic/suffix inventory follows the standard Persian
    # morphology descriptions used by open-source stemmers.
    _SUFFIXES = [
        "‌ترین", "‌هایی", "‌های", "‌ها",
        "ترین", "هایی", "های", "ها",
        "‌تر", "تر",
        "ات", "ان", "ین",
        "مان", "تان", "شان",
        "ام", "اش", "‌ام", "‌اش",
        "ی",
    ]

    def __init__(self, lang: str = "fas"):
        if lang != "fas":
            raise ValueError(
                "parsivar stemmer only supports Farsi (reference "
                "text.py:58-60)")
        self.lang = lang
        try:
            import parsivar  # pragma: no cover

            self._ps = parsivar.FindStems()
        except ImportError:
            self._ps = None

    def stem_word(self, token: str) -> str:
        if self._ps is not None:  # pragma: no cover
            return self._ps.convert_to_stem(token)
        for suf in self._SUFFIXES:
            if token.endswith(suf) and len(token) - len(suf) >= 2:
                return token[: len(token) - len(suf)]
        return token

    def stem(self, tokens: list[str]) -> list[str]:
        return [self.stem_word(t) for t in tokens]


# Irregular English forms for the lemma fallback (common closed-class
# verbs/nouns; a model lemmatizer knows far more — this list covers the
# high-frequency Zipf head where rules fail)
_EN_IRREGULAR = {
    "was": "be", "were": "be", "is": "be", "are": "be", "been": "be",
    "am": "be", "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    "went": "go", "gone": "go", "goes": "go", "going": "go",
    "said": "say", "says": "say", "made": "make", "taken": "take",
    "took": "take", "came": "come", "saw": "see", "seen": "see",
    "gave": "give", "given": "give", "got": "get", "gotten": "get",
    "men": "man", "women": "woman", "children": "child", "feet": "foot",
    "teeth": "tooth", "mice": "mouse", "people": "person",
    "geese": "goose", "better": "good", "best": "good", "worse": "bad",
    "worst": "bad", "knew": "know", "known": "know", "ran": "run",
    "wrote": "write", "written": "write", "found": "find",
    "thought": "think", "left": "leave", "told": "tell",
    "brought": "bring", "began": "begin", "begun": "begin",
    "kept": "keep", "held": "hold", "stood": "stand", "heard": "hear",
    "meant": "mean", "met": "meet", "paid": "pay", "sat": "sit",
    "spoke": "speak", "spoken": "speak", "led": "lead", "felt": "feel",
    "lost": "lose", "sent": "send", "built": "build", "fell": "fall",
    "fallen": "fall",
}

_VOWELS = frozenset("aeiou")


class EnglishLemmatizer:
    """Rule-based English lemmatizer: the offline fallback behind the
    ``stem: spacy`` config seam (reference text.py:344-386 runs spaCy's
    model lemmatizer; spaCy's own rule lemmatizer and WordNet's morphy
    are the public algorithms this follows).

    Irregular-form table first, then ordered suffix rules
    (plural -s forms, -ing / -ed with doubled-consonant undo and
    CVC e-restoration, -er / -est). No POS tags and no vocabulary
    check are available offline, so this is a deterministic
    approximation, NOT model parity — documented exactly like the
    Moses/Jieba fallbacks.
    """

    def __init__(self, lang: str = "eng"):
        if lang != "eng":
            raise NotImplementedError(
                "the offline lemma fallback covers eng only; other "
                "languages need the spaCy/Stanza models (reference "
                "text.py:344-386 seam)")
        self.lang = lang

    @staticmethod
    def _restore(stem: str) -> str:
        """After stripping -ing/-ed: undo consonant doubling
        (running -> run) or restore a dropped final e on a CVC tail
        (making -> mak -> make)."""
        if len(stem) >= 3 and stem[-1] == stem[-2] and \
                stem[-1] not in _VOWELS and stem[-1] not in "lsz":
            return stem[:-1]
        if (len(stem) >= 3 and stem[-1] not in _VOWELS
                and stem[-1] not in "wxy"
                and stem[-2] in _VOWELS and stem[-3] not in _VOWELS):
            return stem + "e"
        return stem

    def stem_word(self, token: str) -> str:
        w = token.lower()
        irr = _EN_IRREGULAR.get(w)
        if irr is not None:
            return irr
        n = len(w)
        if n <= 3 or not w.isalpha():
            return w
        if w.endswith("sses"):
            return w[:-2]
        if w.endswith("ies") and n > 4:
            return w[:-3] + "y"
        if w.endswith(("ches", "shes", "xes", "zes")):
            return w[:-2]
        if w.endswith("ss") or w.endswith("us") or w.endswith("is"):
            return w
        if w.endswith("ing") and n > 5:
            return self._restore(w[:-3])
        if w.endswith("ied") and n > 4:
            return w[:-3] + "y"
        if w.endswith("ed") and n > 4:
            return self._restore(w[:-2])
        if w.endswith("iest") and n > 5:
            return w[:-4] + "y"
        if w.endswith("est") and n > 5:
            return self._restore(w[:-3])
        if w.endswith("ier") and n > 4:
            return w[:-3] + "y"
        if w.endswith("s"):
            return w[:-1]
        return w

    def stem(self, tokens: list[str]) -> list[str]:
        return [self.stem_word(t) for t in tokens]


class CachedStemmer:
    """Wraps a stemmer with a bounded memo cache.

    Web-text token frequencies are Zipfian, so a per-actor cache turns
    most stem calls into dict lookups. Cleared wholesale when full.
    """

    def __init__(self, stemmer, max_entries: int = 500_000):
        self.stemmer = stemmer
        self.max_entries = max_entries
        self._cache: dict[str, str] = {}

    def stem(self, tokens: list[str]) -> list[str]:
        cache = self._cache
        stem_word = self.stemmer.stem_word
        if len(cache) > self.max_entries:
            cache.clear()
        out = []
        for t in tokens:
            s = cache.get(t)
            if s is None:
                s = stem_word(t)
                cache[t] = s
            out.append(s)
        return out


_warned_fallback: set[str] = set()


def create_stemmer(name, lang: str):
    """Stemmer registry (reference text.py:500-524 seam).

    ``False``/``None`` -> no stemmer. "porter" -> PorterStemmer,
    "parsivar" -> FarsiStemmer. "spacy"/"stanza" are FULL-PIPELINE
    stemmers in the reference — the factory returns the tokenizer
    object itself (text.py:518-519), so standalone construction here
    only happens when the tokenizer is NOT the matching pipeline:

    - library importable -> raise: the reference requires
      ``tokenize == stem`` for these (text.py:457-461 validation), so
      asking for a standalone model stemmer is a config error;
    - library absent + eng -> the rule-based
      :class:`EnglishLemmatizer` with a ONE-TIME warning that this is
      a deterministic non-parity fallback (indexes built with it are
      not token-compatible with model-built ones);
    - otherwise -> NotImplementedError citing the seam.
    """
    if not name:
        return None
    if name == "porter":
        return CachedStemmer(PorterStemmer(lang))
    if name == "parsivar":
        return CachedStemmer(FarsiStemmer(lang))
    if name in ("spacy", "stanza"):
        try:
            __import__(name)
        except ImportError:
            if name == "spacy" and lang == "eng":
                if lang not in _warned_fallback:
                    _warned_fallback.add(lang)
                    import warnings

                    warnings.warn(
                        "spaCy is not installed: 'stem: spacy' (eng) "
                        "falls back to the rule-based EnglishLemmatizer "
                        "— deterministic but NOT model-parity; indexes "
                        "are token-incompatible with spaCy-built ones",
                        RuntimeWarning, stacklevel=2)
                return CachedStemmer(EnglishLemmatizer(lang))
            raise NotImplementedError(
                f"stemmer '{name}' ({lang}) requires the {name} package "
                "and model, not available in this environment "
                "(reference text.py:163-386 seam)"
            ) from None
        raise ValueError(
            f"'{name}' lemmatization runs inside the {name} tokenizer "
            f"pipeline: set tokenize='{name}' together with "
            f"stem='{name}' (reference text.py:457-461 requires it; "
            "the factory then shares one pipeline object)"
        )
    raise ValueError(f"Unknown stemmer: {name}")
