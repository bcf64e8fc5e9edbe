"""Byte-identity cross-checks against the reference implementation.

These load the reference's own normalize module (with ftfy stubbed to
identity — its encoding fixer is the one part we re-implement) and
assert our chain produces byte-identical output. Skipped when the
reference checkout is absent, so the repo remains standalone.
"""

import importlib.util
import pathlib
import random
import sys
import types

import pytest

REF = pathlib.Path("/root/reference/patapsco/util/normalize.py")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_normalizer():
    ftfy = types.ModuleType("ftfy")
    ftfy.fix_encoding = lambda s: s
    saved = sys.modules.get("ftfy")
    sys.modules["ftfy"] = ftfy
    try:
        spec = importlib.util.spec_from_file_location("ref_normalize", REF)
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
    finally:
        if saved is None:
            sys.modules.pop("ftfy", None)
        else:
            sys.modules["ftfy"] = saved

    class _Cfg:
        lowercase = True

    return ref.GenericNormalizer(_Cfg())


CURATED = [
    "hello   world",
    "tabs\tand nbsp and em-space",
    "keep\nnewlines\n\nplease  ",
    "bidi ‎ marks ‏ and ‪ overrides ‬ here",
    "joiners: zero​width‌non‍joiner ⁠word",
    "controls \x00\x01\x07\x1b\x7f gone",
    "combining: café and Å ring",
    "arabic: العَرَبِي"
    "َّة ؜ mark",
    "variation ️ selector",
    "soft­hyphen",
    "ＡＢＣ fullwidth",
    "ﬁ ligature and ½ fraction",
    "مُحَمَّد",
    "русский    тек"
    "ст",
    "中文 测试 文本",
    "emoji \U0001f600 stays",
]


def _random_cases(n=300, seed=42):
    rng = random.Random(seed)
    pool = [chr(c) for c in list(range(0x20, 0x2000)) + [
        0x200B, 0x200C, 0x200D, 0x200E, 0x200F, 0x202A, 0x202C,
        0x2060, 0x2066, 0xFE0F, 0x00A0, 0x00AD]]
    return ["".join(rng.choice(pool) for _ in range(rng.randint(1, 60)))
            for _ in range(n)]


def test_normalizer_byte_identity(ref_normalizer):
    from patapsco_ray.text.normalize import Normalizer

    mine = Normalizer(lowercase=True)
    for s in CURATED + _random_cases():
        r_pre = ref_normalizer.pre_normalize(s)
        m_pre = mine.pre_normalize(s)
        assert r_pre == m_pre, repr(s)
        assert ref_normalizer.post_normalize(r_pre) == \
            mine.post_normalize(m_pre), repr(s)


def test_stopword_lists_match_reference():
    ref_dir = pathlib.Path("/root/reference/patapsco/resources/stopwords")
    ours_dir = pathlib.Path(
        "patapsco_ray/resources/stopwords")
    from patapsco_ray.text.stopwords import load_stopwords

    checked = 0
    for src_dir in sorted(ref_dir.iterdir()):
        for f in sorted(src_dir.glob("*.txt")):
            ours = ours_dir / src_dir.name / f.name
            if not ours.exists():
                continue
            ref_words = {w.strip() for w in f.read_text().splitlines()
                         if w and w[0] != "#"}
            assert load_stopwords(src_dir.name, f.stem) == ref_words, f
            checked += 1
    assert checked >= 5


def test_porter_matches_reference_golden():
    # reference tests/test_text.py golden: Orwell sentence through
    # nltk PorterStemmer(NLTK_EXTENSIONS, to_lowercase=False)
    from patapsco_ray.text.stem import PorterStemmer

    st = PorterStemmer()
    tokens = ("It was a bright cold day in April and "
              "the clocks were striking thirteen").split()
    out = [st.stem_word(t) for t in tokens]
    assert out == ("It wa a bright cold day in April and "
                   "the clock were strike thirteen").split()
