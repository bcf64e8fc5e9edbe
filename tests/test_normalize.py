"""Normalization golden tests.

Mirrors /root/reference/tests/test_util_normalize.py:21-69.
"""
from patapsco_ray.text.normalize import (
    Normalizer,
    fix_encoding,
    remove_control_chars,
    remove_format_chars,
    standardize_combining_chars,
    update_spaces,
)

RSQUO = chr(0x2019)
MOJI_LATIN1 = chr(0xE2) + chr(0x80) + chr(0x99)
MOJI_CP1252 = chr(0xE2) + chr(0x20AC) + chr(0x2122)


def test_fix_encoding_latin1():
    assert fix_encoding("But we" + MOJI_LATIN1 + "ve come out") == \
        "But we" + RSQUO + "ve come out"


def test_fix_encoding_cp1252():
    assert fix_encoding("we" + MOJI_CP1252 + "ve") == "we" + RSQUO + "ve"


def test_fix_encoding_no_false_positive():
    cafe = "caf" + chr(0xE9) + " na" + chr(0xEF) + "ve"
    assert fix_encoding(cafe) == cafe


def test_spaces_tabs():
    assert update_spaces("a\t\tb") == "a b"


def test_multiple_spaces():
    assert update_spaces("a    b") == "a b"


def test_other_spaces():
    for cp in (0x0D, 0x20, 0x2009, 0x200A, 0x2028, 0x2029, 0x3000):
        assert update_spaces("a" + chr(cp) + "b") == "a b", hex(cp)


def test_remove_rtl():
    assert remove_format_chars("a" + chr(0x200E) + "b") == "ab"
    assert remove_format_chars("a" + chr(0x202C) + "b") == "ab"


def test_remove_control_chars():
    assert remove_control_chars("a" + chr(0xFEFF) + "b") == "ab"


def test_standardize_combining_chars():
    assert standardize_combining_chars(chr(0x43) + chr(0x327)) == chr(0xC7)
    assert standardize_combining_chars(chr(0x2160)) != "I"  # no NFKC
    assert standardize_combining_chars(chr(0xFF0C)) == chr(0xFF0C)


def test_pre_normalize_keeps_newlines():
    assert Normalizer(lowercase=False).pre_normalize("line1\nline2") == "line1\nline2"


def test_post_normalize_lowercase():
    assert Normalizer(lowercase=True).post_normalize("Test test") == "test test"
    assert Normalizer(lowercase=False).post_normalize("Test test") == "Test test"


def test_full_chain():
    n = Normalizer(lowercase=False)
    out = n.pre_normalize(
        "A" + chr(0x200B) + "  B" + chr(0x43) + chr(0x327) +
        " we" + MOJI_LATIN1 + "ve"
    )
    assert out == "A B" + chr(0xC7) + " we" + RSQUO + "ve"


def test_compare_strings_matches_reference_semantics():
    from patapsco_ray.text.normalize import compare_strings

    # one-char delete
    assert compare_strings("ab\x01c", "abc") == {"del \x01": 1}
    # 2->1 replace (mojibake repair shape)
    got = compare_strings("xæy", "xe y") or compare_strings("caf\xc3\xa9", "caf\xe9")
    assert isinstance(got, dict)
    # one-char insert
    assert compare_strings("ac", "abc") == {"ins b": 1}
    # multi-char edits are ignored
    assert compare_strings("abcdef", "xyzuvw") == {}


def test_normalization_report(ray_session):
    import ray.data

    from patapsco_ray.text.normalize import normalization_report

    rows = [{"text": "plain clean ascii"},
            {"text": "ctl\x01here"},
            {"text": "also\x01dirty\x01twice"},
            {"text": None}]
    rep = normalization_report(ray.data.from_items(rows)).to_pandas()
    as_dict = dict(zip(rep["change"], rep["count"]))
    assert as_dict == {"del \x01": 3}
