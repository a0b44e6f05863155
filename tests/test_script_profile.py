"""Unicode script profiling (functions/script.py)."""

from __future__ import annotations

from pathik_spark.functions.script import MICRO, script_profile


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )


def _profiles(spark, texts):
    return {
        r.doc_id: r for r in script_profile(_docs(spark, texts)).collect()
    }


def test_pure_scripts_detected(spark):
    texts = [
        "plain english text",
        "чистый русский текст",
        "中文文本",
        "نص عربي",
        "ελληνικό κείμενο",
        "한국어텍스트",
        "हिंदीपाठ",
        "ひらがなカタカナ",
    ]
    got = _profiles(spark, texts)
    expect = [
        "latin", "cyrillic", "han", "arabic",
        "greek", "hangul", "devanagari", "kana",
    ]
    for i, name in enumerate(expect):
        assert got[i].script == name, (i, got[i])
        assert got[i].script_frac_micro == MICRO  # single-script


def test_mixed_fraction(spark):
    # 6 latin chars, 3 cyrillic -> latin at 2/3
    [r] = _profiles(spark, ["abcdef мир"]).values()
    assert r.script == "latin"
    assert r.n_latin == 6 and r.n_cyrillic == 3
    assert r.script_frac_micro == MICRO * 2 // 3


def test_tie_breaks_by_listing_order(spark):
    [r] = _profiles(spark, ["aб"]).values()  # 1 latin, 1 cyrillic
    assert r.script == "latin"
    assert r.script_frac_micro == MICRO // 2


def test_no_script_is_unknown(spark):
    got = _profiles(spark, ["", "123 !!! ..."])
    for r in got.values():
        assert (r.script, r.script_frac_micro) == ("unknown", 0)


def test_latin_supplement_letters_count(spark):
    [r] = _profiles(spark, ["café naïve"]).values()
    assert r.script == "latin" and r.n_latin == 9


def test_mojibake_profiles_as_wrong_script(spark):
    # UTF-8 Russian mis-decoded as Latin-1 yields Latin-supplement
    # garbage — the profile flags it as latin, not cyrillic, which is
    # exactly the tripwire condition (header says ru, profile says la)
    garbled = "мир".encode("utf-8").decode("latin-1")
    [r] = _profiles(spark, [garbled]).values()
    assert r.script == "latin" and r.n_cyrillic == 0
