"""Encoding-damage (mojibake) detection + exact repair
(functions/mojibake.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathik_spark.functions.mojibake import (
    MOJIBAKE_TABLE,
    is_mojibake,
    mojibake_score,
    repair_mojibake,
)


def _run(spark, texts, passes=1):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    rows = df.select(
        "i",
        mojibake_score(F.col("t")).alias("score"),
        is_mojibake(F.col("t")).alias("flag"),
        repair_mojibake(F.col("t"), passes=passes).alias("fixed"),
    ).collect()
    return {r["i"]: (r["score"], r["flag"], r["fixed"]) for r in rows}


def test_table_is_generated_and_inverse(spark):
    # every damaged form really is the utf-8 bytes of its target read as
    # sloppy cp1252 — the generator is the spec, this pins it
    assert len(MOJIBAKE_TABLE) > 80
    for bad, good in MOJIBAKE_TABLE:
        assert len(good) == 1 and ord(good) > 127
        assert bad != good and len(bad) in (2, 3)


def test_detect_and_repair_classic_cases(spark):
    got = _run(
        spark,
        [
            "CafÃ© au lait",          # é
            "donâ€™t stop",            # ’
            "Ã¼ber naÃ¯ve faÃ§ade",    # ü ï ç
            "price â‚¬ 5",             # €
            "plain ascii text",
            "café already clean, naïve too",
        ],
    )
    assert got[0] == (1, True, "Café au lait")
    assert got[1] == (2, True, "don’t stop")  # 3-byte char weighs 2
    assert got[2] == (3, True, "über naïve façade")
    assert got[3] == (2, True, "price € 5")
    assert got[4] == (0, False, "plain ascii text")
    # clean accented text: untouched, unflagged (no false positives)
    assert got[5] == (0, False, "café already clean, naïve too")


def test_double_encoding_unwinds_with_two_passes(spark):
    from pathik_spark.functions.mojibake import _sloppy_cp1252_decode

    def damage(s: str) -> str:
        return _sloppy_cp1252_decode(s.encode("utf-8"))

    double = damage(damage("Caf\u00e9"))
    got2 = _run(spark, [double], passes=2)[0]
    assert got2[2] == "Caf\u00e9"


def test_repair_inverts_damage_for_every_target(spark):
    from pathik_spark.functions.mojibake import _TARGETS, _sloppy_cp1252_decode

    texts = [f"x {_sloppy_cp1252_decode(c.encode('utf-8'))} y" for c in _TARGETS]
    got = _run(spark, texts)
    for i, c in enumerate(_TARGETS):
        assert got[i][2] == f"x {c} y", f"target {c!r}: {got[i][2]!r}"


def test_null_and_empty(spark):
    got = _run(spark, [None, ""])
    assert got[0] == (None, None, None)
    assert got[1] == (0, False, "")


def test_repair_is_scan_local(spark):
    df = spark.createDataFrame([("x",)], "t string")
    plan = (
        df.select(repair_mojibake(F.col("t")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
