"""Tests for line-level corpus dedup and C4 cleaning (operators/linedup.py)."""

from __future__ import annotations

from pathik_spark.operators.linedup import (
    c4_clean,
    duplicate_lines,
    line_dedup,
)

BOILER = "Subscribe to our newsletter!"


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, f"{BOILER}\nUnique body of doc one.\n\nShared tail line."),
            (2, f"{BOILER}\nUnique body of doc two.\nShared tail line."),
            (3, f"{BOILER}\nUnique body of doc three."),
            (4, BOILER),  # all-boilerplate doc
        ],
        "doc_id long, text string",
    )


def test_duplicate_lines_threshold(spark):
    heavy = {r["sample_line"]: r["n_occurrences"] for r in duplicate_lines(_docs(spark)).collect()}
    assert heavy == {BOILER: 4, "Shared tail line.": 2}
    # raising the threshold drops the pair, keeps the 4x boilerplate
    heavy2 = [r["sample_line"] for r in duplicate_lines(_docs(spark), max_occurrences=2).collect()]
    assert heavy2 == [BOILER]


def test_duplicate_lines_normalized_matching(spark):
    docs = spark.createDataFrame(
        [(1, "Same   Line  here"), (2, "same line HERE"), (3, "other")],
        "doc_id long, text string",
    )
    heavy = duplicate_lines(docs).collect()
    assert len(heavy) == 1 and heavy[0]["n_occurrences"] == 2
    # sample is the lexicographic min of the RAW forms
    assert heavy[0]["sample_line"] == "Same   Line  here"


def test_line_dedup_removes_heavy_keeps_order(spark):
    got = {r["doc_id"]: r.asDict() for r in line_dedup(_docs(spark), max_occurrences=2).collect()}
    # boilerplate (4 > 2) removed everywhere; shared tail (2 <= 2) kept
    assert got[1]["text"] == "Unique body of doc one.\n\nShared tail line."
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (4, 3)
    assert got[2]["text"] == "Unique body of doc two.\nShared tail line."
    assert got[4]["text"] == "" and got[4]["n_kept"] == 0 and got[4]["n_lines"] == 1


def test_line_dedup_blank_lines_never_heavy(spark):
    docs = spark.createDataFrame(
        [(i, "a\n\nb" + str(i)) for i in range(5)], "doc_id long, text string"
    )
    got = line_dedup(docs).collect()
    # 'a' (5 occurrences) removed; the blank line (5 occurrences) kept
    for r in got:
        assert r["text"] == f"\nb{r['doc_id']}"


# --- C4 cleaning --------------------------------------------------------------


def test_c4_line_filters(spark):
    text = "\n".join(
        [
            "This is a perfectly good first sentence.",  # kept
            "Too short here.",  # < 5 words
            "this line has five words but no terminal punctuation",  # no terminal
            "Enable JavaScript to view these comments now.",  # blocklist
            "Check the cookie policy before you continue browsing.",  # blocklist
            'A quoted ending also counts as terminal punctuation."',  # kept
            "  Padded line with spaces gets trimmed before checks.  ",  # kept
        ]
    )
    got = c4_clean(spark.createDataFrame([(1, text)], "doc_id long, text string")).collect()[0]
    assert got["n_lines_kept"] == 3
    assert got["keep"] is True
    assert got["text"].split("\n") == [
        "This is a perfectly good first sentence.",
        'A quoted ending also counts as terminal punctuation."',
        "Padded line with spaces gets trimmed before checks.",
    ]


def test_c4_doc_gates(spark):
    good = "Alpha beta gamma delta epsilon zeta.\n" * 3
    docs = spark.createDataFrame(
        [
            (1, good.strip()),
            (2, good.strip() + "\nSome lorem ipsum filler appears in this doc."),
            (3, good.strip() + "\nvar f = function() { return 1; }"),
            (4, "Only one good long sentence appears right here."),  # < min_lines
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["keep"] for r in c4_clean(docs).collect()}
    assert got == {1: True, 2: False, 3: False, 4: False}


def test_host_line_dedup_per_site_independence(spark):
    """A line that is template-heavy on host A (every page) but appears
    on one page of host B is removed ONLY from A's documents; unique
    body lines and blank lines always survive."""
    from pathik_spark.operators.linedup import host_line_dedup, host_template_lines

    nav = "Shared navigation bar line."
    rows = [
        # host A: nav on all 3 pages (100% > 50%) -> template
        (1, "a", f"{nav}\nBody one."),
        (2, "a", f"{nav}\n\nBody two."),
        (3, "a", f"{nav}\nBody three."),
        # host B: same line on 1 of 3 pages (33% < 50%) -> kept
        (4, "b", f"{nav}\nOther body."),
        (5, "b", "Plain page five."),
        (6, "b", "Plain page six."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    heavy = host_template_lines(docs).collect()
    assert [(r["grp"], r["n_docs"], r["group_docs"]) for r in heavy] == [("a", 3, 3)]

    got = {r["doc_id"]: r for r in host_line_dedup(docs).collect()}
    assert got[1]["text"] == "Body one."
    assert got[2]["text"] == "\nBody two."  # blank line survives
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (3, 2)
    assert got[4]["text"] == f"{nav}\nOther body."  # untouched on host B
    assert got[5]["text"] == "Plain page five."


def test_host_line_dedup_min_docs_floor(spark):
    """min_docs keeps tiny groups from declaring their only page's
    lines templates (1 of 1 docs = 100% but < min_docs)."""
    from pathik_spark.operators.linedup import host_template_lines

    docs = spark.createDataFrame(
        [(1, "solo", "Single page line.\nAnother line.")],
        "doc_id long, source string, text string",
    )
    assert host_template_lines(docs, min_docs=2).count() == 0


# --- paragraph dedup (keep-first) --------------------------------------------


def test_paragraph_dedup_keep_first(spark):
    from pathik_spark.operators.linedup import paragraph_dedup
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="unique one\n\nshared para\n\nalso one"),
            Row(doc_id=2, text="shared para\n\nunique two"),
            Row(doc_id=3, text="shared para"),
            Row(doc_id=4, text="   \n\n\t\n\n"),  # only blank paragraphs
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert got[1]["text"] == "unique one\n\nshared para\n\nalso one"
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 3)
    assert got[2]["text"] == "unique two"
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (2, 1)
    assert got[3]["text"] == "" and got[3]["n_kept"] == 0
    assert got[4]["text"] == "" and got[4]["n_paras"] == 0


def test_paragraph_dedup_first_within_one_doc(spark):
    from pathik_spark.operators.linedup import paragraph_dedup
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [Row(doc_id=7, text="dup\n\nmiddle\n\ndup")],
        "doc_id int, text string",
    )
    row = paragraph_dedup(docs).collect()[0]
    assert row["text"] == "dup\n\nmiddle"
    assert (row["n_paras"], row["n_kept"]) == (3, 2)
