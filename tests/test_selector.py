"""CSS-selector kernel (X-sel — reference API surface pathik/cli.py:
129-131, schema.py:81-86): grammar, matching semantics, determinism."""

from __future__ import annotations

import pytest

from pathik_spark.kernels.extract import parse_html
from pathik_spark.kernels.selector import parse_selector, select_nodes, select_text

DOC = b"""
<html><body>
  <div id="main" class="content wide">
    <h1>Title</h1>
    <p class="lead intro">Lead paragraph</p>
    <p>Second   paragraph
       wraps</p>
    <div class="nested">
      <p class="lead">Nested lead</p>
      <span data-x="1">tagged</span>
    </div>
  </div>
  <div class="sidebar">
    <p class="lead">Sidebar lead</p>
    <a href="/x">link</a>
  </div>
</body></html>
"""


def _texts(selector: str) -> str:
    return select_text(DOC, selector)


def test_tag_selector():
    assert _texts("h1") == "Title"


def test_class_selector_matches_all_in_doc_order():
    assert _texts(".lead") == "Lead paragraph\n\nNested lead\n\nSidebar lead"


def test_id_selector():
    out = _texts("#main")
    assert out.startswith("Title")
    assert "Sidebar" not in out


def test_compound_tag_class():
    assert _texts("p.lead.intro") == "Lead paragraph"


def test_descendant_combinator_scopes():
    assert _texts("#main .lead") == "Lead paragraph\n\nNested lead"
    assert _texts(".sidebar .lead") == "Sidebar lead"


def test_child_combinator_excludes_grandchildren():
    # source newlines split paragraphs — same discipline as article
    # extraction's _paragraphs; "Nested lead" (a grandchild) is excluded
    assert _texts("#main > p") == "Lead paragraph\n\nSecond paragraph\n\nwraps"


def test_descendant_backtracks_past_nearest_ancestor():
    # div div span: nearest ancestor chain is (#main > .nested > span);
    # the OUTER div must be allowed to satisfy the first step
    doc = b'<div id="a"><div id="b"><span>x</span></div></div>'
    root = parse_html(doc.decode())
    assert len(select_nodes(root, "div div span")) == 1


def test_attribute_selectors():
    assert _texts("[data-x]") == "tagged"
    assert _texts('[data-x="1"]') == "tagged"
    assert _texts('[data-x="2"]') == ""
    assert _texts('a[href="/x"]') == "link"


def test_group_dedupes_and_keeps_document_order():
    # h1 matches once even though both alternatives hit elements around it
    assert _texts("h1, #main h1") == "Title"
    assert _texts("h1, .sidebar a") == "Title\n\nlink"


def test_universal_selector_with_class():
    assert _texts("*.intro") == "Lead paragraph"


def test_whitespace_discipline_matches_extraction():
    # runs of spaces collapse to single spaces inside a paragraph
    assert "Second paragraph" in _texts("#main > p")
    assert "Second   paragraph" not in _texts("#main > p")


def test_no_match_and_empty_doc():
    assert _texts("article.missing") == ""
    assert select_text(b"", "p") == ""
    assert select_text(None, "p") == ""


def test_unsupported_syntax_fails_loudly():
    for bad in ("p:first-child", "p ~ span", "p + p", "", "p >", "> p", "a,,b"):
        with pytest.raises(ValueError):
            parse_selector(bad)


def test_drop_subtrees_not_special_cased():
    # selector extraction matches the raw tree (scripts are selectable
    # on purpose — the user asked for them); article extraction's DROP
    # list applies only to readability
    doc = b"<body><script>var x;</script><p>text</p></body>"
    root = parse_html(doc.decode())
    assert len(select_nodes(root, "script")) == 1
