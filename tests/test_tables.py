"""Pins for HTML table extraction (htmldom/tables.py) and its Spark
surface (operators/tables.py::extract_table_cells)."""

import pytest

from htmlparser_spark.htmldom.parse import parse
from htmlparser_spark.htmldom.tables import extract_tables


CASES = [
    # basic table, header row via th
    ("<table><tr><th>h1</th><th>h2</th></tr>"
     "<tr><td>a</td><td>b</td></tr></table>",
     [(0, 0, 0, True, "h1"), (0, 0, 1, True, "h2"),
      (0, 1, 0, False, "a"), (0, 1, 1, False, "b")]),
    # thead/tbody/tfoot are transparent wrappers
    ("<table><thead><tr><th>k</th></tr></thead>"
     "<tbody><tr><td>v</td></tr></tbody>"
     "<tfoot><tr><td>f</td></tr></tfoot></table>",
     [(0, 0, 0, True, "k"), (0, 1, 0, False, "v"),
      (0, 2, 0, False, "f")]),
    # two sibling tables number independently
    ("<table><tr><td>x</td></tr></table>"
     "<table><tr><td>y</td></tr></table>",
     [(0, 0, 0, False, "x"), (1, 0, 0, False, "y")]),
    # caption / colgroup contribute no cells
    ("<table><caption>cap</caption><colgroup><col></colgroup>"
     "<tr><td>c</td></tr></table>",
     [(0, 0, 0, False, "c")]),
    # inline markup inside a cell flattens via to_text(raw=True)
    ("<table><tr><td><b>x</b> 2</td></tr></table>",
     [(0, 0, 0, False, "x 2")]),
    # script boilerplate inside a cell is stripped
    ("<table><tr><td> spaced  <script>junk</script>text </td></tr>"
     "</table>",
     [(0, 0, 0, False, "spaced text")]),
    # no tables => no cells
    ("no tables here <p>x</p>", []),
    # empty input
    ("", []),
]


@pytest.mark.parametrize("html,want", CASES)
def test_table_cases(html, want):
    assert extract_tables(parse(html)) == want


def test_nested_table_own_numbering():
    # nested table gets its own table_idx; its cells are not
    # re-reported as rows of the outer table, but the outer cell's
    # flattened text does include the nested content (to_text of the
    # cell subtree).
    h = ("<table><tr><td>outer"
         "<table><tr><td>inner</td></tr></table>"
         "</td></tr></table>")
    assert extract_tables(parse(h)) == [
        (0, 0, 0, False, "outer inner"),
        (1, 0, 0, False, "inner"),
    ]


def test_unclosed_td_generic_closure():
    # the parser uses the reference's generic implicit closure
    # (html.cpp:575-627), not HTML5's sibling-closes-sibling rule:
    # `<td>a<td>b` nests, so the row has ONE cell whose text
    # flattens both. Pinned so a future tokenizer change is visible.
    h = "<table><tr><td>a<td>b</tr><tr><td>c</td></table>"
    assert extract_tables(parse(h)) == [
        (0, 0, 0, False, "a b"), (0, 1, 0, False, "c")]


def test_table_depth_proof():
    deep = "<div>" * 200_000 + "<table><tr><td>x</td></tr></table>"
    assert extract_tables(parse(deep)) == [(0, 0, 0, False, "x")]


def test_extract_table_cells_spark_surface(spark):
    from htmlparser_spark.operators.tables import extract_table_cells
    from htmlparser_spark.plans import assert_no_python_row_udf

    df = spark.createDataFrame(
        [(1, "<table><tr><th>k</th></tr><tr><td>v</td></tr></table>"),
         (2, "plain text, no table"),
         (3, None)],
        "doc_id long, text string")
    out = extract_table_cells(df)
    assert out.columns == ["doc_id", "table_idx", "row_idx",
                           "col_idx", "is_header", "cell_text"]
    assert_no_python_row_udf(out)
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [(1, 0, 0, 0, True, "k"), (1, 0, 1, 0, False, "v")]
