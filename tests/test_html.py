"""operators/html: extraction semantics + leniency fuzzing. Oracle
equivalence of q96 is covered by test_parity."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from elephantdb_spark.operators.html import extract_html_text, html_to_text


class TestHtmlToText:
    def test_full_page(self):
        title, text = html_to_text(
            "<html><head><title>T &amp; t</title><style>p{}</style>"
            "<script>var a;</script></head><body><h1>Head</h1>"
            "<p>one</p><p>two  three</p><div>four<br>five</div>"
            "<script>drop('<p>not me</p>')</script></body></html>"
        )
        assert title == "T & t"
        assert text == "Head\none\ntwo three\nfour\nfive"

    def test_inline_elements_do_not_split(self):
        _, text = html_to_text("<p>a <b>bold</b> and <i>italic</i> run</p>")
        assert text == "a bold and italic run"

    def test_lists_tables_and_selfclosing(self):
        _, text = html_to_text(
            "<ul><li>x</li><li>y</li></ul><table><tr><td>z</td></tr></table>"
            "<p>a<br/>b</p>"
        )
        assert text == "x\ny\nz\na\nb"

    def test_whitespace_collapse_and_entities(self):
        _, text = html_to_text("<p>  a \n\t b  &lt;c&gt; &#65;  </p>")
        assert text == "a b <c> A"

    def test_malformed_and_empty(self):
        assert html_to_text("<p>broken <b>markup")[1] == "broken markup"
        assert html_to_text("")[1] == ""
        assert html_to_text(None) == (None, "")
        assert html_to_text("<script>only junk</script>")[1] == ""
        assert html_to_text("no tags at all")[1] == "no tags at all"

    def test_first_title_wins(self):
        title, _ = html_to_text(
            "<title>first</title><p>x</p><title>second</title>"
        )
        assert title == "first"


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_html_to_text_never_raises(s):
    title, text = html_to_text(s)
    assert isinstance(text, str)


@given(st.lists(st.sampled_from(
    ["<p>", "</p>", "<script>", "</script>", "<div", ">", "txt ", "&amp;",
     "&#", "<!--", "-->", "<br/>", "<", "</", "\x00", "<title>", "</title>"]
), max_size=40))
@settings(max_examples=300, deadline=None)
def test_html_to_text_hostile_tag_soup_never_raises(parts):
    title, text = html_to_text("".join(parts))
    assert isinstance(text, str)


def test_spark_extract_html_text(spark):
    rows = [
        (1, "<html><head><title>A</title></head><body><p>x</p><p>y</p></body></html>"),
        (2, "<p>solo"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["id"]: (r["title"], r["text"])
           for r in extract_html_text(df, "doc_id", "html").collect()}
    assert got[1] == ("A", "x\ny")
    assert got[2] == (None, "solo")
    assert got[3] == (None, "")
    # zero-Exchange: rowwise scan stage
    plan = extract_html_text(df, "doc_id", "html")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


class TestTitleScoping:
    def test_svg_noscript_titles_do_not_shadow_real_title(self):
        """Review finding (r4): a <title> inside a skipped subtree is a
        tooltip/fallback, not the page title."""
        title, _ = html_to_text(
            "<head><noscript><title>NO</title></noscript>"
            "<title>Real</title></head><body>hi</body>"
        )
        assert title == "Real"
        title2, text2 = html_to_text(
            "<svg><title>icon tooltip</title></svg><p>body</p>"
        )
        assert title2 is None and text2 == "body"

    def test_head_title_still_captured_and_head_text_dropped(self):
        title, text = html_to_text(
            "<head><title>T</title>stray head text</head><body><p>x</p></body>"
        )
        assert title == "T" and text == "x"

    def test_implied_head_close_without_endtag(self):
        """Review finding (r4, pass 4): omitting </head> is spec-legal and
        common in crawls — body text must not be swallowed as head
        content."""
        title, text = html_to_text(
            "<head><title>T</title><body><p>hello</p><p>world</p></body>"
        )
        assert title == "T" and text == "hello\nworld"

    def test_passthrough_validation(self, spark):
        import pytest as _pt

        df = spark.createDataFrame([(1, "<p>x</p>", "u")],
                                   "doc_id long, html string, title string")
        with _pt.raises(ValueError, match="collide"):
            extract_html_text(df, "doc_id", "html", passthrough=("title",))
