"""Unit tests for operators/html.py on handcrafted markup — edge cases the
registry fixture (synthesized pages over documents) doesn't isolate."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from gridmr_spark.operators import html as H


def _extract(spark, markup: str) -> tuple[str, str, list[str]]:
    row = (
        spark.createDataFrame([(markup,)], "html string")
        .select(
            H.html_title(F.col("html")).alias("t"),
            H.main_text(F.col("html")).alias("m"),
            H.extract_links(F.col("html")).alias("l"),
        )
        .first()
    )
    return row.t, row.m, list(row.l)


def _extract_sql(markup: str) -> tuple[str, str]:
    con = duckdb.connect()
    esc = markup.replace("'", "''")
    t, m = con.execute(
        f"SELECT {H.html_title_sql('h')}, {H.main_text_sql('h')} "
        f"FROM (SELECT '{esc}' AS h)"
    ).fetchone()
    return t, m


PROSE = "one two three four five six seven"


def test_boilerplate_dropped_prose_kept(spark):
    t, m, links = _extract(
        spark,
        "<HTML><head><TITLE>My Page</TITLE>"
        "<style>p { color: red }</style>"
        "<script>for (var i = 0; i < 9; i++) { /* a > b */ }</script></head>"
        '<body><nav><a href="/x">Home</a> <a href="/y">About</a></nav>'
        f"<h1>Big Heading</h1><p>{PROSE}</p>"
        "<p>short one</p><footer>contact us</footer></body></HTML>",
    )
    assert t == "My Page"
    assert m == PROSE  # nav, heading, short block, footer, script all gone
    assert links == ["/x", "/y"]


def test_inline_tags_do_not_split_blocks(spark):
    _, m, _ = _extract(
        spark,
        "<p>alpha <b>beta</b> <i>gamma</i> <a href='/z'>delta</a> epsilon</p>",
    )
    assert m == "alpha beta gamma delta epsilon"


def test_entities_decode_once(spark):
    _, m, _ = _extract(
        spark,
        "<p>x &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b &amp;lt; done</p>",
    )
    # &amp;lt; decodes ONE level to &lt; (single-pass tokenizer semantics)
    assert m == 'x <tag> "q" \'s\' a b &lt; done'


def test_all_boilerplate_yields_empty_string_not_null(spark):
    _, m, _ = _extract(spark, "<p>too short</p><script>var x = 1;</script>")
    assert m == ""


def test_no_title_yields_empty(spark):
    t, _, _ = _extract(spark, f"<p>{PROSE}</p>")
    assert t == ""


def test_comment_and_template_content_stripped(spark):
    _, m, _ = _extract(
        spark,
        f"<!-- zero one two three four five six --><p>{PROSE}</p>"
        f"<template><p>{PROSE} hidden</p></template>",
    )
    assert m == PROSE


def test_spark_and_duckdb_renderings_agree(spark):
    """The one-spec/two-renderings contract, on markup with every rule."""
    markup = (
        "<html><head><title>T &amp; U</title><style>a{b:c}</style>"
        "<script>if (1 < 2) { x = '</div>'; }</script></head><body>"
        f"<ul><li>nav one</li><li>nav two</li></ul><div><p>{PROSE}</p>"
        "<p>Fish &amp; chips &lt; ten &quot;euros&quot; here today</p></div>"
        "<!-- c --><footer>fin</footer></body></html>"
    )
    t_s, m_s, _ = _extract(spark, markup)
    t_d, m_d = _extract_sql(markup)
    assert (t_s, m_s) == (t_d, m_d)
    assert m_s.splitlines() == [PROSE, 'Fish & chips < ten "euros" here today']


def test_synth_page_renderings_agree(spark):
    fields_s = {"doc_id": F.lit("7"), "text": F.lit(PROSE)}
    page_s = (
        spark.range(1).select(H.synth_page(fields_s).alias("h")).first().h
    )
    page_d = duckdb.connect().execute(
        "SELECT "
        + H.synth_page_sql({"doc_id": "'7'", "text": f"'{PROSE}'"})
    ).fetchone()[0]
    assert page_s == page_d
    assert "<title>Doc 7</title>" in page_s
