"""HTML main-content extraction: kernel heuristics + Spark e2e parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parser_spark.kernel.htmlx import extract_main_text


def test_strips_script_style_nav_footer():
    html = """<html><head><title>T</title><script>var x=1;</script>
    <style>p{}</style></head><body>
    <nav><a href=x>navigation link text that is long enough here</a></nav>
    <p>This is the actual body paragraph with plenty of characters.</p>
    <footer>footer text that is definitely long enough to keep</footer>
    </body></html>"""
    res = extract_main_text(html)
    assert res["title"] == "T"
    assert res["text"] == ("This is the actual body paragraph with "
                           "plenty of characters.")
    assert res["n_chrome_blocks"] >= 1


def test_chrome_by_class_and_link_density():
    html = """<body>
    <div class="sidebar"><p>long enough sidebar content to otherwise keep
    around here</p></div>
    <div><a href=x>link one text</a> <a href=y>link two text</a>
    <a href=z>link three text</a></div>
    <article><p>Real content survives with sufficient length to pass the
    minimum block threshold.</p></article></body>"""
    res = extract_main_text(html)
    assert "Real content survives" in res["text"]
    assert "sidebar" not in res["text"]
    assert "link one" not in res["text"]


def test_misnested_and_garbage_never_raise():
    for s in ["</div></p><p>x", "<a><b><c>", "", "<<<>>>",
              "<div class=sidebar><p>unclosed everywhere",
              "plain text " * 10]:
        res = extract_main_text(s)
        assert isinstance(res["text"], str)


def test_entities_decoded():
    res = extract_main_text(
        "<p>A &amp; B &lt;= C with enough padding characters here.</p>")
    assert "A & B <= C" in res["text"]


def test_spark_e2e_html_parity(spark):
    from pdf_parser_spark.operators.html_extract import extract_html_turns
    from pdf_parser_spark.sources.html_turns import html_golden, html_turns

    turns = html_turns(spark, 40, partitions=4)
    golden = (html_golden(spark, 40, partitions=4)
              .withColumnRenamed("text", "golden_text")
              .withColumnRenamed("title", "golden_title"))
    out = extract_html_turns(turns)
    j = out.join(golden, ["conv_id", "turn_idx"])
    total = j.count()
    assert total == 80
    assert j.filter(F.col("text") != F.col("golden_text")).count() == 0
    assert j.filter(F.col("title") != F.col("golden_title")).count() == 0


def test_queries_ex09_ex04(spark):
    from pdf_parser_spark.queries import (
        HTML_CHROME_BLOCKS_PER_PAGE, QUERIES,
    )
    rows9 = QUERIES["ex09_html_per_turn_golden"](
        spark, "unused").collect()
    assert len(rows9) > 0
    assert all(r["n_chrome_blocks"] == HTML_CHROME_BLOCKS_PER_PAGE
               for r in rows9)
    rows4 = QUERIES["ex04_conversation_rollup"](spark, "unused").collect()
    assert len(rows4) == 60
    assert all(r["n_turns"] >= 1 and r["conv_text_len"] >= 0
               for r in rows4)
