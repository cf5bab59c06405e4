"""HTML → text extraction: tag/script stripping, entity decoding,
block-boundary newlines, the WARC-response → documents composition,
and the pluggable-extractor hook."""

import pytest
from pyspark.sql import Row, functions as F

from lantern_spark.functions.html import (
    extract_text_udf_hook,
    html_title,
    html_to_text,
)

PAGE = """<!DOCTYPE html>
<html><head>
<title>My &amp; Your &lt;Page&gt;</title>
<style>body { color: red; } .x { display:none }</style>
<script type="text/javascript">var x = "<p>not text</p>";</script>
</head>
<body>
<!-- a comment with <p>markup</p> inside -->
<h1>Heading&nbsp;One</h1>
<p>First paragraph with <b>bold</b> and <a href="/x?a=1&amp;b=2">a link</a>.</p>
<div>Second   block&#39;s text &mdash; with entities&hellip;</div>
<ul><li>item one</li><li>item two</li></ul>
<template><span>hidden template</span></template>
</body></html>"""


def _extract(spark, html):
    return spark.createDataFrame([Row(html=html)]).select(
        html_to_text("html").alias("t"), html_title("html").alias("title")
    ).first()


class TestHtmlToText:
    def test_scripts_styles_comments_dropped(self, spark):
        r = _extract(spark, PAGE)
        assert "color: red" not in r.t
        assert "var x" not in r.t
        assert "not text" not in r.t
        assert "comment with" not in r.t
        assert "hidden template" not in r.t

    def test_text_and_entities(self, spark):
        r = _extract(spark, PAGE)
        assert "Heading One" in r.t
        assert "First paragraph with bold and a link." in r.t
        assert "Second block's text — with entities…" in r.t
        assert "item one" in r.t and "item two" in r.t

    def test_block_boundaries_become_newlines(self, spark):
        r = _extract(spark, PAGE)
        lines = [ln for ln in r.t.split("\n") if ln]
        # heading / paragraph / div / list items on separate lines
        assert any(ln.startswith("Heading One") for ln in lines)
        assert any(ln.startswith("First paragraph") for ln in lines)
        idx_h = next(i for i, ln in enumerate(lines) if "Heading" in ln)
        idx_p = next(i for i, ln in enumerate(lines) if "First paragraph" in ln)
        assert idx_h < idx_p

    def test_title(self, spark):
        r = _extract(spark, PAGE)
        assert r.title == "My & Your <Page>"

    def test_amp_decoded_last(self, spark):
        # &amp;lt; must become the literal text '&lt;', NOT '<'
        r = _extract(spark, "<p>a &amp;lt; b</p>")
        assert r.t == "a &lt; b"

    def test_null_and_plain_text(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, "no tags, just text")], "id long, html string"
        )
        rows = {r.id: r.t for r in df.select(
            "id", html_to_text("html").alias("t")).collect()}
        assert rows[1] is None
        assert rows[2] == "no tags, just text"

    def test_plan_is_pure_expressions(self, spark):
        df = spark.createDataFrame([Row(html=PAGE)])
        plan = (
            df.select(html_to_text("html"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan


class TestWarcResponseComposition:
    def test_warc_html_to_documents(self, spark, tmp_path):
        from lantern_spark.sources.warc import (
            read_warc,
            wet_documents,
            write_warc,
        )

        p = tmp_path / "html.warc"
        write_warc(
            str(p),
            [
                {
                    "warc_type": "response",
                    "url": "https://example.com/page",
                    "payload": PAGE,
                    "content_type": "text/html",
                    "record_id": "<urn:uuid:html-1>",
                }
            ],
        )
        raw = read_warc(spark, str(p), record_types=["response"])
        docs = wet_documents(
            extract_text_udf_hook(
                raw.withColumn("html", F.col("payload").cast("string")),
                "html",
            ),
            text_col="text",
        )
        row = docs.first()
        assert row.url == "https://example.com/page"
        assert "First paragraph with bold and a link." in row.text
        assert "var x" not in row.text

    def test_custom_extractor_hook(self, spark):
        import pandas as pd

        df = spark.createDataFrame([Row(html=PAGE)])
        out = extract_text_udf_hook(
            df, "html", extractor=lambda s: pd.Series(["CUSTOM"] * len(s))
        )
        assert out.first().text == "CUSTOM"


class TestReviewFixes:
    def test_unclosed_head_does_not_leak_title(self, spark):
        html = (
            "<html><head><title>Buy Cheap Pills</title><meta x=1>"
            "<body><p>real article text</p>"
        )
        r = spark.createDataFrame([Row(html=html)]).select(
            html_to_text("html").alias("t")).first()
        assert "Buy Cheap Pills" not in r.t
        assert "real article text" in r.t

    def test_unclosed_script_consumes_to_eof(self, spark):
        html = "<p>before</p><script>var leaked = 'nope';"
        r = spark.createDataFrame([Row(html=html)]).select(
            html_to_text("html").alias("t")).first()
        assert r.t == "before"

    def test_numeric_refs_hex_vs_decimal(self, spark):
        rows = spark.createDataFrame(
            [
                (1, "<p>Chapter &#x32;</p>"),   # hex 32 = '2', keep
                (2, "<p>a&#32;b</p>"),          # decimal 32 = space
                (3, "<p>a&#x20;b</p>"),         # hex 20 = space
                (4, "<p>use &amp;#32; here</p>"),  # author wrote &#32;
            ],
            "id long, html string",
        ).select("id", html_to_text("html").alias("t")).collect()
        got = {r.id: r.t for r in rows}
        assert got[1] == "Chapter &#x32;"  # not decoded to a space
        assert got[2] == "a b"
        assert got[3] == "a b"
        assert got[4] == "use &#32; here"  # no double decode
