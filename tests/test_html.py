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


class TestHtmlLinks:
    """r11: crawl-graph edge extraction — <a href> targets as pure
    expressions, with RFC 3986-style relative resolution."""

    PAGE = (
        '<html><body>'
        '<a href="https://other.example.com/abs">abs</a>'
        "<a href='/root-rel?q=1'>rr</a>"
        '<a href="sub/page.html">rel</a>'
        '<a href="../up.html">up</a>'
        '<a href="//cdn.example.net/x.js">proto</a>'
        '<a href="#frag">frag-only</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a href="/amp?a=1&amp;b=2">amp</a>'
        '<A HREF="UPPER.HTML">case</A>'
        "</body></html>"
    )

    def test_extraction_filters_pseudo_links(self, spark):
        from lantern_spark.functions.html import html_links
        from pyspark.sql import Row

        links = (
            spark.createDataFrame([Row(html=self.PAGE)])
            .select(html_links("html").alias("l"))
            .first()
            .l
        )
        assert links == [
            "https://other.example.com/abs",
            "/root-rel?q=1",
            "sub/page.html",
            "../up.html",
            "//cdn.example.net/x.js",
            "/amp?a=1&b=2",  # &amp; decoded
            "UPPER.HTML",
        ]

    def test_null_html_empty_array(self, spark):
        from lantern_spark.functions.html import html_links

        df = spark.createDataFrame([(1, None)], "i long, html string")
        assert df.select(html_links("html").alias("l")).first().l == []

    def test_resolution_cases(self, spark):
        from lantern_spark.functions.html import resolve_link

        base = "https://example.com/a/b/page.html?old=1#sec"
        cases = [
            ("https://other.example.com/abs", "https://other.example.com/abs"),
            ("/root-rel?q=1", "https://example.com/root-rel?q=1"),
            ("sub/page.html", "https://example.com/a/b/sub/page.html"),
            ("../up.html", "https://example.com/a/up.html"),
            ("../../twice.html", "https://example.com/twice.html"),
            ("//cdn.example.net/x.js", "https://cdn.example.net/x.js"),
            ("?q=2", "https://example.com/a/b/page.html?q=2"),
            ("next.html#frag", "https://example.com/a/b/next.html"),
            ("", "https://example.com/a/b/page.html?old=1"),
        ]
        df = spark.createDataFrame(
            [(i, base, l) for i, (l, _) in enumerate(cases)],
            "i long, base string, link string",
        )
        got = {
            r.i: r.out
            for r in df.select(
                "i", resolve_link("base", "link").alias("out")
            ).collect()
        }
        for i, (l, want) in enumerate(cases):
            assert got[i] == want, (l, got[i], want)

    def test_pathless_base_and_non_url_base(self, spark):
        from lantern_spark.functions.html import resolve_link

        df = spark.createDataFrame(
            [
                (0, "https://example.com", "x.html"),
                (1, "not a url", "x.html"),
            ],
            "i long, base string, link string",
        )
        got = {
            r.i: r.out
            for r in df.select(
                "i", resolve_link("base", "link").alias("out")
            ).collect()
        }
        assert got[0] == "https://example.com/x.html"
        assert got[1] == "x.html"  # no base to resolve against

    def test_duckdb_replay(self, spark):
        """Extraction replays in DuckDB (Java∩RE2 dialect claim of the
        module) — same regex, same &amp; decode, same filters."""
        import duckdb

        from lantern_spark.functions.html import html_links
        from pyspark.sql import Row

        got = (
            spark.createDataFrame([Row(html=self.PAGE)])
            .select(html_links("html").alias("l"))
            .first()
            .l
        )
        con = duckdb.connect()
        want = con.execute(
            """
            SELECT list_filter(
              list_transform(
                regexp_extract_all(?,
                  '(?i)<a\\b[^>]*?\\bhref\\s*=\\s*["'']([^"''>]+)["'']', 1),
                u -> replace(trim(u), '&amp;', '&')),
              u -> u <> '' AND u NOT LIKE '#%'
                AND NOT regexp_matches(lower(u),
                  '^(javascript|mailto|tel|data):'))
            """,
            [self.PAGE],
        ).fetchone()[0]
        assert got == want

    def test_plan_is_pure_expressions(self, spark):
        from lantern_spark.functions.html import html_links, resolve_link
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(html=self.PAGE, base="https://e.com/a/")]
        )
        plan = (
            df.select(
                F.explode(html_links("html")).alias("l"), "base"
            )
            .select(resolve_link("base", "l"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan


class TestMergedDropContentPass:
    """r11: the single leftmost-first drop-content pass (1.4× on the
    bench corpus) must agree with a per-tag reference on well-formed
    soup, and its one intentional divergence — cross-nested UNCLOSED
    containers — follows browser CDATA semantics."""

    def _legacy(self, col):
        # the pre-r11 per-tag sequential chain, kept here as the
        # comparison reference
        from lantern_spark.functions.html import (
            _BLOCK,
            _DROP_CONTENT,
            _ENTITIES,
        )

        t = F.col(col)
        for tag in _DROP_CONTENT:
            stop = (
                f"</{tag}\\s*>|$"
                if tag != "head"
                else "</head\\s*>|(?=<body\\b)|$"
            )
            t = F.regexp_replace(t, f"(?is)<{tag}\\b[^>]*>.*?(?:{stop})", " ")
        t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
        t = F.regexp_replace(t, f"(?i)</?({_BLOCK})\\b[^>]*/?>", "\n")
        t = F.regexp_replace(t, r"(?s)<[^>]+>", "")
        t = F.regexp_replace(t, r"&#0*32;|&#[xX]0*20;", " ")
        for ent, rep in _ENTITIES:
            t = F.regexp_replace(t, ent, rep)
        t = F.regexp_replace(t, r"[ \t\r\f]+", " ")
        t = F.regexp_replace(t, r" ?\n ?", "\n")
        t = F.regexp_replace(t, r"\n{2,}", "\n\n")
        return F.regexp_replace(t, r"^\s+|\s+$", "")

    def test_agrees_with_per_tag_reference(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select(
            F.concat(
                F.lit("<html><head><title>t</title><style>.x{}</style>"
                      "</head><body><script>var a=1;</script><p>"),
                F.col("text"),
                F.lit("</p><svg><rect/></svg></body></html>"),
            ).alias("html")
        )
        diff = docs.select(
            (html_to_text("html") != self._legacy("html")).cast("int").alias("d")
        ).agg(F.sum("d").alias("n")).first()["n"]
        assert diff == 0

    def test_regex_extractor_byte_identical_on_corpus(self, spark):
        """r12 (VERDICT r11 stretch item 8): the Python-re Arrow fast
        path must be BYTE-IDENTICAL to the Catalyst chain — same
        EXTRACT_STEPS data, re.ASCII pinning \\s/\\b to Java's ASCII
        classes. Corpus-shaped pages plus the edge forms that would
        expose a dialect divergence."""
        from lantern_spark.functions.html import (
            extract_text_udf_hook,
            regex_text_extractor,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select(
            F.concat(
                F.lit("<html><head><title>t</title><style>.x{}</style>"
                      "</head><body><script>var a=1;</script><p>"),
                F.col("text"),
                F.lit("</p><svg><rect/></svg></body></html>"),
            ).alias("html")
        )
        edge = spark.createDataFrame(
            [
                # raw NBSP: unicode-\s would eat it, ASCII-\s must not
                ("<p>a b</p>",),
                ("<p>trailing newline</p>\n",),
                # trailing NBSP: unicode \s+$ would strip it, Java's
                # ASCII \s (and re.ASCII) must keep it
                ("<p>edge</p> ",),
                ("<script>unclosed to eof",),
                ("<p>before</p><style>.x{<script>}</style><p>after</p>",),
                ("&amp;#32; &#x32; &#0032; &#x20;",),
                ("<P CLASS='x'>UPPER</P><B>b</B>.",),
                ("no tags at all",),
                (None,),
            ],
            "html string",
        )
        for df in (docs, edge):
            both = extract_text_udf_hook(
                df, "html", out_col="fast",
                extractor=regex_text_extractor(),
            )
            both = extract_text_udf_hook(
                both, "html", out_col="seq",
                extractor=regex_text_extractor(fused=False),
            )
            from lantern_spark.functions.html import html_to_text

            both = both.withColumn("expr", html_to_text("html"))
            diff = both.where(
                ~F.col("fast").eqNullSafe(F.col("expr"))
                | ~F.col("seq").eqNullSafe(F.col("expr"))
            ).count()
            assert diff == 0

    def test_fused_extractor_entity_whitespace_zoo(self):
        """r13 (stretch item 8): the fused single-pass entity +
        whitespace tail must equal the sequential EXTRACT_STEPS replay
        byte-for-byte on the forms where one-pass and sequential
        semantics COULD diverge: entity cascades (&amp;lt; must stay
        '&lt;' — the reason &amp; is last), adjacent/overlapping
        entities, bare '&', and every whitespace-run shape the three
        sequential passes canonicalize."""
        import pandas as pd

        from lantern_spark.functions.html import regex_text_extractor

        zoo = [
            "&amp;lt; &amp;amp; &lt;&gt;&amp;",
            "&&amp;lt;",
            "a&nbsp;&nbsp;b &quot;q&quot; &#34;x&#39;",
            "&unknown; &amp &; & amp;",
            "&mdash;&ndash;&hellip;&copy;",
            "a  b\tc\rd\fe",
            "a \n b \n\n c\n\n\n\nd",
            "a\r\nb \r\n \r\n c",
            " \n leading and trailing \n ",
            "word space word",
            "<p>a</p>\n<p>b</p>",
            "mixed&nbsp;\n&nbsp;runs",
            "",
            # r14 shapes targeting the C-level whitespace rework:
            # \v is NOT in [ \t\r\f]+ and must survive mid-text (and
            # be trimmed at the edges); multi-space runs around
            # newlines; space-only and \v-only lines; deep blank-line
            # runs at the edges; lone-space edges of inner lines
            "a\x0bb",
            "\x0b mid \x0b",
            "a   \n   b",
            "x\n \ny\n\x0b\nz",
            "\n\n\n a \n\n\n",
            " a \n b ",
            "\t\r\f",
            "  ",
        ]
        fast = regex_text_extractor(fused=True)
        seq = regex_text_extractor(fused=False)
        got = list(fast(pd.Series(zoo)))
        want = list(seq(pd.Series(zoo)))
        assert got == want, [
            (z, g, w) for z, g, w in zip(zoo, got, want) if g != w
        ]

    def test_cross_nested_unclosed_follows_browser_semantics(self, spark):
        # '<style><script></style>after' — a browser treats the script
        # tag as style CDATA and resumes after </style>; the merged
        # leftmost-first pass does too (the old per-tag order let the
        # script arm eat to EOF)
        html = "<p>before</p><style>.x{<script>}</style><p>after</p>"
        r = spark.createDataFrame([(html,)], "html string").select(
            html_to_text("html").alias("t")).first()
        assert "before" in r.t and "after" in r.t
        assert "script" not in r.t and ".x{" not in r.t
