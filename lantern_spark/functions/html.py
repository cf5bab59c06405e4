"""HTML → text extraction as pure Catalyst expressions.

The missing link between raw WARC ``response`` records
(:func:`lantern_spark.sources.warc.read_warc`) and the ``documents``
pipeline: crawl HTML in, curation-ready text out. This is the
C4-lineage baseline tier — C4 itself was built with exactly this class
of tag-strip + line-filter extraction (Raffel et al. 2020 §2.2); the
higher-fidelity DOM extractors (trafilatura, jusText — what RefinedWeb
uses) are Python libraries this container doesn't ship, so
:func:`extract_text_udf_hook` documents the seam where one plugs in
without changing the pipeline shape.

Everything here is ``regexp_replace`` chains — JVM-side, whole-stage
codegen, zero Python: at 100 TB the extraction pass costs what the
regex scan costs, exactly like the PII scrub (`operators/textstats`).

Order matters and is pinned by tests:

1. drop ``<script>``/``<style>``/``<noscript>``/``<template>`` WITH
   their contents ((?is) — script bodies are not text);
2. drop HTML comments ``<!-- ... -->`` (incl. conditional comments);
3. block-level closing tags → newline (so ``</p></div>`` preserves
   paragraph structure for the line-level C4 cleaner downstream);
4. strip every remaining tag;
5. decode the common entities (named set + numeric ``&#NNN;`` /
   ``&#xHH;`` for the ASCII range — the long tail of named entities
   is left intact rather than half-decoded);
6. collapse horizontal whitespace, trim per line, squeeze blank runs.
"""

from __future__ import annotations

# module-level so pandas_udf type-hint inference (which resolves the
# stringified hints against module globals under
# `from __future__ import annotations`) can see it
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "html_to_text",
    "html_title",
    "html_links",
    "resolve_link",
    "link_host",
    "extract_text_udf_hook",
    "regex_text_extractor",
]


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# Containers whose CONTENT is dropped (scripts are not prose).
_DROP_CONTENT = ("script", "style", "noscript", "template", "svg", "head")

# Block-level elements whose boundaries become newlines.
_BLOCK = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|blockquote|"
    "section|article|header|footer|pre|figure|figcaption|form"
)

# Named entities worth decoding inline (the high-frequency set; the
# rest stay literal — visible, greppable, never mis-decoded).
_ENTITIES = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&hellip;", "…"),
    ("&copy;", "©"),
    # &amp; LAST: decoding it earlier would turn &amp;lt; into <
    ("&amp;", "&"),
]


# The extraction chain as DATA, shared by the Catalyst form
# (html_to_text) and the Python-re Arrow fast path
# (regex_text_extractor) so the two can never drift. Each step is one
# (pattern, replacement) regexp substitution, applied in order; every
# pattern stays inside the Java∩Python-ASCII regex dialect (no \s/\b
# semantics divergence: Python compiles these with re.ASCII, matching
# Java's default ASCII character classes).
#
# Step rationale (order is pinned by tests):
# - ONE leftmost-first pass over all content-dropping tags (r11: a
#   measured 1.4× vs one pass per tag). The \1 backreference pairs
#   each open tag with ITS OWN close tag; leftmost-first also matches
#   browser CDATA semantics on cross-nested unclosed soup. `head`
#   keeps its own pass for the <body>-lookahead stop (closing tags
#   are optional in crawl soup — unclosed heads must not leak their
#   <title>/<meta> text).
# - block boundaries -> newline BEFORE the generic tag strip; inline
#   tags strip to NOTHING ('</b>.' has no space before the period).
# - numeric character references before named entities (so
#   '&amp;#32;' decodes to the literal '&#32;' the author wrote);
#   decimal 32 / hex 20 are the space — '&#x32;' is the digit '2'.
# - whitespace: collapse horizontal runs, trim line edges, squeeze
#   blank-line runs, then edge-trim (F.trim strips spaces only).
_NONHEAD_TAGS = "|".join(tg for tg in _DROP_CONTENT if tg != "head")
EXTRACT_STEPS = (
    (f"(?is)<({_NONHEAD_TAGS})\\b[^>]*>.*?(?:</\\1\\s*>|$)", " "),
    (r"(?is)<head\b[^>]*>.*?(?:</head\s*>|(?=<body\b)|$)", " "),
    (r"(?s)<!--.*?-->", " "),
    (f"(?i)</?({_BLOCK})\\b[^>]*/?>", "\n"),
    (r"(?s)<[^>]+>", ""),
    (r"&#0*32;|&#[xX]0*20;", " "),
    *_ENTITIES,  # literal-safe patterns (no regex metacharacters)
    (r"[ \t\r\f]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n\n"),
    (r"^\s+|\s+$", ""),
)


def html_to_text(col) -> Column:
    """Visible text of an HTML document as one column expression.

    Paragraph structure survives as newlines (block boundaries), so
    the result drops straight into ``c4_clean_lines`` /
    ``line_dedup`` / the Gopher rules. NULL-safe; non-HTML input
    passes through mostly unchanged (no tags to strip). The chain is
    :data:`EXTRACT_STEPS` applied in order — see its comment for the
    step-by-step rationale."""
    t = _c(col)
    for pat, rep in EXTRACT_STEPS:
        t = F.regexp_replace(t, pat, rep)
    return t


def regex_text_extractor(fused: bool = True):
    """The Arrow FAST PATH for the extraction tier: a
    ``Callable[[pd.Series], pd.Series]`` for
    :func:`extract_text_udf_hook` replaying :data:`EXTRACT_STEPS`
    with Python ``re``. On the regex work alone CPython's sre runs
    the chain ~3×/core vs java.util.regex (micro-measured on the
    bench corpus shape); END-TO-END through the WARC ingest harness
    the gain is ~1.25× (12.7 → 15.8 MB/s at sf0.1 — parse + envelope
    + Arrow transfer dilute it; both numbers in BENCH_FULL as
    ``warc_ingest_mb_per_s`` / ``warc_ingest_fast_mb_per_s``).
    Byte-identical output is pinned by a corpus-equality test; the
    Catalyst form stays the default (zero Python workers, one fewer
    moving part).

    ``re.ASCII`` pins Python's ``\\s``/``\\b``/``\\w`` to the ASCII
    semantics Java uses by default — without it, ``\\s`` would also
    eat U+00A0 and the two chains would diverge on real crawl text.

    ``fused=True`` (r13, review r12 stretch item 8) collapses the
    TAIL of the chain — 12 sequential entity passes + the numeric-32
    pass + 3 whitespace passes, each a full scan of the post-strip
    text — into guarded single passes, BYTE-IDENTICAL by construction
    and by test:

    - entities: one combined alternation with a dict-lookup
      replacement. Equivalent to the sequential passes because (a)
      the literals are mutually exclusive at any position (all
      ``&name;``, names distinct), (b) replacement characters never
      create a new entity match — the only inserted ``&`` comes from
      ``&amp;``, which is deliberately LAST in the sequential order
      precisely so nothing ever rescans it (the ``&amp;lt;`` → ``&lt;``
      contract, pinned in tests). Skipped outright when the text has
      no ``&`` (most documents — a C-speed substring check).
    - whitespace (REWORKED r14 — the honest profile): the r13 shape
      mapped each whitespace run through a Python callback, which on
      newline-dense extracted text (one ``\\n`` per block tag) fired
      per PARAGRAPH BOUNDARY and measured ~neutral vs the sequential
      passes it replaced; profiling showed whitespace + trim were 93%
      of the kernel, not the tag strips the r13 SCALE note blamed.
      The r14 shape stays in C end to end: ``str.translate`` folds
      ``\\t\\r\\f`` into spaces (20 ms where the old combined pass
      was 633), ``" {2,}"`` collapses only MULTI-space runs (single
      spaces — every word boundary — are already canonical and never
      fire the engine), and newline canonicalization is a
      ``split("\\n")`` / per-line ``strip(" ")`` / skip-repeated-empty
      / ``join`` — C string ops, no regex. Byte-identical to the
      sequential fixed point: after the collapse each newline has at
      most one adjacent space (exactly what ``" ?\\n ?"`` removes),
      empty-line runs collapse to one (exactly ``\\n{2,}`` → two
      newlines), string edges fall to the final trim either way, and
      ``\\v`` — which ``[ \\t\\r\\f]+`` deliberately does NOT touch —
      passes through untouched here too.
    - trim: ``str.strip(" \\t\\n\\r\\f\\v")`` — the exact ASCII ``\\s``
      set — instead of ``^\\s+|\\s+$``, whose unanchored ``\\s+$``
      alternative makes sre attempt a match at every position (a
      measured 379 ms full scan for a boundary-only edit).

    Measured on the bench corpus shape: whitespace+trim 1001 → 149 ms
    (6.7×), whole kernel ~1089 → ~227 ms (~4.8×) single-core.
    tests/test_html.py pins fused == sequential == Catalyst on the
    corpus and on an adversarial entity/whitespace zoo; structural
    asserts below fail loudly if EXTRACT_STEPS is ever reordered."""
    import re as _re

    compiled = [
        (_re.compile(pat, _re.ASCII), rep) for pat, rep in EXTRACT_STEPS
    ]
    if not fused:

        def _extract_seq(s: pd.Series) -> pd.Series:
            def one(h):
                if h is None:
                    return None
                t = h
                for rx, rep in compiled:
                    t = rx.sub(rep, t)
                return t

            return s.map(one)

        return _extract_seq

    # Structural contract with EXTRACT_STEPS: 5 tag passes, the
    # numeric-32 pass, len(_ENTITIES) literal passes, 3 whitespace
    # passes, the trim. A reorder breaks these asserts, not the output.
    n_ent = len(_ENTITIES)
    assert EXTRACT_STEPS[5][0].startswith("&#0*32"), EXTRACT_STEPS[5]
    assert list(EXTRACT_STEPS[6 : 6 + n_ent]) == list(_ENTITIES)
    assert EXTRACT_STEPS[6 + n_ent][0] == r"[ \t\r\f]+"
    assert EXTRACT_STEPS[-1][0] == r"^\s+|\s+$"
    head = compiled[:5]
    numeric_rx = compiled[5][0]
    ent_map = dict(_ENTITIES)
    ent_rx = _re.compile(
        "&(?:" + "|".join(_re.escape(e[1:]) for e, _ in _ENTITIES) + ")"
    )
    # r14 whitespace machinery (see docstring): C-level fold of
    # \t\r\f into spaces, multi-space-only collapse, line-based
    # newline canonicalization, exact-\s-set strip
    _fold = {9: 32, 13: 32, 12: 32}  # \t \r \f -> ' '
    multi_sp_rx = _re.compile(" {2,}")
    _strip_set = " \t\n\r\f\x0b"

    def _ent_repl(m):
        return ent_map[m.group(0)]

    def _canon_ws(t: str) -> str:
        t = t.translate(_fold)
        t = multi_sp_rx.sub(" ", t)
        out = []
        prev_empty = False
        for ln in t.split("\n"):
            ln = ln.strip(" ")
            if ln:
                out.append(ln)
                prev_empty = False
            elif not prev_empty:
                out.append("")
                prev_empty = True
        return "\n".join(out).strip(_strip_set)

    def _extract(s: pd.Series) -> pd.Series:
        def one(h):
            if h is None:
                return None
            t = h
            for rx, rep in head:
                t = rx.sub(rep, t)
            if "&#" in t:
                t = numeric_rx.sub(" ", t)
            if "&" in t:
                t = ent_rx.sub(_ent_repl, t)
            return _canon_ws(t)

        return s.map(one)

    return _extract


def html_title(col) -> Column:
    """``<title>`` content (entity-decoded, whitespace-collapsed);
    empty string when absent."""
    t = F.regexp_extract(_c(col), r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1)
    for ent, rep in _ENTITIES:
        t = F.regexp_replace(t, ent, rep)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


# <a href> extractor pattern — in the Java∩RE2 dialect so the oracle
# replay (DuckDB regexp_extract_all) runs the IDENTICAL regex: shared
# as a constant so the two sides can't drift.
LINK_HREF_RX = r"(?i)<a\b[^>]*?\bhref\s*=\s*[\"']([^\"'>]+)[\"']"

# the pseudo-scheme exclusion html_links applies post-extraction —
# exported for the same single-source-of-truth reason
LINK_PSEUDO_SCHEME_RX = r"^(javascript|mailto|tel|data):"


def html_links(col) -> Column:
    """``array<string>`` of ``<a href>`` targets — the crawl-graph
    edge extractor (link structure feeds URL frontiers and
    centrality-style quality priors, e.g. Common Crawl's harmonic
    -centrality ranking). Pure expressions: one ``regexp_extract_all``
    + per-element entity decode of ``&amp;`` (the one entity that
    legally appears inside URLs in HTML source).

    Fragments-only links (``#section``), ``javascript:``/``mailto:``
    /``tel:`` pseudo-schemes, and empty hrefs are excluded — none is
    a crawlable edge. Targets come back AS WRITTEN (possibly
    relative); compose with :func:`resolve_link` +
    ``lantern_spark.operators.weburl.normalize_url`` for graph keys.
    NULL-safe (NULL html → empty array)."""
    c = F.coalesce(_c(col), F.lit(""))
    raw = F.regexp_extract_all(c, F.lit(LINK_HREF_RX), 1)
    decoded = F.transform(
        raw, lambda u: F.regexp_replace(F.trim(u), "&amp;", "&")
    )
    return F.filter(
        decoded,
        lambda u: (u != "")
        & ~u.startswith("#")
        & ~F.lower(u).rlike(LINK_PSEUDO_SCHEME_RX),
    )


def resolve_link(base, link) -> Column:
    """Resolve one (possibly relative) ``link`` against the page's
    ``base`` URL — the RFC 3986 §5 cases a crawl graph needs, as pure
    expressions:

    - absolute (``scheme://…``) → unchanged;
    - protocol-relative ``//host/p`` → base's scheme;
    - root-relative ``/p`` → base's scheme://host;
    - relative ``p`` / ``../p`` → merged with the base path's
      directory, then ``./`` and up to 8 levels of ``../``
      dot-segments squashed (HTML in the wild nests shallowly; deeper
      chains keep their residue rather than resolving wrongly).

    Query/fragment handling follows the graph-edge use: fragments are
    dropped (never sent to the server), queries kept. Non-URL bases
    return the link unchanged (no base to resolve against)."""
    b = _c(base)
    l = F.regexp_replace(_c(link), r"#.*$", "")  # fragment: client-only
    scheme = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    origin = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    # base path's directory (strip query, then the last path segment)
    bpath = F.regexp_replace(b, r"[?#].*$", "")
    # dot-segment squashing operates on the PATH ONLY — running it on
    # the full URL let an over-ascending ../../ chain consume the
    # host ('https://h/a/../../x' → 'https:/x'; caught by the urljoin
    # property test)
    bdir_path = F.regexp_replace(
        F.regexp_replace(
            bpath, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", ""
        ),
        r"[^/]*$",
        "",
    )
    # a pathless base ('https://h') has the root as its directory
    bdir_path = F.when(bdir_path == "", F.lit("/")).otherwise(bdir_path)
    merged = F.concat(bdir_path, l)
    # squash /./ then bounded ../ levels (innermost-out), then clamp
    # over-ascent at the root (RFC 3986 remove_dot_segments)
    merged = F.regexp_replace(merged, r"/\.(?=/)", "")
    for _ in range(8):
        merged = F.regexp_replace(merged, r"/[^/.][^/]*/\.\.(?=/|$)", "")
    merged = F.regexp_replace(merged, r"^(/\.\.)+(?=/|$)", "")
    merged = F.when(merged.startswith("/"), merged).otherwise(
        F.concat(F.lit("/"), merged)
    )
    merged = F.concat(origin, merged)
    out = (
        F.when(l == "", F.regexp_replace(b, r"#.*$", ""))
        .when(l.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), l)
        .when(l.startswith("//"), F.concat(scheme, F.lit(":"), l))
        .when(l.startswith("/"), F.concat(origin, l))
        # query-only: replaces the base's query, keeps its full path
        .when(l.startswith("?"), F.concat(bpath, l))
        .otherwise(merged)
    )
    return F.when(origin == "", l).otherwise(out)


def link_host(base, link, base_host=None) -> Column:
    """The HOST of ``resolve_link(base, link)`` without building the
    resolved URL — branch-for-branch host projection of
    :func:`resolve_link` (equality pinned by a hypothesis property
    against ``url_host(resolve_link(…))``):

    - absolute link → the link's own host;
    - protocol-relative ``//host/p`` → the link's host;
    - everything else (root-relative, relative, query-only, empty)
      → the BASE's host — path merging and dot-segment squashing
      can never change the authority;
    - non-URL base → the link's host ('' unless the link is
      absolute), mirroring resolve_link's pass-through.

    Exists for the crawl-graph hot path: ``domain_link_graph`` keys
    edges by host, and inlining the full resolve chain (path merge +
    8-level ``../`` squash, ~25 regex ops) into the fused
    explode+aggregate stage pushed the generated method past janino's
    64 KB limit — every run then paid ~13 s of doomed compilation
    (r12 finding). This projection is ~⅓ the regex work.

    ``base_host`` optionally supplies an already-computed
    ``url_host(base)`` column (callers that key the source end
    anyway), shaving three more regex ops out of the fused stage."""
    from lantern_spark.operators.weburl import url_host

    b = _c(base)
    l = F.regexp_replace(_c(link), r"#.*$", "")
    borigin = F.regexp_extract(
        b, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1
    )
    lhost = url_host(l)  # '' unless the link itself is scheme://
    # '//host/p' → host via a synthetic scheme (url_host semantics:
    # lowercase, strip port/userinfo/trailing dot)
    pl_host = url_host(F.concat(F.lit("x:"), l))
    bh = url_host(b) if base_host is None else _c(base_host)
    out = (
        F.when(l.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), lhost)
        .when(l.startswith("//"), pl_host)
        .otherwise(bh)
    )
    return F.when(borigin == "", lhost).otherwise(out)


def extract_text_udf_hook(df, html_col: str, out_col: str = "text",
                          extractor=None):
    """The seam for a real DOM extractor: ``extractor`` is a
    ``Callable[[pd.Series], pd.Series]`` (e.g. wrapping trafilatura)
    applied as an Arrow-batched pandas UDF; with ``extractor=None``
    the expression tier (:func:`html_to_text`) is used — identical
    output column either way, so swapping extractors never changes
    the pipeline shape. The libraries themselves are not shipped in
    this environment; the hook is the documented integration point,
    tested with a stand-in callable."""
    if extractor is None:
        return df.withColumn(out_col, html_to_text(html_col))
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _extract(s: pd.Series) -> pd.Series:
        return extractor(s)

    return df.withColumn(out_col, _extract(F.col(html_col)))
