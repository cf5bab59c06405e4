"""SQL surface: the reference's SQL-first API as Spark SQL functions.

Lantern's user-facing API is SQL — ``lantern.sql:12-45`` declares
``l2sq_dist``/``cos_dist``/``hamming_dist`` as SQL functions and the
``<->``/``<=>``/``<+>`` operators resolve to them; users write
``SELECT … ORDER BY v <-> '{…}' LIMIT k``. This module re-creates that
surface on Spark so a reference user can keep writing SQL:

- :func:`install_sql_functions` registers the same function names as
  **SQL-defined functions** (``CREATE OR REPLACE TEMPORARY FUNCTION …
  RETURNS … RETURN <expr>``, Spark 4 SQL UDFs). The bodies are pure SQL
  expressions that Catalyst **inlines into the calling plan** — verified
  by the plan tests: no UDF call boundary, whole-stage codegen, and
  pushdown/pruning apply exactly as with the Python Column builders.
  Only the Porter stemmer goes through a (vectorized, Arrow-batched)
  pandas UDF, mirroring the Python API where the stemmer is the one
  non-expression kernel.
- :func:`register_tables` exposes a data directory's parquet tables as
  temp views, so ``spark.sql("SELECT … FROM embeddings ORDER BY
  l2sq_dist(embedding, …) LIMIT 10")`` runs end-to-end — the Spark
  rendition of the reference's ``ORDER BY <-> LIMIT`` entry point
  (Catalyst turns it into the same TakeOrderedAndProject physical plan
  the Python ``knn_search`` produces).

Parity contract: each SQL body is the *same expression* the Python
builders in ``functions/distances.py`` / ``functions/vectors.py`` /
``operators/pq.py`` construct (dim guard, NULL handling, try_divide
zero-norm behavior, 32-bit-masked popcount). Drift is pinned by
``tests/test_sqlapi.py``, which evaluates both surfaces on the same
inputs and requires identical results.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import SparkSession

# Every table the driver testdata ships; register_tables skips missing
# files so the helper works on any subset directory.
DEFAULT_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_DIM_GUARD = (
    "CASE WHEN a IS NULL OR b IS NULL THEN CAST(NULL AS {typ}) "
    "WHEN size(a) != size(b) THEN CAST(raise_error(concat("
    "'{name}: dimension mismatch (', CAST(size(a) AS STRING), "
    "' vs ', CAST(size(b) AS STRING), ')')) AS {typ}) "
    "ELSE {body} END"
)

_DSUM = "aggregate({arr}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"


def _guarded(name: str, body: str, typ: str = "DOUBLE") -> str:
    return _DIM_GUARD.format(name=name, body=body, typ=typ)


def _ddl(name: str, args: str, ret: str, body: str) -> str:
    return (
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
        f"RETURNS {ret} RETURN {body}"
    )


_AB = "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"

# Pure-expression SQL bodies. Kept textually close to the Column
# builders they mirror (functions/distances.py, functions/vectors.py,
# operators/pq.py) — the equivalence tests are the drift gate.
_SQL_FUNCTIONS: List[str] = [
    # -- distances (lantern.sql:12-45 names + extras) -------------------
    _ddl(
        "l2sq_dist", _AB, "DOUBLE",
        _guarded(
            "l2sq_dist",
            _DSUM.format(arr="zip_with(a, b, (x, y) -> (x - y) * (x - y))"),
        ),
    ),
    _ddl(
        "l2_dist", _AB, "DOUBLE",
        "sqrt(l2sq_dist(a, b))",
    ),
    _ddl(
        "l1_dist", _AB, "DOUBLE",
        _guarded(
            "l1_dist",
            _DSUM.format(arr="zip_with(a, b, (x, y) -> abs(x - y))"),
        ),
    ),
    _ddl(
        "inner_dist", _AB, "DOUBLE",
        _guarded(
            "inner_dist",
            "-" + _DSUM.format(arr="zip_with(a, b, (x, y) -> x * y)"),
        ),
    ),
    _ddl(
        "cos_dist", _AB, "DOUBLE",
        _guarded(
            "cos_dist",
            "1.0 - try_divide("
            + _DSUM.format(arr="zip_with(a, b, (x, y) -> x * y)")
            + ", sqrt("
            + _DSUM.format(arr="transform(a, x -> x * x)")
            + " * "
            + _DSUM.format(arr="transform(b, x -> x * x)")
            + "))",
        ),
    ),
    _ddl(
        "hamming_dist", "a ARRAY<INT>, b ARRAY<INT>", "BIGINT",
        _guarded(
            "hamming_dist",
            "aggregate(zip_with(a, b, (x, y) -> "
            "bit_count((CAST(x AS BIGINT) ^ CAST(y AS BIGINT)) "
            "& 4294967295)), CAST(0 AS BIGINT), (acc, x) -> acc + x)",
            typ="BIGINT",
        ),
    ),
    # -- vector algebra (functions/vectors.py) --------------------------
    _ddl(
        "vec_dot", _AB, "DOUBLE",
        _DSUM.format(arr="zip_with(a, b, (x, y) -> x * y)"),
    ),
    _ddl(
        "vec_norm", "a ARRAY<DOUBLE>", "DOUBLE",
        "sqrt(" + _DSUM.format(arr="transform(a, x -> x * x)") + ")",
    ),
    _ddl(
        "vec_normalize", "a ARRAY<DOUBLE>", "ARRAY<DOUBLE>",
        "CASE WHEN vec_norm(a) = 0.0 THEN a "
        "ELSE transform(a, x -> x / vec_norm(a)) END",
    ),
    _ddl(
        "vec_add", _AB, "ARRAY<DOUBLE>",
        "zip_with(a, b, (x, y) -> x + y)",
    ),
    _ddl(
        "vec_sub", _AB, "ARRAY<DOUBLE>",
        "zip_with(a, b, (x, y) -> x - y)",
    ),
    _ddl(
        "vec_scale", "a ARRAY<DOUBLE>, s DOUBLE", "ARRAY<DOUBLE>",
        "transform(a, x -> x * s)",
    ),
    # -- scalar quantization (operators/pq.py i8 family) ----------------
    _ddl(
        "sq_encode_i8", "a ARRAY<DOUBLE>, mn DOUBLE, mx DOUBLE", "ARRAY<INT>",
        "transform(a, x -> CAST(round((x - mn) / "
        "(CASE WHEN mx - mn = 0.0 THEN 1.0 ELSE mx - mn END) "
        "* 254.0 - 127.0, 0) AS INT))",
    ),
    _ddl(
        "sq_decode_i8", "a ARRAY<INT>, mn DOUBLE, mx DOUBLE", "ARRAY<DOUBLE>",
        "transform(a, x -> (CAST(x AS DOUBLE) + 127.0) / 254.0 * "
        "(CASE WHEN mx - mn = 0.0 THEN 1.0 ELSE mx - mn END) + mn)",
    ),
    # -- tokenizer (pre-stem stage of text_to_stem_array) ---------------
    _ddl(
        "tokenize_text", "s STRING", "ARRAY<STRING>",
        r"filter(split(lower(s), '[^a-z0-9]+'), x -> x != '')",
    ),
    _ddl(
        "tokenize_text_unicode", "s STRING", "ARRAY<STRING>",
        r"filter(split(lower(s), '[^\\p{L}\\p{N}]+'), x -> x != '')",
    ),
    # -- BM25 per-(term, doc) score (bm25_agg.rs:139-151 exact math) ----
    _ddl(
        "bm25_term_score",
        "fq DOUBLE, doc_len DOUBLE, df DOUBLE, num_docs DOUBLE, "
        "avg_doc_len DOUBLE, k1 DOUBLE, b DOUBLE",
        "DOUBLE",
        "ln((num_docs - df + 0.5) / (df + 0.5) + 1.0) * "
        "(fq * (k1 + 1.0)) / "
        "(fq + k1 * (1.0 - b + b * (doc_len / avg_doc_len)))",
    ),
]

# Functions whose body references another registered function — created
# after their dependencies (the list above is already ordered; this is
# the stemmer, which additionally needs the pandas UDF registered).
_STEM_SQL = _ddl(
    "text_to_stem_array", "s STRING", "ARRAY<STRING>",
    "lantern_stem_tokens(tokenize_text_unicode(s))",
)


def install_sql_functions(spark: SparkSession) -> List[str]:
    """Register the Lantern SQL function surface on ``spark``.

    Returns the list of registered function names. Idempotent
    (``CREATE OR REPLACE``); temporary functions are session-scoped,
    matching the reference's per-database ``CREATE EXTENSION`` scope.
    """
    names = []
    for ddl in _SQL_FUNCTIONS:
        spark.sql(ddl)
        names.append(ddl.split("FUNCTION ", 1)[1].split("(", 1)[0])
    # Porter stemmer: the one non-expression kernel (same split as the
    # Python surface, functions/text.py). Registered as a vectorized
    # pandas UDF under an internal name, then wrapped by the public
    # text_to_stem_array SQL function (rust-engine semantics: unicode
    # tokenize -> stem -> stopword filter on the stemmed form,
    # stemmers.rs:96-117).
    from lantern_spark.functions.text import _stem_tokens_udf

    spark.udf.register("lantern_stem_tokens", _stem_tokens_udf)
    spark.sql(_STEM_SQL)
    names += ["lantern_stem_tokens", "text_to_stem_array"]
    return names


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: Optional[Sequence[str]] = None,
) -> List[str]:
    """Create a temp view per parquet table under ``sf_dir``.

    Uses the same loaders as the Python query surface (``load_table``
    handles the events NTZ timestamp normalization), so SQL and
    DataFrame queries see identical data. Missing tables are skipped.
    Returns the list of registered view names.
    """
    import os

    from lantern_spark.types import load_table, table_path

    out = []
    for t in tables or DEFAULT_TABLES:
        # skip ONLY genuinely absent tables — a corrupt/unreadable
        # parquet must raise, not masquerade as "missing" and surface
        # later as a confusing TABLE_OR_VIEW_NOT_FOUND
        if not os.path.exists(table_path(sf_dir, t)):
            continue
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        out.append(t)
    return out
