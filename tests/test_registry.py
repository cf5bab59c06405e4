"""Driver-style verification of EVERY registered query/oracle pair.

This mirrors what the driver does at sf0.01: run the Spark query and the
DuckDB oracle side-by-side, compare row count + schema + order-insensitive
values. Queries without an oracle get a rows-only smoke check.
"""

import pytest

from lantern_spark import registry
from tests.conftest import assert_matches_oracle

ALL = sorted(registry.queries().keys())

# md5-embedding both engines' full corpus makes this one oracle row
# ~55 s of DuckDB time — the driver hash-checks every declared query
# against the oracle itself each round, so the default pytest run
# skips just this row (run with --runslow)
_SLOW_ORACLE_ROWS = {"text_query_vector_search"}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow)
        if n in _SLOW_ORACLE_ROWS
        else n
        for n in ALL
    ],
)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = registry.queries()[name]
    sdf = q(spark, sf_dir)
    # Scalar output columns ONLY: the driver canonicalizes results with
    # a pandas sort over all columns, which cannot factorize list/dict
    # cells (r11: packed_ids_export red with "unhashable type: 'list'").
    # Array-valued contracts belong in operator tests, projected to
    # md5/concat_ws scalars in the roster.
    from pyspark.sql import types as T

    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name}: non-scalar output columns {complex_cols} — the driver "
        "canonicalizer rejects array/map/struct; project to scalars"
    )
    sql = registry.oracle_sql().get(name)
    if sql is None:
        # rows-only: must run and return a stable schema
        rows = sdf.collect()
        assert sdf.columns, f"{name}: no columns"
        assert rows is not None
    else:
        assert_matches_oracle(sdf, duck, sql)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
    assert set(e.oracle_sql().keys()) <= set(e.queries().keys())


def test_roster_within_driver_cap():
    """The driver records CORRECTNESS rows for only the FIRST 50
    registered queries (round-1: 53 registered, exactly the last 3
    had no entry). Every registered query must be checkable — keep
    the roster at ≤50 and swap, don't append, when adding queries."""
    assert len(registry.queries()) <= 50
