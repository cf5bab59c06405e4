"""Shared fixtures for registered queries: deterministic query vectors."""

from __future__ import annotations

from lantern_spark.types import load_table  # noqa: F401

DIM = 64  # driver testdata embeddings dim

# Deterministic query vectors (seed-free closed form, identical across runs)
Q64 = [float((i * 37 % 97) / 97.0) for i in range(DIM)]
Q64_B = [float((i * 53 % 101) / 101.0) for i in range(DIM)]


def duck_lit(vals) -> str:
    """DuckDB DOUBLE[] literal for a python float list."""
    return "[" + ",".join(repr(float(v)) for v in vals) + "]::DOUBLE[]"


def duck_l2sq(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        " x -> (x[1]-x[2])*(x[1]-x[2])))"
    )


def duck_cos(a: str, b: str) -> str:
    return (
        f"(1.0 - list_sum(list_transform(list_zip({a}, {b}), x -> x[1]*x[2]))"
        f" / sqrt(list_sum(list_transform({a}, x -> x*x))"
        f"      * list_sum(list_transform({b}, x -> x*x))))"
    )


def duck_inner(a: str, b: str) -> str:
    return f"(- list_sum(list_transform(list_zip({a}, {b}), x -> x[1]*x[2])))"
