"""As-of join: for each left row, the latest right row at-or-before it.

North-star extension: the reference has no time-series operators
(PostgreSQL substrate), but large-scale event/feature pipelines need
point-in-time joins (feature lookup, slowly-changing dims). Spark has
no native ASOF JOIN; the idiomatic composition is the union-tag +
window trick:

  1. tag left (probe) and right (reference) rows, union by key/time
  2. one window per key ordered by (time, tag): last_value of the
     right-side payload *ignoring nulls* gives every probe row the most
     recent reference row at or before its timestamp
  3. filter back to probe rows

ONE shuffle (the window partitionBy), no range explosion — vs the
naive `left.time >= right.time` range join which is quadratic per key.
Ties (equal timestamps) resolve to the right row sorting BEFORE the
probe row (tag order), i.e. at-or-before semantics, matching DuckDB's
`ASOF JOIN ... ON l.t >= r.t` contract used as the oracle.

Scale notes: cost = one shuffle of |L|+|R| rows keyed by the join key;
skewed keys behave like any window (AQE-managed). State per key inside
the window is O(1) (running last_value).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_r",
    tolerance_seconds: Optional[float] = None,
) -> DataFrame:
    """Left as-of join: every left row + the most recent right row with
    ``right_time <= left_time`` sharing key ``on`` (null-extended when
    no such row exists).

    ``right_cols``: right payload columns to carry (default: all except
    the key and time). The right time is carried as ``{right_time}{suffix}``.

    ``tolerance_seconds``: maximum lookback — matches older than
    ``left_time − tolerance`` null out (pandas ``merge_asof(tolerance=…)``
    semantics; applied as a post-window predicate, so the plan shape is
    unchanged — still one shuffle)."""
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (on, right_time)
        ]
    payload = list(right_cols) + [right_time]

    l_tag = left.select(
        F.col(on),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_probe"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(
                F.struct(*[F.col(c) for c in payload]).alias("s")
            ).schema["s"].dataType
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_probe"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("s")
            ).schema["s"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in payload]).alias("__r"),
    )
    # right rows sort before probe rows at equal (key, time): tag asc
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tag.unionByName(r_tag).withColumn(
        "__last_r", F.last("__r", ignorenulls=True).over(w)
    )
    probes = unioned.filter(F.col("__is_probe") == 1)
    if tolerance_seconds is not None:
        in_window = (
            F.unix_micros(F.col("__t"))
            - F.unix_micros(F.col(f"__last_r.{right_time}"))
        ) <= F.lit(int(tolerance_seconds * 1_000_000))
        probes = probes.withColumn(
            "__last_r", F.when(in_window, F.col("__last_r"))
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__last_r.{c}").alias(c) for c in right_cols]
    out_cols.append(
        F.col(f"__last_r.{right_time}").alias(f"{right_time}{suffix}")
    )
    return probes.select(*out_cols)
