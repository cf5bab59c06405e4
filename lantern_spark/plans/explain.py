"""Plan inspection helpers.

``masked_explain`` is the analog of ``lantern.masked_explain`` /
``mask_arrays`` (lantern.sql:599-654,888-915): EXPLAIN output with long
vector literals collapsed so plan diffs/goldens stay readable — the
reference built it because EXPLAIN of a 1000-dim ORDER BY is unreadable;
ours additionally powers the plan-contract tests.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# 8+ comma-separated numbers inside brackets = a vector literal
_ARRAY_RE = re.compile(r"\[(?:\s*-?\d+(?:\.\d+(?:E-?\d+)?)?\s*,){7,}[^\]]*\]")


def mask_arrays(text: str, placeholder: str = "[…vector…]") -> str:
    return _ARRAY_RE.sub(placeholder, text)


def masked_explain(df: DataFrame, mode: str = "formatted") -> str:
    """df.explain(mode) as a string with vector literals masked."""
    qe = df._jdf.queryExecution()
    if mode == "formatted":
        text = qe.explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    else:
        text = qe.toString()
    return mask_arrays(text)


def physical_summary(df: DataFrame) -> dict:
    """Counts of the plan features the scale contracts care about."""
    p = df._jdf.queryExecution().executedPlan().toString()
    full = df._jdf.queryExecution().toString()
    return {
        "exchanges": p.count("Exchange "),
        "broadcast_joins": p.count("BroadcastHashJoin"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "python_evals": p.count("EvalPython"),
        "take_ordered": "TakeOrderedAndProject" in p,
        "pushed_filters": "PushedFilters: [" in full
        and "PushedFilters: []" not in full,
        "partition_filters": "PartitionFilters" in full,
    }
