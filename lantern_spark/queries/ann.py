"""Registered ANN-index queries (SURVEY §2.B/§2.C/§2.H parity).

The IVF index is built once per (sf_dir) into a temp dir and cached for
the process lifetime — the driver calls each query in the same process.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from lantern_spark.operators.autotune import autotune_index
from lantern_spark.operators.index import IVFIndex, recall_at_k
from lantern_spark.queries.common import Q64, duck_l2sq, duck_lit, load_table
from lantern_spark.registry import register

_CACHE: dict = {}


def _index_for(spark, sf_dir: str) -> IVFIndex:
    """One IVF index per sf_dir, built WITH PQ codes so the plain and
    the ADC query families share a single build."""
    if sf_dir not in _CACHE:
        from lantern_spark.types import PQSpec

        emb = load_table(spark, sf_dir, "embeddings")
        path = tempfile.mkdtemp(prefix="lantern_ivf_")
        _CACHE[sf_dir] = IVFIndex.build(
            emb, "embedding", "vec_id", path, metric="l2sq", nlist=8,
            seed=42, pq=PQSpec(dim=64, splits=8, clusters=16, seed=42),
            extra_columns=["label"],
        )
    return _CACHE[sf_dir]


_QL = duck_lit(Q64)


@register(
    "ivf_fullprobe_top10",
    f"""
    SELECT vec_id, round({duck_l2sq('embedding::DOUBLE[]', _QL)}, 6) AS dist
    FROM embeddings
    ORDER BY round({duck_l2sq('embedding::DOUBLE[]', _QL)}, 6), vec_id
    LIMIT 10
    """,
)
def ivf_fullprobe_top10(spark, sf_dir):
    """IVF search with nprobe = nlist scans every list exactly once —
    provably equal to the exact top-k, so it is hash-checkable. This
    verifies the index round-trip (build → partitioned write → pruned
    read → merge) end-to-end against the oracle."""
    idx = _index_for(spark, sf_dir)
    out = idx.search(spark, Q64, k=10, nprobe=idx.manifest.nlist)
    return (
        out.select("vec_id", F.round("dist", 6).alias("dist"))
        .orderBy("dist", "vec_id")
    )


@register("ivf_pruned_top10")  # rows-only: approximate by contract
def ivf_pruned_top10(spark, sf_dir):
    """nprobe=4 of 8 lists — the actual ANN fast path (partition-pruned
    scan; the reference's unrechecked-order contract, scan.c:332-333).
    Verified by recall in pytest, not by hash."""
    idx = _index_for(spark, sf_dir)
    out = idx.search(spark, Q64, k=10, nprobe=4)
    return out.select("vec_id", F.round("dist", 6).alias("dist"))


@register("ivf_recall_report")  # rows-only: derived measurement
def ivf_recall_report(spark, sf_dir):
    """Recall@10 at increasing nprobe (calculate_recall.sql analog)."""
    idx = _index_for(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qs = [r[0] for r in emb.select("embedding").limit(5).collect()]
    rows = [
        (p, float(recall_at_k(idx, spark, qs, k=10, nprobe=p)))
        for p in (2, 4, 8)
    ]
    return spark.createDataFrame(rows, "nprobe int, recall double")


@register("autotune_report")  # rows-only: timing-dependent measurement
def autotune_report(spark, sf_dir):
    """Autotune grid results (index_autotune/mod.rs): recall per
    variant; latency/build columns are env-dependent so only the
    params + recall are emitted."""
    emb = load_table(spark, sf_dir, "embeddings")
    best, results, _ = autotune_index(
        emb, "embedding", "vec_id",
        target_recall=0.95, num_queries=3, grid=[(8, 2), (8, 8)],
    )
    return spark.createDataFrame(
        [(r.nlist, r.nprobe, round(r.recall, 4)) for r in results],
        "nlist int, nprobe int, recall double",
    )


@register(
    "ivf_filtered_top5",
    f"""
    SELECT vec_id, label, round({duck_l2sq('embedding::DOUBLE[]', _QL)}, 6) AS dist
    FROM embeddings
    WHERE label = 3
    ORDER BY round({duck_l2sq('embedding::DOUBLE[]', _QL)}, 6), vec_id
    LIMIT 5
    """,
)
def ivf_filtered_top5(spark, sf_dir):
    """Filtered ANN (post-filter contract, hnsw_select.sql:51): filter
    applied to probed candidates before top-k; at full probe this
    equals exact filtered KNN — hash-checkable. The label column rides
    in the index via build-time extra_columns."""
    idx = _index_for(spark, sf_dir)
    out = idx.search(
        spark,
        Q64,
        k=5,
        nprobe=idx.manifest.nlist,
        where=F.col("label") == 3,
    )
    # search projects (id, vector, dist); re-join label for the output
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        out.join(F.broadcast(emb), "vec_id")
        .select("vec_id", "label", F.round("dist", 6).alias("dist"))
        .orderBy("dist", "vec_id")
    )
