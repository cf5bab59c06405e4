"""Index autotune: grid-search ANN params against a recall target.

Reference: lantern_cli/src/index_autotune/mod.rs —
- sample test rows (mod.rs:38-67), exact ground truth for 10 random
  query rows (mod.rs:188-218),
- a fixed grid of variants (mod.rs:328-359),
- per variant: build, recall, latency (mod.rs:220-254), early exit at
  recall ≥ 99.9% (mod.rs:465-467),
- selection: among variants meeting target_recall, min(latency +
  build_time); else max recall (mod.rs:161-186),
- cached results reuse (mod.rs:111-159) → ``results`` list returned for
  the caller to persist.

Our params are IVF's (nlist, nprobe) — the grid mirrors the reference's
(m, ef_construction, ef) ladder shape: small/cheap → large/accurate.
"""

from __future__ import annotations

import shutil
import tempfile
import time
from dataclasses import asdict, dataclass
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from lantern_spark.operators.index import IVFIndex, recall_at_k


def _perturb_queries(rows, metric: str, seed: int) -> list:
    """Tuning probes = PERTURBED sample vectors, never verbatim index
    members (review r7 #5, the same de-leak as queries/ann.py and
    fixtures.py: a member probe's distance-0 self-hit sits in its own
    probed cell/shard, so measured recall per grid variant reads
    optimistic and the tuner under-provisions the search knobs).
    Float metrics get seeded uniform noise at ~1 per-element std of
    the testdata scale; hamming (int32 bit-packs) gets 4 seeded bit
    flips — float noise on packed words is meaningless."""
    import numpy as np

    rng = np.random.RandomState(seed)
    out = []
    for r in rows:
        v = list(r[0])
        if metric == "hamming":
            words = [int(x) & 0xFFFFFFFF for x in v]
            for _ in range(4):
                w = int(rng.randint(len(words)))
                words[w] ^= 1 << int(rng.randint(32))
            out.append(
                [int(x - 2**32) if x >= 2**31 else int(x) for x in words]
            )
        else:
            noise = rng.uniform(-0.15, 0.15, size=len(v))
            out.append([float(x) + float(e) for x, e in zip(v, noise)])
    return out

# (nlist, nprobe) ladder — analog of the reference's 6-variant grid
# (index_autotune/mod.rs:328-359)
DEFAULT_GRID = [
    (32, 2),
    (32, 6),
    (16, 4),
    (16, 8),
    (8, 4),
    (8, 8),
]

EARLY_EXIT_RECALL = 0.999  # mod.rs:465-467


@dataclass
class AutotuneResult:
    nlist: int
    nprobe: int
    recall: float
    latency_s: float
    build_s: float


def autotune_index(
    df: DataFrame,
    column: str,
    id_column: str,
    metric: str = "l2sq",
    k: int = 10,
    target_recall: float = 0.95,
    test_data_size: int = 10000,
    num_queries: int = 10,
    grid: Optional[Sequence[tuple]] = None,
    seed: int = 42,
    create_path: Optional[str] = None,
    queries: Optional[Sequence[Sequence[float]]] = None,
    ground_truth: Optional[Sequence[Sequence[int]]] = None,
) -> tuple:
    """Returns (best: AutotuneResult, results: list[AutotuneResult],
    index: IVFIndex | None).

    If ``create_path`` is given, the winning variant is rebuilt there
    (the reference's create_index=true mode).

    ``queries``/``ground_truth`` (r13): the reference CLI's file-based
    recall fixture — base/query ``.fvecs`` plus a true-neighbor
    ``.ivecs`` (index_autotune/mod.rs:188-218). When given, the tuner
    scores recall against YOUR ground truth instead of synthesizing
    perturbed probes (and skips the exact scan entirely when
    ``ground_truth`` is present); feed them from
    :func:`~lantern_spark.sources.vecfiles.read_vecs`. Pinned
    end-to-end (files → autotune → 0.999 early exit) in
    tests/test_autotune.py.

    When ``ground_truth`` is supplied the candidate indexes are built
    on the FULL ``df``, not the ``test_data_size`` sample (r14, review
    r13 advice): a file-based ``.ivecs`` truth refers to ids of the
    whole base, and an index built on a ``limit()`` sample can never
    return a truth id outside the sample — recall would be silently
    deflated for EVERY grid variant and the tuner would never
    early-exit. The reference avoids this only because it computes
    ground truth on the same sampled table (index_autotune/mod.rs
    calculate_ground_truth); a file fixture bypasses that coupling, so
    the ``.ivecs`` ids MUST correspond to the rows of ``df`` as
    passed — pre-sample yourself if the base is too large to tune on."""
    spark = df.sparkSession
    if ground_truth is not None:
        sample = df.cache()
    else:
        sample = df.limit(test_data_size).cache()
    sample.count()
    if queries is not None:
        qs = [list(q) for q in queries]
    else:
        qs = _perturb_queries(
            sample.select(column).limit(num_queries).collect(), metric, seed
        )

    results: List[AutotuneResult] = []
    for nlist, nprobe in grid or DEFAULT_GRID:
        path = tempfile.mkdtemp(prefix="autotune_ivf_")
        t0 = time.time()
        idx = IVFIndex.build(
            sample, column, id_column, path, metric=metric, nlist=nlist, seed=seed
        )
        build_s = time.time() - t0
        t0 = time.time()
        rec = recall_at_k(
            idx, spark, qs, k=k, nprobe=nprobe, ground_truth=ground_truth
        )
        latency_s = (time.time() - t0) / max(len(qs), 1)
        results.append(AutotuneResult(nlist, nprobe, rec, latency_s, build_s))
        shutil.rmtree(path, ignore_errors=True)
        if rec >= EARLY_EXIT_RECALL:
            break  # mod.rs:465-467

    meeting = [r for r in results if r.recall >= target_recall]
    if meeting:
        best = min(meeting, key=lambda r: r.latency_s + r.build_s)  # mod.rs:161-186
    else:
        best = max(results, key=lambda r: r.recall)

    index = None
    if create_path:
        index = IVFIndex.build(
            df, column, id_column, create_path,
            metric=metric, nlist=best.nlist, seed=seed,
        )
    sample.unpersist()
    return best, results, index


def tune_nprobe(
    index: IVFIndex,
    spark: SparkSession,
    queries: Sequence[Sequence[float]],
    k: int = 10,
    target_recall: float = 0.95,
) -> tuple:
    """Closed-form nprobe selection on an already-built index — the
    reference's search-knob (``ef``) selection (index_autotune/
    mod.rs:161-186) without any rebuild.

    ONE exact scan over the stored lists records which list every true
    neighbor lives in, for ALL queries at once: a ``mapInPandas`` kernel
    keeps each query's local top-k per Arrow batch (map-side combine —
    the only rows that leave an executor are ≤ batches·|Q|·k
    candidates), and the global per-query top-k is a driver-side numpy
    reduce over that small candidate set. Because IVF search is exact
    WITHIN the probed lists, recall(nprobe) for EVERY nprobe is then
    just the fraction of true neighbors whose list's probe rank (by
    centroid distance) is < nprobe — the full recall-vs-nprobe curve
    from one Spark job, no per-variant searches and no per-query scans.

    Returns (nprobe, recall) — the smallest nprobe meeting
    ``target_recall``, else (nlist, 1.0) (full probe is exact).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from lantern_spark.types import Metric

    mf = index.manifest
    lists = index.lists(spark)
    q_arr = np.asarray([list(q) for q in queries], dtype=np.float64)
    metric = Metric.resolve(mf.metric)
    n_q = q_arr.shape[0]
    kk = int(k)
    col, id_col = mf.column, mf.id_column
    if metric is Metric.COS:
        q_ready = q_arr / np.maximum(
            np.linalg.norm(q_arr, axis=1, keepdims=True), 1e-30
        )
    else:
        q_ready = q_arr

    out_schema = T.StructType(
        [
            T.StructField("qid", T.IntegerType()),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("__d", T.DoubleType()),
            T.StructField("__id", lists.schema[id_col].dataType),
        ]
    )

    def local_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if metric is Metric.HAMMING:
                # 32-bit-masked xor popcount, matching hamming_dist
                xi = np.ascontiguousarray(
                    np.asarray(pdf[col].tolist(), dtype=np.int64)
                    .astype(np.uint32)
                )
                qi = q_ready.astype(np.int64).astype(np.uint32)
                n_rows = xi.shape[0]
                d_all = np.empty((n_rows, n_q), dtype=np.float64)
                for j in range(n_q):
                    xor = np.ascontiguousarray(np.bitwise_xor(xi, qi[j]))
                    d_all[:, j] = (
                        np.unpackbits(xor.view(np.uint8))
                        .reshape(n_rows, -1)
                        .sum(axis=1)
                    )
            else:
                x = np.asarray(pdf[col].tolist(), dtype=np.float64)
                if metric is Metric.COS:
                    xn = x / np.maximum(
                        np.linalg.norm(x, axis=1, keepdims=True), 1e-30
                    )
                    d_all = 1.0 - xn @ q_ready.T  # (n, Q)
                elif metric is Metric.INNER:
                    d_all = -(x @ q_ready.T)
                else:  # l2sq
                    d_all = np.empty((x.shape[0], n_q), dtype=np.float64)
                    for j in range(n_q):
                        d_all[:, j] = ((x - q_ready[j]) ** 2).sum(axis=1)
            take = min(kk, len(pdf))
            frames = []
            batch_ids = pdf[id_col].to_numpy()
            for j in range(n_q):
                # (distance, id) lexsort keeps boundary ties
                # deterministic — same tie-break as the global merge
                loc = np.lexsort((batch_ids, d_all[:, j]))[:take]
                frames.append(
                    pd.DataFrame(
                        {
                            "qid": j,
                            "list_id": pdf["list_id"].to_numpy()[loc],
                            "__d": d_all[loc, j],
                            "__id": batch_ids[loc],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    src = lists.select(id_col, col, "list_id")
    # size the Python-kernel task count to the corpus (r15, guide §4):
    # the partitioned lists dir splits into ~one scan task per few
    # files, and each mapInPandas task pays a worker round trip — at
    # small n that fixed cost dominates (23 near-empty tasks for a
    # 2000-row index), while the numpy kernel itself is microseconds.
    # coalesce (no shuffle) to ~50k rows/task, floored at 1, capped at
    # the scan's own split count so large corpora keep full fan-out.
    n_vec = int(mf.num_vectors or 0)
    if n_vec:
        # coalesce never INCREASES a plan's partition count, so the
        # scan's own split count is an implicit cap — no need to pay
        # the DataFrame→RDD conversion (plan translation + a listing
        # pass) that getNumPartitions() costs just to compute min()
        src = src.coalesce(max(1, -(-n_vec // 50_000)))
    cand = (
        src.mapInPandas(local_topk, out_schema)
        .collect()
    )
    # one pass bucketing by qid — not a per-query scan of the full
    # candidate list, which would make the driver reduce O(Q·|cand|)
    by_qid: dict = {}
    for r in cand:
        by_qid.setdefault(r["qid"], []).append(r)
    ranks: List[np.ndarray] = []
    for j, q in enumerate(queries):
        mine = by_qid.get(j, [])
        # global top-k: (distance, id) tie-break, the repo convention
        mine.sort(key=lambda r: (r["__d"], r["__id"]))
        probe_order = index._probe_lists(spark, q, mf.nlist)
        rank = {lid: i for i, lid in enumerate(probe_order)}
        ranks.append(
            np.asarray(
                [rank[r["list_id"]] for r in mine[:kk]], dtype=np.int64
            )
        )
    # integer hits / total, the SAME arithmetic as recall_at_k — a
    # mean-of-means drifts a ulp below round targets (0.9 via
    # np.mean([1.0, .9, .8, .9]) < 0.9) and off-by-ones the knob
    total = sum(len(r) for r in ranks)
    for nprobe in range(1, mf.nlist + 1):
        rec = sum(int((r < nprobe).sum()) for r in ranks) / max(total, 1)
        if rec >= target_recall:
            return nprobe, rec
    return mf.nlist, 1.0


# (m, ef_construction, ef) ladder — the reference's exact 6-variant
# grid (index_autotune/mod.rs:328-359): small/cheap → large/accurate.
DEFAULT_HNSW_GRID = [
    (6, 32, 64),
    (8, 40, 64),
    (12, 48, 64),
    (16, 60, 76),
    (32, 96, 96),
    (48, 128, 128),
]


@dataclass
class HnswAutotuneResult:
    m: int
    ef_construction: int
    ef: int
    recall: float
    latency_s: float
    build_s: float


def autotune_hnsw_index(
    df: DataFrame,
    column: str,
    id_column: str,
    metric: str = "l2sq",
    k: int = 10,
    target_recall: float = 0.95,
    test_data_size: int = 10000,
    num_queries: int = 10,
    grid: Optional[Sequence[tuple]] = None,
    seed: int = 42,
    shards: int = 4,
    quant: str = "f32",
    create_path: Optional[str] = None,
) -> tuple:
    """Sweep the HNSW graph params (m, ef_construction, ef) — the
    reference's native autotune target (index_autotune/mod.rs:328-359
    sweeps exactly these three; selection mod.rs:161-186, early exit
    mod.rs:465-467).

    Returns (best: HnswAutotuneResult, results, index: HNSWIndex|None).
    If ``create_path`` is given, the winning (m, efc) is rebuilt there
    over the FULL ``df`` (the reference's create_index=true mode);
    the winning ``ef`` is a search-time knob the caller passes to
    ``search``.
    """
    from lantern_spark.operators.hnsw import (
        HNSWIndex,
        hnsw_recall_and_scan_fraction,
    )

    spark = df.sparkSession
    sample = df.select(id_column, column).limit(test_data_size).cache()
    sample.count()
    qs = _perturb_queries(
        sample.select(column).limit(num_queries).collect(), metric, seed
    )

    results: List[HnswAutotuneResult] = []
    for m, efc, ef in grid or DEFAULT_HNSW_GRID:
        path = tempfile.mkdtemp(prefix="autotune_hnsw_")
        t0 = time.time()
        idx = HNSWIndex.build(
            sample, column, id_column, path,
            m=m, ef_construction=efc, shards=shards,
            metric=metric, seed=seed, quant=quant,
        )
        build_s = time.time() - t0
        t0 = time.time()
        rec, _frac = hnsw_recall_and_scan_fraction(
            idx, spark, sample, column, id_column, qs, k=k, ef=ef
        )
        latency_s = (time.time() - t0) / max(len(qs), 1)
        results.append(
            HnswAutotuneResult(m, efc, ef, rec, latency_s, build_s)
        )
        shutil.rmtree(path, ignore_errors=True)
        if rec >= EARLY_EXIT_RECALL:
            break  # mod.rs:465-467

    meeting = [r for r in results if r.recall >= target_recall]
    if meeting:
        best = min(meeting, key=lambda r: r.latency_s + r.build_s)
    else:
        best = max(results, key=lambda r: r.recall)

    index = None
    if create_path:
        index = HNSWIndex.build(
            df, column, id_column, create_path,
            m=best.m, ef_construction=best.ef_construction,
            shards=shards, metric=metric, seed=seed, quant=quant,
        )
    sample.unpersist()
    return best, results, index


# (nlist, nprobe, ef) ladder for the composed IVF×graph structure —
# the reference's grid shape (small/cheap → large/accurate,
# index_autotune/mod.rs:328-359) over the hybrid's JOINT knobs: cell
# count, probed cells, and in-cell walk width. nlist stays small
# relative to √n on purpose — per-cell graphs only pay off when cell
# size ≫ ef (the tests/test_scale.py finding: ef-128 walks saturate
# √n-sized cells and evaluate MORE than the flat scan).
DEFAULT_IVF_GRAPH_GRID = [
    (8, 2, 48),
    (8, 4, 64),
    (16, 4, 64),
    (16, 8, 96),
    (32, 8, 96),
    (32, 16, 128),
]


@dataclass
class IvfGraphAutotuneResult:
    nlist: int
    nprobe: int
    ef: int
    recall: float
    eval_fraction: float
    latency_s: float
    build_s: float


def autotune_ivf_graph_index(
    df: DataFrame,
    column: str,
    id_column: str,
    metric: str = "l2sq",
    k: int = 10,
    target_recall: float = 0.95,
    test_data_size: int = 10000,
    num_queries: int = 10,
    grid: Optional[Sequence[tuple]] = None,
    seed: int = 42,
    m: int = 16,
    ef_construction: int = 100,
    create_path: Optional[str] = None,
) -> tuple:
    """Joint (nlist, nprobe, ef) sweep for the IVF×graph hybrid
    (VERDICT r6 item 8): until now the hybrid inherited IVF's tuned
    (nlist, nprobe) and a caller-chosen ef, but the three knobs trade
    off JOINTLY — more cells make each walk cheaper but need more
    probes; a wider walk rescues recall lost to fewer probes. Mirrors
    the reference's grid over the composed structure
    (index_autotune/mod.rs:328-359: build per variant, measured recall
    mod.rs:220-254, early exit mod.rs:465-467, selection
    mod.rs:161-186), with the hybrid's own quality instrument
    (``ivf_graph_recall_and_scan_fraction``) supplying recall AND the
    distance-eval fraction per variant.

    Returns (best: IvfGraphAutotuneResult, results, hybrid |
    None). With ``create_path`` the winning (nlist, m, efc) is rebuilt
    there over the FULL ``df``; the winning (nprobe, ef) are
    search-time knobs the caller passes to ``search``.
    """
    from lantern_spark.operators.ivf_graph import (
        IVFGraphIndex,
        ivf_graph_recall_and_scan_fraction,
    )

    spark = df.sparkSession
    sample = df.select(id_column, column).limit(test_data_size).cache()
    sample.count()
    qs = _perturb_queries(
        sample.select(column).limit(num_queries).collect(), metric, seed
    )

    results: List[IvfGraphAutotuneResult] = []
    built: dict = {}  # nlist -> (ivf_path, hybrid) — grid rows sharing
    # nlist share one build (only search knobs differ)
    try:
        for nlist, nprobe, ef in grid or DEFAULT_IVF_GRAPH_GRID:
            if nlist in built:
                hyb, build_s = built[nlist][1], 0.0
            else:
                path = tempfile.mkdtemp(prefix="autotune_ivfg_")
                t0 = time.time()
                ivf = IVFIndex.build(
                    sample, column, id_column, path,
                    metric=metric, nlist=nlist, seed=seed,
                )
                hyb = IVFGraphIndex.attach(
                    ivf, spark, m=m, ef_construction=ef_construction,
                    seed=seed,
                )
                build_s = time.time() - t0
                built[nlist] = (path, hyb)
            t0 = time.time()
            rec, frac = ivf_graph_recall_and_scan_fraction(
                hyb, spark, qs, k=k, nprobe=nprobe, ef=ef
            )
            latency_s = (time.time() - t0) / max(len(qs), 1)
            results.append(
                IvfGraphAutotuneResult(
                    nlist, nprobe, ef, rec, frac, latency_s, build_s
                )
            )
            if rec >= EARLY_EXIT_RECALL:
                break  # mod.rs:465-467
    finally:
        for path, _hyb in built.values():
            shutil.rmtree(path, ignore_errors=True)

    meeting = [r for r in results if r.recall >= target_recall]
    if meeting:
        best = min(meeting, key=lambda r: r.latency_s + r.build_s)
    else:
        best = max(results, key=lambda r: r.recall)

    hybrid = None
    if create_path:
        ivf = IVFIndex.build(
            df, column, id_column, create_path,
            metric=metric, nlist=best.nlist, seed=seed,
        )
        hybrid = IVFGraphIndex.attach(
            ivf, spark, m=m, ef_construction=ef_construction, seed=seed
        )
    sample.unpersist()
    return best, results, hybrid


def results_df(spark: SparkSession, results: List[AutotuneResult]) -> DataFrame:
    """Results as a DataFrame (the reference's autotune-results table,
    lantern_cli/README.md:198-231)."""
    return spark.createDataFrame([asdict(r) for r in results])
