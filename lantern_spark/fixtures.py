"""Deterministic ANN-quality fixtures shared by bench.py and
tests/test_scale.py.

The point of this module is that the quality instrument must be able
to FAIL (VERDICT r6 item 1): the previous fixture replicated each
embedding 30-300× with a per-element offset ~20× smaller than the
inter-point distance and drew probes from the indexed corpus itself,
so every probe's top-10 was its own replica clique inside one k-means
cell and ``recall@10 = 1.0 @ nprobe=1`` was true by construction.

Here the replica perturbation is sized to the corpus geometry — the
testdata embeddings have per-element std ≈ 0.125 and mean
nearest-neighbor L2 distance ≈ 1.15 at dim 64; a hash-derived uniform
offset of amplitude 0.25/element has expected norm
``sqrt(64·0.25²/3) ≈ 1.15``, i.e. a replica is about as far from its
base as the base's true nearest neighbor — so a probe's top-10 mixes
replica-family and foreign points and spreads across Voronoi cells.
Probes are additionally HELD OUT of the index (anti-joined by vec_id
before build), so the trivial distance-0 self-hit cannot occur.
Matches the reference's recall-harness intent
(lantern_extras/src/index_autotune/mod.rs:188-218: measured recall on
queries vs exact ground truth, where the measurement can miss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: per-element uniform noise amplitude; see module docstring for why
#: 0.25 ≈ "replica offset norm == mean nearest-neighbor distance"
NOISE_AMPLITUDE = 0.25


def _jitter(x, vec_id_col, i, amplitude: float):
    """Hash-derived uniform offset in [-amplitude, +amplitude] keyed on
    (vec_id, element index) — deterministic under any partitioning
    (unlike F.rand, which is seeded per-partition)."""
    u = F.pmod(F.xxhash64(vec_id_col, i), F.lit(1000001)).cast(
        "double"
    ) / F.lit(500000.0) - F.lit(1.0)
    return x + u * F.lit(float(amplitude))


def replicated_corpus(
    emb: DataFrame,
    reps: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    amplitude: float = NOISE_AMPLITUDE,
) -> DataFrame:
    """``emb`` × ``reps`` with corpus-scale per-replica perturbation.

    Every replica is a distinct point roughly one nearest-neighbor
    distance from its base — nearest neighbors are genuinely ambiguous
    between replica-family and foreign points, so ANN recall on this
    corpus is a real measurement.
    """
    reps_df = F.broadcast(
        emb.sparkSession.range(reps).select(
            F.col("id").cast("int").alias("__rep")
        )
    )
    keyed = emb.crossJoin(reps_df).select(
        (F.col(id_col) * 1000 + F.col("__rep")).alias(id_col),
        F.col(vec_col),
    )
    return keyed.select(
        id_col,
        F.transform(
            vec_col,
            lambda x, i: _jitter(x, F.col(id_col), i, amplitude),
        ).alias(vec_col),
    )


def held_out_probes(
    corpus: DataFrame,
    n_probes: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple:
    """Deterministically pick ``n_probes`` rows, REMOVE them from the
    corpus, and return ``(index_input_df, probe_vectors)``.

    The probes are crc32-spread across the corpus (order-stable), and
    the anti-join guarantees no probe is a member of the index — the
    self-hit at distance 0 that made the old fixture unfailable is
    impossible. Ground truth for recall is the exact top-k over the
    remaining corpus (recall_at_k / tune_nprobe compute it from the
    stored lists, so holding probes out needs no other change).
    """
    rows = (
        corpus.orderBy(F.crc32(F.col(id_col).cast("string")), id_col)
        .limit(n_probes)
        .collect()
    )
    probe_ids = [r[id_col] for r in rows]
    probes = [[float(x) for x in r[vec_col]] for r in rows]
    index_input = corpus.filter(~F.col(id_col).isin(probe_ids))
    return index_input, probes
