"""fastText-style document quality classifier (Spark-ML-native).

The model-based quality filter from the GPT-3 / LLaMA / CCNet data
pipelines: a LINEAR classifier over hashed bag-of-ngram features
(Joulin et al. 2016, "Bag of Tricks for Efficient Text
Classification") trained on weak labels (reference corpus = positive,
raw crawl = negative), then applied as a per-document keep/score pass.

Spark-first mapping — fastText's architecture is exactly the MLlib
primitive chain, no custom kernels needed:

- word + bigram features      → tokenize expr + a codegen bigram zip
- feature hashing (2^n bins)  → ``HashingTF`` (JVM MurmurHash3)
- linear classifier           → ``LogisticRegression`` (distributed
                                 treeAggregate L-BFGS — the cluster
                                 analog of fastText's SGD)

Scale (100 TB): training cost is dominated by one featurization pass
per L-BFGS iteration (map-only until the gradient treeAggregate);
scoring is a single map pass with the O(2^n · coefficients) model
broadcast by MLlib. No Python UDFs anywhere — tokenization and
bigrams are Catalyst expressions, hashing/model are JVM transformers.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lantern_spark.functions.text import tokenize

_FEAT = "__qc_terms"
_RAW = "__qc_raw"
_VEC = "__qc_vec"


def _terms_expr(text_col: str, use_bigrams: bool):
    """Tokens (+ joined bigrams) as ONE array column — pure
    expressions, so featurization stays inside whole-stage codegen."""
    toks = tokenize(F.col(text_col))
    if not use_bigrams:
        return toks
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, F.lit(1), F.greatest(n - 1, F.lit(0))),
        F.slice(toks, F.lit(2), F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    return F.concat(toks, bigrams)


class QualityClassifier:
    """Trained quality model: scoring + persistence handle."""

    def __init__(self, pipeline_model, n_features: int, use_bigrams: bool):
        self.pipeline_model = pipeline_model
        self.n_features = int(n_features)
        self.use_bigrams = bool(use_bigrams)

    def score(
        self,
        df: DataFrame,
        text_col: str,
        out_col: str = "quality_prob",
    ) -> DataFrame:
        """Append P(label=1) per document — one map pass (broadcast
        model), original columns preserved."""
        from pyspark.ml.functions import vector_to_array

        feats = df.withColumn(
            _FEAT, _terms_expr(text_col, self.use_bigrams)
        )
        scored = self.pipeline_model.transform(feats)
        return scored.withColumn(
            out_col,
            vector_to_array(F.col("probability")).getItem(1),
        ).drop(
            _FEAT, _RAW, _VEC, "rawPrediction", "probability", "prediction"
        )

    def filter(
        self,
        df: DataFrame,
        text_col: str,
        min_prob: float = 0.5,
        out_col: str = "quality_prob",
    ) -> DataFrame:
        """Keep documents scoring ≥ min_prob (the pipeline stage
        shape: GPT-3 kept docs by a score-vs-Pareto draw; a plain
        threshold is the deterministic variant)."""
        return self.score(df, text_col, out_col).filter(
            F.col(out_col) >= float(min_prob)
        )

    def save(self, path: str) -> None:
        self.pipeline_model.write().overwrite().save(
            os.path.join(path, "model")
        )
        with open(os.path.join(path, "meta.json"), "w") as fh:
            json.dump(
                {
                    "n_features": self.n_features,
                    "use_bigrams": self.use_bigrams,
                    "format_version": "1.0",
                },
                fh,
            )

    @classmethod
    def load(cls, path: str) -> "QualityClassifier":
        from pyspark.ml import PipelineModel

        with open(os.path.join(path, "meta.json")) as fh:
            meta = json.load(fh)
        major = int(str(meta.get("format_version", "1.0")).split(".")[0])
        if major != 1:
            raise ValueError(
                f"quality classifier format_version {meta['format_version']} "
                "is incompatible with this reader (major 1)"
            )
        model = PipelineModel.load(os.path.join(path, "model"))
        return cls(model, meta["n_features"], meta["use_bigrams"])


def train_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n_features: int = 1 << 18,
    use_bigrams: bool = True,
    max_iter: int = 50,
    reg_param: float = 1e-4,
    elastic_net: float = 0.0,
) -> QualityClassifier:
    """Train on weakly-labeled documents (``label_col`` ∈ {0, 1};
    1 = looks like the reference corpus). Deterministic: L-BFGS from a
    zero initial vector over a deterministic feature hash — no RNG in
    the whole chain, so retrains on the same data give the same model.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, Normalizer

    feats = df.withColumn(_FEAT, _terms_expr(text_col, use_bigrams))
    tf = HashingTF(
        inputCol=_FEAT, outputCol=_RAW, numFeatures=int(n_features)
    )
    # L1-normalize term counts — fastText's mean-of-embeddings analog:
    # without it a document's score scales with its LENGTH, and short
    # clean docs land near the decision boundary
    norm = Normalizer(inputCol=_RAW, outputCol=_VEC, p=1.0)
    lr = LogisticRegression(
        featuresCol=_VEC,
        labelCol=label_col,
        maxIter=int(max_iter),
        regParam=float(reg_param),
        elasticNetParam=float(elastic_net),
        standardization=False,
    )
    model = Pipeline(stages=[tf, norm, lr]).fit(feats)
    # Strip the training summary in place: a freshly fitted
    # LogisticRegressionModel carries a trainingSummary that holds the
    # live SparkSession, and when the model ships inside a task
    # closure (scoring UDF in a filter predicate), Java serialization
    # walks model → summary → SparkSession → ObservationManager and
    # throws NotSerializableException — but only on plans that fall
    # back from whole-stage codegen, so the failure is order-dependent
    # and surfaces as suite-only flakes. setSummary is Scala
    # package-private (= public in bytecode, reachable via py4j);
    # unlike a save/load roundtrip this needs no shared filesystem,
    # so it is safe on a real cluster too.
    lrm = model.stages[-1]
    lrm._java_obj.setSummary(
        feats.sparkSession._jvm.scala.Option.empty()
    )
    assert not lrm.hasSummary
    return QualityClassifier(model, n_features, use_bigrams)


def weak_labels_from_sources(
    df: DataFrame, source_col: str, positive_sources
) -> DataFrame:
    """The standard weak-supervision shortcut: membership in a trusted
    source set IS the positive label (CCNet uses Wikipedia; GPT-3 used
    WebText/books/wiki)."""
    pos = [str(s) for s in positive_sources]
    return df.withColumn(
        "label",
        F.col(source_col).isin(pos).cast("double"),
    )
