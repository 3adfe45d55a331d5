"""Model-based quality filtering — the trained-classifier stage of a
large-scale curation pipeline.

Heuristic quality scores (functions/text.py:quality_score) are the
first-pass filter; the published large-LM pipelines additionally train
a LINEAR CLASSIFIER that separates a trusted high-quality corpus from
raw crawl text and keep documents the model scores as reference-like
(the GPT-3 appendix-A recipe — a logistic classifier over hashed text
features — also used, with fasttext in place of LR, by Llama's and
CCNet's pipelines).  This module is that stage, MLlib-native:

* ``train_quality_model`` — tokenize → ``HashingTF`` (feature hashing:
  no vocabulary state to build or ship, the same trick that makes the
  shingle detectors scale) → ``LogisticRegression``.  Training runs
  distributed (MLlib's L-BFGS aggregates gradients tree-wise); in
  practice the labeled set is a tiny sample of the corpus, so this is
  minutes of work regardless of corpus size.
* ``score_quality`` — the fitted model's transform: a broadcast
  coefficient vector dotted against each document's hashed features,
  map-only at any scale; returns P(reference-like) per document.

The classifier's coefficients depend on float aggregation order, so
scores are deterministic only per-fit — the operator is therefore
covered by tests (separation on planted labels), not a value-hash
oracle; the repo-wide oracle pattern applies to everything downstream
of the scores.

No reference counterpart (the reference ingests pre-curated
highlights) — north-star scope, SURVEY §2.7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 1 << 18  # hashed feature space; collisions are the usual
# fasttext/VW regime and cost accuracy, not correctness


def train_quality_model(
    good: DataFrame,
    bad: DataFrame,
    text_col: str = "text",
    n_features: int = N_FEATURES,
    reg_param: float = 1e-3,
    max_iter: int = 50,
):
    """Fit the quality classifier: ``good`` = trusted reference docs
    (label 1), ``bad`` = raw/rejected docs (label 0).  Returns a fitted
    ``PipelineModel`` whose transform adds ``probability``.

    Feature hashing keeps the pipeline stateless — no vocabulary fit,
    nothing corpus-sized to broadcast; the only learned state is one
    ``n_features``-long coefficient vector.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    labeled = good.select(
        F.col(text_col).alias("text"), F.lit(1.0).alias("label")
    ).unionByName(bad.select(F.col(text_col).alias("text"), F.lit(0.0).alias("label")))
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol="text", outputCol="_toks", pattern="\\s+", minTokenLength=1
            ),
            HashingTF(inputCol="_toks", outputCol="_feat", numFeatures=n_features),
            LogisticRegression(
                featuresCol="_feat",
                labelCol="label",
                regParam=reg_param,
                maxIter=max_iter,
            ),
        ]
    )
    return pipe.fit(labeled)


def score_quality(
    model,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, quality_prob): P(reference-like) for every document —
    map-only scoring with the broadcast coefficient vector.  Filter
    downstream with ``quality_prob >= tau``; the GPT-3 recipe instead
    keeps docs where ``np.random.pareto(9) > 1 - prob`` (stochastic,
    favors high scores while keeping tail diversity) — both are one
    more map-side predicate."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs.select(F.col(id_col), F.col(text_col).alias("text")))
    return scored.select(
        F.col(id_col),
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"),
    )
