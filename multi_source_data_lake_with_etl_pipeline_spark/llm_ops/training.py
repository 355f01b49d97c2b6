"""Quality-classifier TRAINING on the cluster (pyspark.ml), closing
the loop that ``scoring.py`` serves: scoring.py runs a trained linear
model at scan speed; this module trains that model distributed, on
weak labels the engine already produces (Gopher rule flags, language
ID, source provenance).

Pipeline = Tokenizer-free (we reuse the engine's ``words`` expression)
→ HashingTF (JVM murmur bucket counts, no Python) → IDF → Logistic
Regression (L-BFGS treeAggregate). Every stage is a standard Spark ML
estimator: at 100 TB the featurization is a narrow map and each L-BFGS
iteration is one treeAggregate over the corpus — the canonical
distributed-training shape for linear text classifiers.

Training uses float treeAggregate sums, so coefficients are
deterministic only per partitioning — queries built on this are
registered rows-only; exactness is asserted in unit tests as accuracy
bounds against the weak labels, not value hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_stats import words


def _token_df(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("_toks", words(F.col(text_col)))


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    num_features: int = 1 << 14,
    max_iter: int = 20,
    reg_param: float = 0.001,
    use_idf: bool = False,
):
    """Fit hashed-BoW (+ optional IDF) + logistic regression against a
    boolean/0-1 ``label_col``. Returns the fitted ``PipelineModel``
    (feature stages + LR) — pass it to :func:`score_with_model`.

    ``use_idf`` defaults OFF: quality/language weak labels are carried
    mostly by FUNCTION words (stopwords, boilerplate markers) that
    appear in nearly every document — IDF scales exactly those features
    toward zero and demonstrably erases the signal (measured: en-vs-rest
    on this corpus trains to 1.00 accuracy on raw TF, chance with IDF).
    Turn it on for topical/domain targets where rare words carry the
    class.

    ``num_features`` 16k keeps the coefficient vector broadcast-sized
    (128 KB) while collisions stay rare for vocabulary ≪ 16k; scale it
    with vocabulary, not corpus size — corpus size only adds rows,
    which is what the distributed L-BFGS absorbs."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF

    feat = _token_df(df, text_col).withColumn(
        "_label", F.col(label_col).cast("double")
    )
    tf_out = "_tf" if use_idf else "_features"
    stages = [HashingTF(inputCol="_toks", outputCol=tf_out, numFeatures=num_features)]
    if use_idf:
        stages.append(IDF(inputCol="_tf", outputCol="_features"))
    stages.append(
        LogisticRegression(
            featuresCol="_features",
            labelCol="_label",
            maxIter=max_iter,
            regParam=reg_param,
            standardization=False,
        )
    )
    model = Pipeline(stages=stages).fit(feat)
    return _strip_training_summary(model)


def _strip_training_summary(model):
    """Serialization-proof the fitted pipeline via a save/load
    round-trip (the same thing a serving deployment does). The fitted
    LogisticRegressionModel carries a trainingSummary that captures the
    live SparkSession; when the scoring transform ships the model to
    executors, that reference drags the session (and its
    ObservationManager, non-serializable once any Observation has run
    in the session) into the task closure and the job dies with
    NotSerializableException. Persisted models never include the
    summary, so load() returns a clean, closure-safe model."""
    import shutil
    import tempfile

    from pyspark.ml import PipelineModel

    path = tempfile.mkdtemp(prefix="mdl_qc_model_")
    try:
        model.write().overwrite().save(path)
        return PipelineModel.load(path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def score_with_model(model, df: DataFrame, text_col: str = "text") -> DataFrame:
    """Apply a fitted pipeline: adds ``prediction`` (0.0/1.0) and
    ``p_keep`` (probability of class 1). The transform is JVM-side —
    hashing, IDF scaling and the coefficient dot product all run as ML
    transformers with no Python workers."""
    scored = model.transform(_token_df(df, text_col))
    from pyspark.ml.functions import vector_to_array

    return scored.withColumn(
        "p_keep", F.round(vector_to_array("probability")[1], 4)
    ).drop("_toks", "_tf", "_features", "rawPrediction", "probability")


def train_and_score(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    num_features: int = 1 << 14,
    max_iter: int = 20,
) -> DataFrame:
    """Train on ``df``'s weak labels and score the same corpus (the
    standard bootstrap: rules label a slice, the classifier generalizes
    and smooths them). Returns df + prediction/p_keep."""
    model = train_quality_classifier(
        df, label_col, text_col, num_features=num_features, max_iter=max_iter
    )
    return score_with_model(model, df, text_col)
