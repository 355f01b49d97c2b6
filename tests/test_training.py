"""Distributed classifier training (llm_ops/training.py): the
hashed-BoW logistic regression must separate separable vocabularies
and recover the engine's own weak labels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.catalog import load_table
from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.text_stats import lang_id
from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.training import (
    score_with_model,
    train_and_score,
    train_quality_classifier,
)


def _accuracy(scored):
    return scored.select(
        F.avg((F.col("prediction") == F.col("_y")).cast("double")).alias("a")
    ).collect()[0]["a"]


def test_separable_vocabulary_learned(spark):
    # Two disjoint vocabularies — a linear BoW model must separate them.
    good = "alpha beta gamma delta epsilon zeta"
    bad = "noise junk spam filler garbage clutter"
    rows = [(i, good + f" tail{i % 7}", 1.0) for i in range(60)] + [
        (100 + i, bad + f" tail{i % 7}", 0.0) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, _y double")
    train = df.filter(F.col("doc_id") % 2 == 0)
    test = df.filter(F.col("doc_id") % 2 == 1)
    model = train_quality_classifier(train, "_y", num_features=256, max_iter=10)
    assert _accuracy(score_with_model(model, test)) == 1.0


def test_probability_column_bounds(spark):
    rows = [(i, "alpha beta gamma", 1.0) for i in range(20)] + [
        (50 + i, "noise junk spam", 0.0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, _y double")
    out = train_and_score(df, "_y", num_features=64, max_iter=10)
    probs = [r["p_keep"] for r in out.collect()]
    assert all(0.0 <= p <= 1.0 for p in probs)
    # separable: positives score high, negatives low
    pos = out.filter(F.col("_y") == 1.0).agg(F.min("p_keep")).collect()[0][0]
    neg = out.filter(F.col("_y") == 0.0).agg(F.max("p_keep")).collect()[0][0]
    assert pos > 0.9 and neg < 0.1


def test_weak_label_bootstrap_on_documents(spark, sf_dir):
    # Train on the engine's own lang-ID weak labels (stopword votes are
    # bag-of-words features, so raw-TF LR must recover them), score a
    # held-out half.
    d = load_table(spark, sf_dir, "documents")
    lab = lang_id(d).withColumn("_y", (F.col("pred_lang") == "en").cast("double"))
    train = lab.filter(F.col("doc_id") % 2 == 0)
    test = lab.filter(F.col("doc_id") % 2 == 1)
    model = train_quality_classifier(train, "_y", num_features=1024, max_iter=10)
    assert _accuracy(score_with_model(model, test)) >= 0.95


def test_idf_optional_stage_present(spark):
    rows = [(i, "alpha beta", 1.0) for i in range(10)] + [
        (20 + i, "noise junk", 0.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, _y double")
    m_tf = train_quality_classifier(df, "_y", num_features=64, max_iter=5)
    m_idf = train_quality_classifier(
        df, "_y", num_features=64, max_iter=5, use_idf=True
    )
    assert len(m_tf.stages) == 2 and len(m_idf.stages) == 3
