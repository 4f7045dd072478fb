"""Label centroids + nearest-centroid eval (operators/similarity.py):
exact means, argmax determinism, and perfect accuracy on separable data."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nifi_nlp_processor_spark.operators.similarity import (
    label_centroids,
    nearest_centroid_eval,
)

SCHEMA = "vec_id long, embedding array<float>, label int"


def test_centroid_is_exact_mean(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 3.0], 0),
            (2, [3.0, 2.0, 1.0], 0),
            (3, [0.0, 10.0, 0.0], 1),
        ],
        SCHEMA,
    )
    got = {r.label: (r.n_vectors, r.centroid) for r in label_centroids(emb).collect()}
    assert got[0] == (2, [2.0, 1.0, 2.0])
    assert got[1] == (1, [0.0, 10.0, 0.0])


def test_separable_labels_score_perfect_accuracy(spark):
    # two orthogonal clusters with small within-cluster jitter
    rows = []
    for i in range(10):
        rows.append((i, [10.0 + (i % 3), float(i % 2), 0.0], 0))
        rows.append((100 + i, [0.0, float(i % 2), 10.0 + (i % 3)], 1))
    emb = spark.createDataFrame(rows, SCHEMA)
    out = {r.label: r for r in nearest_centroid_eval(emb).collect()}
    assert out[0].n_vectors == out[1].n_vectors == 10
    assert out[0].accuracy == out[1].accuracy == 1.0
    assert out[0].n_correct == 10
    # self-cosine is high for tight clusters
    assert out[0].mean_self_cosine > 0.99


def test_tie_breaks_to_smaller_label(spark):
    # one vector equidistant from two identical centroids: labels 0 and 1
    # have the SAME centroid, so every score ties and the argmax must pick
    # the smaller label deterministically
    emb = spark.createDataFrame(
        [
            (1, [1.0, 1.0], 0),
            (2, [1.0, 1.0], 1),
        ],
        SCHEMA,
    )
    out = {r.label: r for r in nearest_centroid_eval(emb).collect()}
    # label-0 vector predicted 0 (tie -> smaller), label-1 vector also
    # predicted 0 -> misclassified
    assert out[0].n_correct == 1
    assert out[1].n_correct == 0
