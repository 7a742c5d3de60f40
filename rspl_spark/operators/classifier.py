"""Trained quality classifier: distributed logistic regression.

Heuristic quality signals (operators/text.py) rank documents by fixed
formulas; production pipelines TRAIN a lightweight classifier on labeled
examples and score the corpus with it (the model-based quality-filter
pattern used by modern pretraining datasets). This is the smallest
genuinely-trained version of that, built on the same scale pattern as
``kmeans_fit``: per iteration ONE narrow ``mapInPandas`` pass emits
per-partition gradient partial sums (d+1 floats + a count per
partition), the driver combines them and updates the weight vector —
no shuffle inside an iteration, model state is d+1 driver-side floats,
the data never moves. Scoring is a pure codegen'd expression
(sigmoid of a literal dot product): zero Python in the scoring plan,
so the trained filter costs the same as a heuristic one at 100 TB.

Determinism: init w = 0, fixed iteration count, full-batch gradient —
a SQL engine replays the training run as a CTE chain (one 1-row weight
CTE per iteration), which is how q_quality_classifier is hash-gated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def logreg_fit(
    df: DataFrame,
    features: list[Column],
    label: Column,
    iters: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Full-batch gradient ascent on the log-likelihood; returns
    ``[w_0 .. w_{d-1}, bias]``. One partial-sum pass per iteration."""
    d = len(features)
    feats = df.select(
        *[f.cast("double").alias(f"x{i}") for i, f in enumerate(features)],
        label.cast("double").alias("y"),
    )
    # a single NULL feature/label row would NaN the whole partition's
    # gradient (X.T @ (y-p) propagates), silently yielding all-NaN
    # weights and 0.5 scores everywhere — drop incomplete rows, the
    # same treatment the oracle's CASE/SUM NULL semantics give them
    cond = F.col("y").isNotNull()
    for i in range(d):
        cond = cond & F.col(f"x{i}").isNotNull()
    feats = feats.filter(cond)
    w = np.zeros(d + 1, dtype=np.float64)
    for _ in range(iters):
        W = w.copy()

        def partials(batches):
            g = np.zeros(d + 1, dtype=np.float64)
            n = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.column_stack(
                    [pdf[f"x{i}"].to_numpy(dtype=np.float64) for i in range(d)]
                    + [np.ones(len(pdf))]
                )
                y = pdf["y"].to_numpy(dtype=np.float64)
                p = 1.0 / (1.0 + np.exp(-(X @ W)))
                g += X.T @ (y - p)
                n += len(pdf)
            if n:
                yield pd.DataFrame({"g": [g.tolist()], "n": [n]})

        parts = feats.mapInPandas(partials, "g array<double>, n long").collect()
        g = np.zeros(d + 1, dtype=np.float64)
        n = 0
        for r in parts:
            g += np.asarray(r["g"], dtype=np.float64)
            n += r["n"]
        if n == 0:
            raise ValueError("logreg_fit: empty input")
        w = w + lr * g / n
    return [float(x) for x in w]


def logreg_score(features: list[Column], weights: list[float]) -> Column:
    """sigmoid(w . x + b) as a pure codegen expression — the trained
    model scores the corpus with zero Python in the plan."""
    if len(weights) != len(features) + 1:
        raise ValueError("weights must be features + bias")
    z: Column = F.lit(float(weights[-1]))
    for f, wi in zip(features, weights[:-1]):
        z = z + f.cast("double") * F.lit(float(wi))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
