"""Corpus-level document classifier: a fasttext-style quality /
language filter analog trained directly in the engine.

Training is pure Newton-IRLS on the unregularized logistic loss:
every iteration is ONE distributed aggregate pass (gradient X'(p-y)
and Hessian X'WX as k(k+3)/2 map-side-combined sums) plus a tiny
driver-side solve — the exact pattern a 100 TB corpus needs (no
per-row Python, no collected design matrix; cost = n_iter scans of a
narrow projection). From zero init the fit is fully deterministic,
which is what lets the correctness oracle replay all iterations in a
recursive CTE and match the per-document scores value-for-value.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from functime_spark.forecasting.censored import _newton_step


def fit_doc_classifier(
    design: DataFrame,
    feature_cols: list,
    label_col: str,
    n_iter: int = 12,
) -> tuple:
    """(coef, intercept) after `n_iter` exact Newton steps from zero.

    `design` is read n_iter times — persist it when it is not a cheap
    projection of a cached source."""
    coef = np.zeros(len(feature_cols))
    intercept = 0.0
    for _ in range(n_iter):
        coef, intercept = _newton_step(
            design, feature_cols, label_col, coef, intercept
        )
    return coef, float(intercept)


def score_doc_classifier(
    design: DataFrame,
    feature_cols: list,
    coef,
    intercept: float,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """(id, prob, pred) for every document — one narrow codegen
    projection with the weights inlined as literals."""
    z = F.lit(float(intercept))
    for w, c in zip(coef, feature_cols):
        z = z + F.lit(float(w)) * F.col(c).cast("double")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return design.select(
        F.col(id_col),
        p.alias("prob"),
        (p > threshold).cast("int").alias("pred"),
    )
