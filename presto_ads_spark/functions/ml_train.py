"""Real model training for the SQL-surface ML functions.

Reference: presto-ml — LearnClassifierAggregation.java trains a libsvm
C_SVC with a LINEAR kernel (LibSvmUtils.java:34 sets
``kernel_type = LINEAR``; C defaults to 1), LearnRegressorAggregation
trains EPSILON_SVR; classify/regress (MLFunctions.java) apply the model.

Spark-first split: the *training* step is a Python UDF that runs once per
aggregated model value (NOT per data row — the aggregate collects the
capped training set into a single cell first), fitting a deterministic
linear model with numpy. The *scoring* step stays entirely JVM-side:
rewrite.py lowers classify/regress to zip_with/aggregate dot products
over the returned weights, so inference is whole-stage-codegen over
arbitrarily many rows. This mirrors the reference's own execution shape
(single-node libsvm fit, per-row native scoring) while keeping the hot
path UDF-free.

Models:
- classifier: one-vs-rest linear SVM (hinge + L2), full-batch Pegasos
  subgradient descent — deterministic (no sampling, fixed epochs), C=1
  like libsvm's default.
- regressor: linear least squares via the normal equations with a tiny
  ridge term (deterministic, exact on linearly-generated data; the
  reference's epsilon-SVR agrees on such data up to epsilon).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# fixed full-batch epochs — enough for the small capped training sets the
# SQL surface accepts (rewrite.ML_SQL_MODEL_CAP); deterministic by design
_EPOCHS = 300
_C = 1.0  # libsvm default


def _train_classifier_ovr(feats, label_idx):
    """One-vs-rest linear SVM. ``feats``: list of double arrays;
    ``label_idx``: 1-based class index per row (classes sorted JVM-side,
    so ordering is consistent with the model's __ml_classes array).
    Returns (weights per class, intercept per class)."""
    if not feats:
        return None
    import numpy as np

    # the rewrite filters NULL label/features rows before the agg; this
    # guard keeps a stray None from surfacing as an opaque Py4J task
    # failure (the reference rejects NULLs at the aggregation layer)
    if any(f is None for f in feats) or any(
        i is None for i in label_idx
    ):
        raise ValueError(
            "learn_classifier: NULL feature vector or label in the"
            " training set"
        )
    x = np.asarray([list(f) for f in feats], dtype=float)
    y = np.asarray(label_idx, dtype=int) - 1
    n, d = x.shape
    k = int(y.max()) + 1 if n else 0
    lam = 1.0 / (_C * n)
    ws, bs = [], []
    for c in range(k):
        sign = np.where(y == c, 1.0, -1.0)
        w = np.zeros(d)
        b = 0.0
        for t in range(1, _EPOCHS + 1):
            eta = 1.0 / (lam * t)
            margin = sign * (x @ w + b)
            viol = margin < 1.0
            gw = lam * w - (sign[viol, None] * x[viol]).sum(axis=0) / n
            gb = -sign[viol].sum() / n
            w = w - eta * gw
            b = b - eta * gb
        ws.append([float(v) for v in w])
        bs.append(float(b))
    return (ws, bs)


def _train_regressor(feats, labels):
    """Linear least squares with intercept (normal equations + tiny
    ridge for rank-deficient inputs)."""
    if not feats:
        return None
    import numpy as np

    if any(f is None for f in feats) or any(v is None for v in labels):
        raise ValueError(
            "learn_regressor: NULL feature vector or label in the"
            " training set"
        )
    x = np.asarray([list(f) for f in feats], dtype=float)
    y = np.asarray(labels, dtype=float)
    a = np.hstack([x, np.ones((len(y), 1))])
    gram = a.T @ a + 1e-9 * np.eye(a.shape[1])
    coef = np.linalg.solve(gram, a.T @ y)
    return ([float(v) for v in coef[:-1]], float(coef[-1]))


def register_ml_train_udfs(spark: SparkSession) -> None:
    spark.udf.register(
        "__ml_train_classifier",
        _train_classifier_ovr,
        "struct<ws: array<array<double>>, bs: array<double>>",
    )
    spark.udf.register(
        "__ml_train_regressor",
        _train_regressor,
        "struct<w: array<double>, b: double>",
    )
