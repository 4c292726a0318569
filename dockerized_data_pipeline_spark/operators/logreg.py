"""Deterministic distributed logistic regression (batch gradient descent)
for trainable document-quality / language gates — the learned upgrade of
the heuristic filters in ``functions/text.py`` (fasttext-style quality
classifiers are standard LLM corpus-prep components; here the model is
trained IN the engine, no external ML stack).

Reference parity note: the reference pipeline has no ML surface — this is
part of the LLM-data extension (SURVEY §2.11 north star), built on the
same determinism discipline as `operators/kmeans.py`:

- **Init**: weights start at exactly zero — no RNG.
- **Gradient sums accumulate in DECIMAL, not double.** Each row's
  contribution ``(sigmoid(w·x) - y) * x_j`` is a deterministic pure
  function of the row (double math), but float SUMS are order-dependent;
  casting the per-row terms to DECIMAL(30,12) before ``F.sum`` makes the
  aggregate exact and associative, so the fitted weights are identical on
  any partitioning or cluster size (partition-invariance is tested).
- **Update**: driver-side on a dim-sized vector of identical operands.

Scale shape per iteration: ONE scan of the (projected, optionally cached)
feature frame feeding a single global aggregate with ``dim`` decimal sum
buffers — map-side combine bounds the shuffle at partitions × dim values
regardless of input size; nothing row-sized ever reaches the driver. At
100 TB you persist the projected feature frame once (double columns only,
a tiny fraction of corpus bytes) and each epoch is one cached-columnar
scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ACC = "decimal(30,12)"


def _z(weights: list[float], cols: list[str]) -> Column:
    expr = F.lit(float(weights[0])) * F.col(cols[0])
    for w, c in zip(weights[1:], cols[1:]):
        expr = expr + F.lit(float(w)) * F.col(c)
    return expr


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
    cache: bool = True,
) -> list[float]:
    """Fit weights (one per feature + trailing bias) by full-batch GD.

    Returns ``len(feature_cols) + 1`` floats; score new rows with
    :func:`logreg_score` using the same feature list.  ``l2`` is the
    ridge penalty (bias excluded, standard practice).
    """
    cols = [f"__f{i}" for i in range(len(feature_cols))] + ["__bias"]
    feats = df.select(
        *[
            F.col(c).cast("double").alias(f"__f{i}")
            for i, c in enumerate(feature_cols)
        ],
        F.lit(1.0).alias("__bias"),
        F.col(label_col).cast("double").alias("__y"),
    )
    if cache:
        feats = feats.persist()
    try:
        n = feats.count()
        if n == 0:
            raise ValueError("logreg_fit: empty input")
        weights = [0.0] * len(cols)
        for _ in range(iterations):
            resid = _sigmoid(_z(weights, cols)) - F.col("__y")
            grad_row = feats.select(
                *[
                    F.sum((resid * F.col(c)).cast(_ACC)).alias(f"g{i}")
                    for i, c in enumerate(cols)
                ]
            ).collect()[0]
            weights = [
                w
                - lr
                * (
                    float(grad_row[f"g{i}"]) / n
                    + (l2 * w if i < len(cols) - 1 else 0.0)
                )
                for i, w in enumerate(weights)
            ]
        return weights
    finally:
        if cache:
            feats.unpersist()


def logreg_score(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    out_col: str = "score",
) -> DataFrame:
    """Append the fitted probability as ``out_col`` (double in [0,1]).
    Pure per-row expression over plan-literal weights — whole-stage
    codegen, zero shuffle, zero Python."""
    cols = [F.col(c).cast("double") for c in feature_cols] + [F.lit(1.0)]
    z = F.lit(float(weights[0])) * cols[0]
    for w, c in zip(weights[1:], cols[1:]):
        z = z + F.lit(float(w)) * c
    return df.withColumn(out_col, _sigmoid(z))
