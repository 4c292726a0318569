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


def _hard_sigmoid(z: Column) -> Column:
    """Piecewise-linear link clamp(0.5 + 0.25*z, 0, 1) built ONLY from
    exactly-rounded IEEE-754 ops (*, +, comparisons) -- no libm. Every
    engine that implements IEEE doubles produces bit-identical values for
    the same expression tree, so a model trained with this link (and the
    scores it emits) can be replayed hash-exactly in DuckDB SQL, unlike
    the libm `exp` in :func:`_sigmoid` whose last-ulp rounding is
    implementation-defined (java.lang.Math vs C libm).

    Clamping is a CASE chain, NOT least/greatest: Spark's least/greatest
    SKIP nulls, which would score a row with a missing feature as a
    confident 1.0; the CASE chain NULL-propagates exactly like
    :func:`_sigmoid` (both WHEN predicates are NULL -> falsy -> ELSE
    returns the NULL), and DuckDB CASE matches."""
    c = F.lit(0.5) + F.lit(0.25) * z
    return F.when(c < 0.0, F.lit(0.0)).when(c > 1.0, F.lit(1.0)).otherwise(c)


_LINKS = {"logistic": _sigmoid, "hard": _hard_sigmoid}


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
    cache: bool = True,
    link: str = "logistic",
) -> list[float]:
    """Fit weights (one per feature + trailing bias) by full-batch GD.

    Returns ``len(feature_cols) + 1`` floats; score new rows with
    :func:`logreg_score` using the same feature list.  ``l2`` is the
    ridge penalty (bias excluded, standard practice).

    ``link="hard"`` swaps the libm sigmoid for the exactly-rounded
    piecewise-linear :func:`_hard_sigmoid`; combined with the decimal
    gradient sums this makes the ENTIRE training trajectory a pure
    function of the data under IEEE-754 semantics -- replayable
    bit-exactly in any other engine (the x5_quality_classifier oracle
    unrolls it into a DuckDB CTE chain).
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
        sig = _LINKS[link]
        weights = [0.0] * len(cols)
        for _ in range(iterations):
            resid = sig(_z(weights, cols)) - F.col("__y")
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
    link: str = "logistic",
) -> DataFrame:
    """Append the fitted probability as ``out_col`` (double in [0,1]).
    Pure per-row expression over plan-literal weights — whole-stage
    codegen, zero shuffle, zero Python. Use the same ``link`` the model
    was fitted with."""
    cols = [F.col(c).cast("double") for c in feature_cols] + [F.lit(1.0)]
    z = F.lit(float(weights[0])) * cols[0]
    for w, c in zip(weights[1:], cols[1:]):
        z = z + F.lit(float(w)) * c
    return df.withColumn(out_col, _LINKS[link](z))
