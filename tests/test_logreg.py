"""Deterministic distributed logistic regression (operators/logreg.py)."""

import pytest

from dockerized_data_pipeline_spark.operators.logreg import logreg_fit, logreg_score


def _toy(spark, n=200, parts=4):
    """Linearly separable: label = (x1 + x2 > 0), deterministic grid."""
    rows = []
    for i in range(n):
        x1 = (i % 21 - 10) / 5.0
        x2 = ((i * 7) % 17 - 8) / 4.0
        rows.append((i, x1, x2, 1 if x1 + x2 > 0.1 else 0))
    return spark.createDataFrame(
        rows, "id long, x1 double, x2 double, y int"
    ).repartition(parts)


def test_fit_separates_planted_data(spark):
    df = _toy(spark)
    w = logreg_fit(df, ["x1", "x2"], "y", iterations=60, lr=2.0)
    scored = logreg_score(df, w, ["x1", "x2"])
    wrong = scored.filter(
        ((scored.score >= 0.5).cast("int")) != scored.y
    ).count()
    # separable with margin 0.1: full-batch GD should classify all but the
    # narrow boundary band correctly
    assert wrong <= df.count() * 0.05
    # direction: both true weights are positive
    assert w[0] > 0 and w[1] > 0


def test_fit_is_partition_invariant(spark):
    """Decimal gradient sums -> identical weights on any partitioning."""
    base = _toy(spark, n=150)
    w1 = logreg_fit(base.repartition(1), ["x1", "x2"], "y", iterations=10)
    w7 = logreg_fit(base.repartition(7), ["x1", "x2"], "y", iterations=10)
    assert w1 == w7  # exact float equality, not approx


def test_l2_shrinks_weights(spark):
    df = _toy(spark)
    w0 = logreg_fit(df, ["x1", "x2"], "y", iterations=30, lr=1.0, l2=0.0)
    wr = logreg_fit(df, ["x1", "x2"], "y", iterations=30, lr=1.0, l2=0.5)
    assert abs(wr[0]) < abs(w0[0]) and abs(wr[1]) < abs(w0[1])


def test_score_is_pure_expression(spark):
    """Scoring is a codegen'd expression: no shuffle, no Python eval."""
    df = spark.createDataFrame(
        [(0, -2.0, -2.0, 0)], "id long, x1 double, x2 double, y int"
    )
    scored = logreg_score(df, [1.0, -1.0, 0.0], ["x1", "x2"])
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    row = scored.filter(df.id == 0).select("score").collect()[0]
    import math

    x1, x2 = 0 % 21 - 10, 0 - 8  # id 0 -> x1=-2.0, x2=-2.0
    expected = 1.0 / (1.0 + math.exp(-(1.0 * -2.0 + -1.0 * -2.0 + 0.0)))
    assert row.score == pytest.approx(expected, abs=1e-12)


def test_empty_input_raises(spark):
    df = _toy(spark).filter("id < 0")
    with pytest.raises(ValueError):
        logreg_fit(df, ["x1", "x2"], "y", iterations=1)


def test_hard_link_separates_and_is_partition_invariant(spark):
    """link='hard' (exactly-rounded piecewise-linear sigmoid, the
    oracle-able trainer) still learns the separable toy problem and keeps
    the exact partition-invariance guarantee."""
    df = _toy(spark)
    w = logreg_fit(df, ["x1", "x2"], "y", iterations=60, lr=2.0, link="hard")
    scored = logreg_score(df, w, ["x1", "x2"], link="hard")
    wrong = scored.filter(((scored.score >= 0.5).cast("int")) != scored.y).count()
    assert wrong <= df.count() * 0.05
    assert w[0] > 0 and w[1] > 0
    w1 = logreg_fit(
        df.repartition(1), ["x1", "x2"], "y", iterations=10, link="hard"
    )
    w7 = logreg_fit(
        df.repartition(7), ["x1", "x2"], "y", iterations=10, link="hard"
    )
    assert w1 == w7


def test_hard_link_score_is_clamped_pure_expression(spark):
    """Hard-sigmoid scores are exact clamp(0.5 + 0.25*z, 0, 1) values and
    the scoring plan stays shuffle- and Python-free."""
    df = spark.createDataFrame(
        [(0, -8.0, 0.0, 0), (1, 8.0, 0.0, 1), (2, 1.0, 0.0, 1)],
        "id long, x1 double, x2 double, y int",
    )
    scored = logreg_score(df, [1.0, 0.0, 0.0], ["x1", "x2"], link="hard")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    got = {r.id: r.score for r in scored.collect()}
    assert got[0] == 0.0  # saturated low
    assert got[1] == 1.0  # saturated high
    assert got[2] == 0.5 + 0.25 * 1.0  # exact, not approx: IEEE-only ops
