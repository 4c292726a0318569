"""Spark-vs-DuckDB parity on NULL-bearing inputs for the r8 oracle
conversions. The driver fixtures contain no NULL text / keys, so the
sweep can never exercise these paths; these tests build tiny synthetic
'sf dirs' WITH nulls and assert the registry query and its oracle SQL
still agree (regressions for the three NULL-semantics divergences the
r8 code review found: hard-sigmoid least/greatest null-skip, oracle-side
NULL-teacher coercion to 0, and NULL-key register divergence in the
portable HLL)."""

from __future__ import annotations

import duckdb

from dockerized_data_pipeline_spark.plans import registry


def _multiset(rows):
    out = {}
    for r in rows:
        t = tuple(str(v) for v in r)
        out[t] = out.get(t, 0) + 1
    return out


def _assert_parity(spark, sf_dir, name, tables):
    got = _multiset(
        tuple(r) for r in registry.QUERIES[name](spark, str(sf_dir)).collect()
    )
    con = duckdb.connect()
    for t in tables:
        # Spark writes a directory of part files; glob them for DuckDB
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    want = _multiset(con.execute(registry.ORACLES[name]).fetchall())
    con.close()
    assert got == want


def test_quality_classifier_oracle_agrees_on_null_rows(spark, tmp_path):
    """Rows with NULL text / NULL n_chars must be dropped from gradient
    sums and scored NULL identically by both engines (not trained as
    negatives by DuckDB or scored 1.0 by Spark)."""
    rows = [
        (1, "s1", "the quick fox " * 30, 420),
        (2, "s1", None, 100),               # NULL text
        (3, "s2", "a b c d e f g h", None),  # NULL n_chars
        (4, "s2", "the and is to of " * 40, 800),
        (5, "s2", "zz yy xx", 24),
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars int"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    _assert_parity(
        spark, tmp_path, "x5_quality_classifier", ["documents"]
    )


def test_hll_portable_oracle_agrees_on_null_keys(spark, tmp_path):
    """NULL o_custkey rows are excluded on BOTH sides (COUNT(DISTINCT)
    semantics); without the filter Spark hashes NULL to the seed while
    the SQL replay NULL-propagates -- divergent registers."""
    rows = [(i % 37 if i % 5 else None, "F" if i % 2 else "O")
            for i in range(200)]
    spark.createDataFrame(
        rows, "o_custkey long, o_orderstatus string"
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    _assert_parity(spark, tmp_path, "sketch_hll_portable", ["orders"])


def test_histogram_percentiles_oracle_agrees_on_null_prices(spark, tmp_path):
    """NULL l_extendedprice rows are filtered on BOTH sides (ADVICE r8):
    Spark's window orders the NULL bin FIRST (inflating every cumulative
    count) while DuckDB orders it LAST, and unbinned NULL rows would
    still count toward n -- so without the filter the quantile edges
    diverge engine-to-engine."""
    rows = [
        (float(64 * (i % 13) + i % 7) if i % 4 else None,
         "A" if i % 2 else "R")
        for i in range(300)
    ]
    spark.createDataFrame(
        rows, "l_extendedprice double, l_returnflag string"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    _assert_parity(
        spark, tmp_path, "sketch_histogram_percentiles", ["lineitem"]
    )


def test_hard_sigmoid_score_null_propagates(spark):
    """A missing feature must yield a NULL score under link='hard',
    matching the logistic link -- not a confident 1.0."""
    from dockerized_data_pipeline_spark.operators.logreg import logreg_score

    df = spark.createDataFrame(
        [(0, None, 1.0), (1, 2.0, 1.0)], "id long, x1 double, x2 double"
    )
    got = {
        r.id: r.score
        for r in logreg_score(df, [1.0, 1.0, 0.0], ["x1", "x2"], link="hard").collect()
    }
    assert got[0] is None
    assert got[1] == 1.0  # 0.5 + 0.25*3 saturates high
