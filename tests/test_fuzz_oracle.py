"""In-suite slice of the differential query fuzzer (VERDICT r6 item 1).

The committed full runs live under tools/fuzz_corpus/ (500 queries x 2
seeds); this keeps a fast random slice running on every pytest pass so a
Spark-side regression in any generated shape (outer-join + filter
placement, NOT IN with injected NULLs, set-op duplicate semantics,
null-grouping) trips CI, not just the per-round tool run.
"""

from __future__ import annotations

import random
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")

from fuzz_oracle import (  # noqa: E402
    TABLES,
    classify_divergence,
    compare,
    gen_query,
    render,
    sample_literals,
)

SF = "/root/testdata/sf0.001"
# a fixed seed DISJOINT from the committed 500-query corpora (42, 1337):
# the suite exercises 40 queries nobody has eyeballed, yet stays fully
# reproducible -- the failure message carries the seed
BASE_SEED = 20_260_815


@pytest.fixture(scope="module")
def engines(spark):
    from dockerized_data_pipeline_spark.catalog import load_table

    con = duckdb.connect()
    views = []
    for t in TABLES:
        load_table(spark, SF, t).createOrReplaceTempView(t)
        views.append(t)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    lits = sample_literals(SF)
    yield spark, con, lits
    for t in views:
        spark.catalog.dropTempView(t)
    con.close()


def test_fuzz_slice_agrees_with_duckdb(engines):
    spark, con, lits = engines
    mismatches = []
    for i in range(40):
        rng = random.Random((BASE_SEED << 20) + i)
        q = gen_query(rng, lits)
        sql = render(q)
        m = compare(spark, con, sql)
        if (
            m is not None
            and m["kind"] not in ("both_error", "too_big")
            and classify_divergence(spark, con, q, m) is None
        ):
            mismatches.append((i, m["kind"], sql, m))
    assert not mismatches, (
        f"seed base {BASE_SEED}: {len(mismatches)} mismatches; first: "
        f"{mismatches[0]}"
    )


def _spark_val(spark, expr):
    try:
        return ("ok", spark.sql(f"SELECT {expr} AS v").collect()[0][0])
    except Exception as e:
        return ("err", type(e).__name__)


def _duck_val(con, expr):
    try:
        return ("ok", con.execute(f"SELECT {expr} AS v").fetchall()[0][0])
    except Exception as e:
        return ("err", type(e).__name__)


def test_v4_grammar_exclusions_are_pinned(engines):
    """Every shape the v4 grammar EXCLUDES is excluded because of a
    real, probed divergence between Spark 4 (ANSI) and DuckDB. Each case
    asserts the divergence still exists; when an engine upgrade makes
    one agree, this fails and the corresponding grammar exclusion should
    be lifted (tools/fuzz_oracle.py module docstring, v4 rules)."""
    spark, con, _ = engines
    # (expr, spark outcome, duck outcome) -- outcome is ("ok", value) or
    # ("err", ...) with the value omitted where only the kind matters
    cases = [
        # unguarded division/mod by zero: Spark ANSI errors, DuckDB NULL
        ("1 / 0", "err", ("ok", None)),
        ("CAST(1 AS DOUBLE) / CAST(0 AS DOUBLE)", "err", ("ok", None)),
        ("MOD(7, 0)", "err", ("ok", None)),
        # fractional/scientific/hex string -> int: Spark NULL, DuckDB parses
        ("TRY_CAST('12.5' AS INTEGER)", ("ok", None), ("ok", 13)),
        ("TRY_CAST('1e3' AS INTEGER)", ("ok", None), ("ok", 1000)),
        ("TRY_CAST('0x1A' AS INTEGER)", ("ok", None), ("ok", 26)),
        # double -> int: Spark truncates, DuckDB rounds (half-even)
        ("CAST(CAST(12.7 AS DOUBLE) AS INTEGER)", ("ok", 12), ("ok", 13)),
        ("CAST(CAST(13.5 AS DOUBLE) AS INTEGER)", ("ok", 13), ("ok", 14)),
        # EXTRACT(DOW): Sunday=7 (Spark ISO-shifted) vs Sunday=6... the
        # numbering differs by one on 1997-03-15 (Saturday)
        ("EXTRACT(DOW FROM TIMESTAMP '1997-03-15 13:45:30')",
         ("ok", 7), ("ok", 6)),
        # EXTRACT(EPOCH): Spark unsupported field
        ("EXTRACT(EPOCH FROM TIMESTAMP '1997-03-15 13:45:30')",
         "err", "ok"),
        # CONCAT null-propagates on Spark, skips NULLs on DuckDB
        ("CONCAT('a', NULL)", ("ok", None), ("ok", "a")),
        # REGEXP_REPLACE is global on Spark, first-match on DuckDB
        ("REGEXP_REPLACE('a1b2', '[0-9]', 'X')",
         ("ok", "aXbX"), ("ok", "aXb2")),
        # SUBSTRING from 0: Spark treats 0 as 1, DuckDB eats a char
        ("SUBSTRING('hello', 0, 3)", ("ok", "hel"), ("ok", "he")),
        # negative LEFT length: empty on Spark, drop-from-right on DuckDB
        ("LEFT('hello', -1)", ("ok", ""), ("ok", "hell")),
        # SQRT(negative): NaN on Spark, error on DuckDB
        ("SQRT(CAST(-1 AS DOUBLE))", "ok", "err"),
        # LN(0): NULL on Spark, error on DuckDB
        ("LN(CAST(0 AS DOUBLE))", ("ok", None), "err"),
        # TRY_CAST bare-time string: Spark fills in the CURRENT date
        ("TRY_CAST('03:04:05' AS TIMESTAMP)", "ok", ("ok", None)),
        # boolean cast vocabularies differ
        ("TRY_CAST('yes' AS BOOLEAN)", ("ok", True), ("ok", None)),
        # SPLIT_PART on NULL input: Spark NULL-propagates, DuckDB returns
        # '' -- found by the v4 fuzzer itself (seed 424242 #342, via a
        # FULL JOIN null-extended column feeding SPLIT_PART in a WHERE)
        ("SPLIT_PART(NULLIF('x', 'x'), '#', 2)", ("ok", None), ("ok", "")),
    ]
    bad = []
    for expr, want_s, want_d in cases:
        got_s, got_d = _spark_val(spark, expr), _duck_val(con, expr)
        ok_s = got_s == want_s if isinstance(want_s, tuple) else got_s[0] == want_s
        ok_d = got_d == want_d if isinstance(want_d, tuple) else got_d[0] == want_d
        if not (ok_s and ok_d):
            bad.append((expr, got_s, got_d))
    assert not bad, f"pinned divergences changed (engine upgrade?): {bad}"


def test_v4_window_syntax_exclusions_are_pinned(engines):
    """Window shapes excluded from the grammar because ONE engine rejects
    the shared syntax: IGNORE NULLS placement (Spark: after the call;
    DuckDB: inside the parens), frame EXCLUDE and DISTINCT window
    aggregates (Spark unsupported)."""
    spark, con, _ = engines
    base = ("FROM (VALUES (1, 1, 10), (1, 2, CAST(NULL AS INTEGER)), "
            "(2, 1, 30)) AS t(p, o, v)")

    def s(expr):
        try:
            spark.sql(f"SELECT {expr} {base}").collect()
            return "ok"
        except Exception:
            return "err"

    def d(expr):
        try:
            con.execute(f"SELECT {expr} {base}").fetchall()
            return "ok"
        except Exception:
            return "err"

    spark_style = ("FIRST_VALUE(v) IGNORE NULLS OVER "
                   "(PARTITION BY p ORDER BY o ASC)")
    duck_style = ("FIRST_VALUE(v IGNORE NULLS) OVER "
                  "(PARTITION BY p ORDER BY o ASC)")
    exclude = ("SUM(v) OVER (PARTITION BY p ORDER BY o ASC ROWS BETWEEN "
               "1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)")
    distinct = "COUNT(DISTINCT v) OVER (PARTITION BY p)"
    assert (s(spark_style), d(spark_style)) == ("ok", "err")
    assert (s(duck_style), d(duck_style)) == ("err", "ok")
    assert (s(exclude), d(exclude)) == ("err", "ok")
    assert (s(distinct), d(distinct)) == ("err", "ok")


def test_range_zero_preceding_divergence_is_pinned(engines):
    """Found by the v4 fuzzer itself (seed 8801, #294): a RANGE frame
    ending at '0 PRECEDING'. The standard treats offset 0 as CURRENT ROW
    (value-equal rows -- peers -- are inside the frame); Spark agrees,
    DuckDB excludes the current row AND its peers (its own value is not
    in its own frame). The grammar generates RANGE offsets >= 1; ROWS
    '0 PRECEDING' agrees on both engines and stays allowed."""
    spark, con, _ = engines
    sql = ("SELECT v, CAST(SUM(v) OVER (ORDER BY o ASC RANGE BETWEEN "
           "4 PRECEDING AND 0 PRECEDING) AS BIGINT) AS s "
           "FROM (VALUES (3, 1), (4, 3)) AS t(v, o)")
    assert {tuple(r) for r in spark.sql(sql).collect()} == {(3, 3), (4, 7)}
    assert set(con.sql(sql).fetchall()) == {(3, None), (4, 3)}
    rows_sql = sql.replace("RANGE BETWEEN", "ROWS BETWEEN").replace(
        "4 PRECEDING", "2 PRECEDING")
    assert ({tuple(r) for r in spark.sql(rows_sql).collect()}
            == set(con.sql(rows_sql).fetchall()) == {(3, 3), (4, 7)})


def test_fixture_lineitem_pk_is_not_unique():
    """The determinism premise the window grammar must NOT use: the
    synthetic lineitem fixture carries duplicate (l_orderkey,
    l_linenumber) pairs, so the declared pk is not a total order and
    window tiebreaks must order by FULL row content (window_item
    docstring). If a future fixture regeneration makes the pk unique,
    this fails and the all-columns tiebreak can be relaxed."""
    import duckdb

    con = duckdb.connect()
    dups = con.execute(
        f"SELECT count(*) FROM (SELECT l_orderkey, l_linenumber "
        f"FROM '{SF}/lineitem.parquet' GROUP BY 1, 2 HAVING count(*) > 1)"
    ).fetchone()[0]
    con.close()
    assert dups > 0


def test_rollup_empty_input_divergence_is_pinned(engines):
    """The one documented engine divergence the fuzzer found (r7): GROUP
    BY ROLLUP over an EMPTY input. The SQL standard (and DuckDB /
    PostgreSQL) emit one grand-total row for the () grouping set, like a
    global aggregate; Spark's Expand-based grouping sets produce zero
    rows. Pinned so a Spark upgrade that FIXES this fails here and the
    fuzzer's classify_divergence gets retired."""
    spark, con, _ = engines
    sql = (
        "SELECT r_name AS g0, COUNT(*) AS n FROM region "
        "WHERE r_regionkey < 0 GROUP BY ROLLUP (r_name)"
    )
    assert spark.sql(sql).count() == 0          # Spark: no rows
    assert len(con.sql(sql).fetchall()) == 1    # standard: grand total


def test_negzero_grouping_divergence_is_pinned(engines):
    """Found by the v4 fuzzer (seed 990001, #598): IEEE 0.0/negative is
    -0.0. Spark's NormalizeFloatingNumbers rule canonicalizes -0.0 to
    +0.0 in DISTINCT/GROUP BY keys over COLUMN data (plain projections
    keep the sign; constant-folded expressions too), while DuckDB
    surfaces the sign bit of its group representative. Pinned so a Spark
    release that stops normalizing (or DuckDB one that starts) fails
    here and classify_divergence gets re-examined.

    Nuance the pin also records: a pure VALUES relation does NOT show
    the divergence -- ConvertToLocalRelation evaluates the aggregate in
    the optimizer, skipping the physical normalization -- so the pin
    drives a real (createDataFrame-backed) hash aggregate."""
    import math

    spark, con, _ = engines
    df = spark.createDataFrame([(0.0, -5.0)], "a double, b double")
    plain_s = df.selectExpr("a / b AS x").collect()[0].x
    dist_s = df.selectExpr("a / b AS x").distinct().collect()[0].x
    assert math.copysign(1.0, plain_s) == -1.0  # projection keeps -0.0
    assert math.copysign(1.0, dist_s) == 1.0    # DISTINCT normalizes
    duck_base = (
        "SELECT DISTINCT a / b AS x "
        "FROM (VALUES (0.0::DOUBLE, -5.0::DOUBLE)) AS t(a, b)"
    )
    dist_d = con.sql(duck_base).fetchone()[0]
    assert math.copysign(1.0, dist_d) == -1.0   # DuckDB keeps the sign


def test_scrub_zero_sign_classifier_unit():
    """scrub_zero_sign equates multisets differing only in zero sign and
    keeps genuinely different multisets apart."""
    from collections import Counter

    from fuzz_oracle import scrub_zero_sign

    s = Counter({("a", "0.0", 3): 2, ("b", "1.5", 1): 1})
    d = Counter({("a", "-0.0", 3): 2, ("b", "1.5", 1): 1})
    assert s != d
    assert scrub_zero_sign(s) == scrub_zero_sign(d)
    d2 = Counter({("a", "-0.0", 3): 2, ("b", "1.6", 1): 1})
    assert scrub_zero_sign(s) != scrub_zero_sign(d2)


def test_duck_datetrunc_nullability_divergence_is_pinned():
    """r10 (NULL tier; fuzzer seed 990102 #88): DuckDB 1.0 mis-infers
    date_trunc as NON-NULLABLE, so `WHERE DATE_TRUNC('hour', ts) IS NOT
    NULL` over a NULL-bearing ts is constant-true (returns every row),
    and the NULL buckets carry garbage through sorts/window partitions.
    The CASE-wrap repair restores correct semantics. Pinned so a DuckDB
    upgrade that fixes the inference flags the classifier (and the
    CASE-wrapped oracles) for re-examination."""
    import duckdb

    con = duckdb.connect()
    src = "/root/repo/fixtures/sf0.01-nulls/events.parquet"
    total, with_ts = con.execute(
        f"SELECT COUNT(*), COUNT(ts) FROM '{src}'"
    ).fetchone()
    assert with_ts < total  # the tier really has NULL timestamps
    buggy = con.execute(
        f"SELECT COUNT(*) FROM '{src}' "
        "WHERE DATE_TRUNC('hour', ts) IS NOT NULL"
    ).fetchone()[0]
    assert buggy == total  # the bug: the filter is constant-true
    repaired = con.execute(
        f"SELECT COUNT(*) FROM '{src}' "
        "WHERE (CASE WHEN ts IS NULL THEN NULL "
        "       ELSE DATE_TRUNC('hour', ts) END) IS NOT NULL"
    ).fetchone()[0]
    assert repaired == with_ts  # the CASE-wrap repair is exact
