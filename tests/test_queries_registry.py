"""Registry contract tests: every query runs, has stable schema, and the
SQL-expressible ones match the DuckDB oracle at smoke scale (the driver
repeats this at sf0.01)."""

from __future__ import annotations

import collections
import datetime
import decimal
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return collections.Counter(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_every_query_has_callable_and_runs(spark, sf_dir):
    qs = entry_mod.queries()
    assert len(qs) >= 40
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_match(spark, sf_dir, duck, name):
    qs = entry_mod.queries()
    sql = entry_mod.oracle_sql()[name]
    sdf = qs[name](spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(sql)
    d_rows = rel.fetchall()
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in rel.columns
    ), name
    assert len(s_rows) == len(d_rows), name
    assert _multiset(sdf.columns, s_rows) == _multiset(rel.columns, d_rows), name


@pytest.mark.parametrize(
    "name", sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))
)
def test_rows_only_queries_are_deterministic(spark, sf_dir, name):
    """Rows-only queries have no cross-engine oracle, so their contract is
    run-to-run determinism: two fresh executions must produce the
    identical multiset (the driver's weaker check assumes this)."""
    fn = entry_mod.queries()[name]
    first = fn(spark, sf_dir)
    a = _multiset(first.columns, [tuple(r) for r in first.collect()])
    second = fn(spark, sf_dir)
    b = _multiset(second.columns, [tuple(r) for r in second.collect()])
    assert a == b, name


def test_oracle_double_casts_are_varchar_roundtripped():
    """r9 (found by the sf10 scale oracle): DuckDB's native
    CAST(DECIMAL AS DOUBLE) double-rounds once the unscaled value exceeds
    2^53 (q5's scale-8 revenue sums diverged from Spark in the last ulp
    at sf10). The registry rewrites every oracle double-cast through a
    VARCHAR round-trip, which is correctly rounded for DECIMAL/HUGEINT
    and the identity for double/integer expressions."""
    import duckdb

    from dockerized_data_pipeline_spark.plans.registry import (
        ORACLES,
        roundtrip_double_casts,
    )

    got = roundtrip_double_casts("SELECT CAST(SUM(x) AS DOUBLE) AS s FROM t")
    assert got == "SELECT CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS s FROM t"
    # nested and case-insensitive forms
    assert roundtrip_double_casts("cast(a as double) + CAST(b AS BIGINT)") == (
        "CAST(CAST(a AS VARCHAR) AS DOUBLE) + CAST(b AS BIGINT)"
    )
    # the registered q5 oracle carries the round-trip
    assert "AS VARCHAR) AS DOUBLE" in ORACLES["q5_region_nation_revenue"]

    # and the round-trip actually fixes the documented divergence
    con = duckdb.connect()
    direct, rt = con.execute(
        "SELECT CAST(d AS DOUBLE), CAST(CAST(d AS VARCHAR) AS DOUBLE) "
        "FROM (SELECT CAST('1504610447.51310000' AS DECIMAL(30,8)) AS d)"
    ).fetchone()
    con.close()
    assert rt == 1504610447.5131  # == float(Decimal(...)), Spark's value
    assert direct != rt  # duck's native cast really is the divergent one


def test_double_cast_roundtrip_exempts_float32_sources():
    """REAL -> DOUBLE must widen exactly; the VARCHAR route would parse
    the shortest-float32 string as a double (a different value).
    ``embedding`` is the schema's only REAL column, so bodies
    referencing it are exempt from the rewrite."""
    from dockerized_data_pipeline_spark.plans.registry import (
        roundtrip_double_casts,
    )

    src = "CAST(unnest(embedding) AS DOUBLE) + CAST(SUM(rev) AS DOUBLE)"
    assert roundtrip_double_casts(src) == (
        "CAST(unnest(embedding) AS DOUBLE) "
        "+ CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE)"
    )
    # r10 (ADVICE): lambda-bound REAL elements -- the inner cast body has
    # no 'embedding' token, but an enclosing funcall arglist does
    lam = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    assert roundtrip_double_casts(lam) == lam
    # nested double-cast UNDER an embedding cast stays native too
    nested = "CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE)"
    assert roundtrip_double_casts(nested) == nested
    # but a sibling cast OUTSIDE the embedding call is still rewritten
    mix = "list_count(embedding) + CAST(SUM(rev) AS DOUBLE)"
    assert roundtrip_double_casts(mix) == (
        "list_count(embedding) + CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE)"
    )


def test_double_cast_roundtrip_skips_literals_and_comments():
    """r10 (ADVICE): the outer CAST( scan must skip quoted string
    literals and -- comments -- a literal containing the text
    CAST(... AS DOUBLE) is DATA, not a cast, and must survive the
    rewrite byte-for-byte."""
    from dockerized_data_pipeline_spark.plans.registry import (
        roundtrip_double_casts,
    )

    lit = "SELECT x FROM t WHERE s = 'CAST(z AS DOUBLE)'"
    assert roundtrip_double_casts(lit) == lit
    esc = "SELECT x FROM t WHERE s = 'it''s CAST(z AS DOUBLE)'"
    assert roundtrip_double_casts(esc) == esc
    com = "SELECT CAST(a AS DOUBLE) -- CAST(z AS DOUBLE) note\nFROM t"
    assert roundtrip_double_casts(com) == (
        "SELECT CAST(CAST(a AS VARCHAR) AS DOUBLE) "
        "-- CAST(z AS DOUBLE) note\nFROM t"
    )
    # word boundary: BROADCAST( is not a cast
    bc = "SELECT BROADCAST(a AS DOUBLE) FROM t"
    assert roundtrip_double_casts(bc) == bc
    # a literal INSIDE a cast body does not derail the paren matcher
    body = "CAST(coalesce(s, ')(') AS DOUBLE)"
    assert roundtrip_double_casts(body) == (
        "CAST(CAST(coalesce(s, ')(') AS VARCHAR) AS DOUBLE)"
    )
