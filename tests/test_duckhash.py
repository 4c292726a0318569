"""plans/duckhash.py: the generated-SQL XXH64 must reproduce Spark's
xxhash64 BIT-FOR-BIT for every variant the near-dup oracles compose --
hashLong, chained multi-arg folds, hashInt seed mixes, and hashBytes
over ASCII strings of every length class below the 32-byte stripe
threshold. Any Spark upgrade that changes hash internals (or a DuckDB
change to UBIGINT semantics) fails here before it corrupts an oracle."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dockerized_data_pipeline_spark.plans import duckhash as DH

LONGS = [0, 1, -1, 42, 2**63 - 1, -(2**63), 123456789, -987654321,
         2**40 + 7, 0x9E3779B185EBCA87 - 2**64]
STRS = ["", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
        "abcdefgh", "abcdefghi", "abcdefghijk", "x" * 12, "x" * 15,
        "y" * 16, "y" * 20, "z" * 23, "z" * 24, "q" * 28, "q" * 31,
        "hello world 123", "Brand#42", "1-URGENT", "a b", "  ", "A!~",
        "spark line column order"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_hash_long_matches_spark(spark, duck):
    df = spark.createDataFrame([(v,) for v in LONGS], "v long")
    expected = {r.v: r.h for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    s = DH.Steps("x")
    out = DH.xxh64_long(s, DH.u64_of_i64("v"), DH.SEED42)
    duck.execute("CREATE OR REPLACE TABLE tl(v BIGINT)")
    duck.executemany("INSERT INTO tl VALUES (?)", [(v,) for v in LONGS])
    sql = f"SELECT v, {DH.i64_of_u64(out)} AS h FROM ({s.nest('SELECT v FROM tl')})"
    got = {r[0]: r[1] for r in duck.execute(sql).fetchall()}
    assert got == expected


def test_hash_long_pair_fold_matches_spark(spark, duck):
    pairs = [(a, b) for a in LONGS[:5] for b in LONGS[5:]]
    df = spark.createDataFrame(pairs, "a long, b long")
    expected = {
        (r.a, r.b): r.h
        for r in df.select("a", "b", F.xxhash64("a", "b").alias("h")).collect()
    }
    s = DH.Steps("y")
    h1 = DH.xxh64_long(s, DH.u64_of_i64("a"), DH.SEED42)
    h2 = DH.xxh64_long(s, DH.u64_of_i64("b"), h1)
    duck.execute("CREATE OR REPLACE TABLE tp(a BIGINT, b BIGINT)")
    duck.executemany("INSERT INTO tp VALUES (?, ?)", pairs)
    sql = (f"SELECT a, b, {DH.i64_of_u64(h2)} AS h "
           f"FROM ({s.nest('SELECT a, b FROM tp')})")
    got = {(r[0], r[1]): r[2] for r in duck.execute(sql).fetchall()}
    assert got == expected


def test_hash_ascii_string_matches_spark(spark, duck):
    df = spark.createDataFrame([(v,) for v in STRS], "v string")
    expected = {r.v: r.h for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    s = DH.Steps("z")
    out = DH.xxh64_ascii(s, "v", DH.SEED42)
    duck.execute("CREATE OR REPLACE TABLE ts(v VARCHAR)")
    duck.executemany("INSERT INTO ts VALUES (?)", [(v,) for v in STRS])
    sql = f"SELECT v, {DH.i64_of_u64(out)} AS h FROM ({s.nest('SELECT v FROM ts')})"
    got = {r[0]: r[1] for r in duck.execute(sql).fetchall()}
    assert got == expected


def test_long_then_int_seed_mix_matches_spark(spark, duck):
    """The signature shape: xxhash64(h, lit(i)) = hashInt(i, hashLong(h, 42))
    -- lit(i) is an IntegerType, a DIFFERENT tail than a long."""
    rows = [(h, i) for h in LONGS[:6] for i in range(16)]
    df = spark.createDataFrame(rows, "h long, i int")
    expected = {
        (r.h, r.i): r.o
        for r in df.select("h", "i", F.xxhash64("h", "i").alias("o")).collect()
    }
    s = DH.Steps("w")
    a1 = DH.xxh64_long(s, DH.u64_of_i64("h"), DH.SEED42)
    mixed = DH.xxh64_int_batch(s, [str(i) for i in range(16)], a1)
    duck.execute("CREATE OR REPLACE TABLE ti(h BIGINT)")
    duck.executemany("INSERT INTO ti VALUES (?)", [(h,) for h in LONGS[:6]])
    sels = ", ".join(
        f"{DH.i64_of_u64(m)} AS o{i}" for i, m in enumerate(mixed)
    )
    sql = f"SELECT h, {sels} FROM ({s.nest('SELECT h FROM ti')})"
    got = {}
    for row in duck.execute(sql).fetchall():
        for i in range(16):
            got[(row[0], i)] = row[1 + i]
    assert got == expected


def test_batch_long_matches_scalar(duck):
    """xxh64_long_batch is the lockstep variant the banding oracle uses;
    it must equal the scalar chain on every lane."""
    vals = [3, 99, 2**50, 7]
    s1 = DH.Steps("a")
    outs = DH.xxh64_long_batch(
        s1, [DH.u64_of_i64(str(v)) for v in vals], [DH.SEED42] * len(vals)
    )
    sels = ", ".join(f"{DH.i64_of_u64(o)} AS o{i}" for i, o in enumerate(outs))
    batch = duck.execute(
        f"SELECT {sels} FROM ({s1.nest('SELECT 1 AS dummy')})"
    ).fetchone()
    for i, v in enumerate(vals):
        s2 = DH.Steps("b")
        out = DH.xxh64_long(s2, DH.u64_of_i64(str(v)), DH.SEED42)
        scalar = duck.execute(
            f"SELECT {DH.i64_of_u64(out)} FROM ({s2.nest('SELECT 1 AS dummy')})"
        ).fetchone()[0]
        assert batch[i] == scalar
