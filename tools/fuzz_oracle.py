"""Differential query fuzzer vs the DuckDB oracle (VERDICT r6 item 1).

The 199 hand-written oracled queries cover the corners someone thought to
write; this generates the ones nobody did -- null-ordering interactions,
outer-join + filter placement, three-valued IN/NOT IN with injected
NULLs, set-op duplicate semantics, empty-group aggregates -- as random
but WELL-TYPED queries over the fixture schemas, runs each on Spark and
DuckDB, and compares with the exact check_oracle normalization (row
count, sorted column names, order-insensitive value multiset). Any
mismatch is shrunk clause-by-clause to a minimal repro and written to
tools/fuzz_corpus/.

Portability rules baked into the grammar (documented divergences the
fuzzer must not trip over, mirroring the engine's own query rules):
  * no DECIMAL/HUGEINT output: SUM(int) is cast to BIGINT, double sums
    go through FLOOR(x*100) cents (exact same IEEE double ops per row on
    both engines), so value compare is exact -- never float-roundoff.
  * every ORDER BY carries explicit ASC/DESC + NULLS FIRST/LAST (Spark
    defaults asc=NULLS FIRST, DuckDB defaults NULLS LAST).
  * LIMIT only under an ORDER BY that is a total order of the output
    (all group columns), otherwise top-k at a tie boundary is legal
    nondeterminism, not a bug.

Grammar v4 (r8) pushes into the ANSI arithmetic / cast / temporal /
window-frame corners the v3 grammar deliberately avoided, each family
empirically verified to agree (probe catalog in tests/test_fuzz_oracle.py
pins; every EXCLUDED shape below is a documented divergence with a pinned
regression test):
  * division and MOD straddle zero but are NULLIF-guarded: Spark ANSI
    raises DIVIDE_BY_ZERO / REMAINDER_BY_ZERO where DuckDB returns NULL
    (pinned) -- `x / NULLIF(y, 0)` agrees exactly (same IEEE op).
  * overflow straddling goes through BIGINT-widened products and
    TRY_CAST back to INTEGER (NULL on overflow, both engines); bare
    INT+INT overflow errors on BOTH engines but evaluation-order
    differences would make one_error noise, so arithmetic stays widened.
  * TRY_CAST string->number only over digit-safe sources (SUBSTRING of
    non-JSON str columns): DuckDB parses '12.5'/'1e3'/'0x1A' to INT
    (rounds) where Spark ANSI try_cast yields NULL (pinned).
  * no double->INT casts (Spark truncates, DuckDB rounds half-even --
    pinned); no CONCAT() and no SPLIT_PART() (NULL-propagation differs:
    Spark propagates, DuckDB skips/returns '' -- both pinned; `||` and
    CONCAT_WS agree and are used instead); no REGEXP_REPLACE (global vs
    first-match -- pinned);
    SUBSTRING start >= 1 only (start 0 differs -- pinned); LEFT/RIGHT
    positive lengths only; SQRT only as SQRT(ABS(x)) (DuckDB errors on
    negative where Spark returns NaN -- pinned); no EXP/LN/POWER (libm
    results are not required to be correctly rounded, so cross-engine
    bits may differ); EXTRACT without DOW/EPOCH (numbering/support
    differ -- pinned); DATE_TRUNC coarse units wrapped CAST(.. AS DATE)
    (Spark returns TIMESTAMP, DuckDB DATE -- pinned); 'hour' raw.
  * window frames: ROWS frames and row-position functions (ROW_NUMBER /
    NTILE / LAG / LEAD / FIRST/LAST/NTH_VALUE) always order by a TOTAL
    order (order expr + every table's primary key, explicit direction +
    NULLS placement per key); RANGE frames use exactly one raw order
    column (peers share the frame, so ties are deterministic). IGNORE
    NULLS (incompatible placement syntax), frame EXCLUDE and DISTINCT
    window aggregates (Spark unsupported) are excluded and pinned.

Usage: python tools/fuzz_oracle.py [N] [seed] [sf_dir]
       (defaults 500, 42, /root/testdata/sf0.001)
Exit 0 when all generated queries pass (both-engines-error counts as a
recorded category, not a failure -- the grammar should keep it rare).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from check_oracle import rows_multiset

# ---------------------------------------------------------------- schema

TABLES: dict[str, dict] = {
    "region": {"key": ["r_regionkey"], "cols": {
        "r_regionkey": "int", "r_name": "str"}},
    "nation": {"key": ["n_nationkey"], "cols": {
        "n_nationkey": "int", "n_name": "str", "n_regionkey": "int"}},
    "customer": {"key": ["c_custkey"], "cols": {
        "c_custkey": "int", "c_name": "str", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "str"}},
    "supplier": {"key": ["s_suppkey"], "cols": {
        "s_suppkey": "int", "s_name": "str", "s_nationkey": "int",
        "s_acctbal": "double"}},
    "part": {"key": ["p_partkey"], "cols": {
        "p_partkey": "int", "p_name": "str", "p_brand": "str",
        "p_type": "str", "p_size": "int", "p_retailprice": "double"}},
    "orders": {"key": ["o_orderkey"], "cols": {
        "o_orderkey": "int", "o_custkey": "int", "o_orderstatus": "str",
        "o_totalprice": "double", "o_orderdate": "ts",
        "o_orderpriority": "str"}},
    "lineitem": {"key": ["l_orderkey", "l_linenumber"], "cols": {
        "l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
        "l_linenumber": "int", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double",
        "l_tax": "double", "l_returnflag": "str", "l_linestatus": "str",
        "l_shipdate": "ts"}},
    # documents.text excluded from the pool: megabyte select lists tell
    # us nothing new; LENGTH/SUBSTRING shapes are covered via str cols
    "documents": {"key": ["doc_id"], "cols": {
        "doc_id": "int", "lang": "str", "source": "str",
        "n_chars": "int"}},
    "events": {"key": ["event_id"], "cols": {
        "event_id": "int", "ts": "ts", "user_id": "int",
        "event_type": "str", "value": "double", "props": "str"}},
}

# (child, child_col, parent, parent_col); the last edge is a semantic
# (non-FK) equi-join -- customers and suppliers of the same nation
FK = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "supplier", "s_nationkey"),
]

JOIN_TYPES = ["JOIN", "JOIN", "JOIN", "LEFT JOIN", "LEFT JOIN",
              "RIGHT JOIN", "FULL JOIN"]


def sample_literals(sf_dir: str) -> dict[tuple[str, str], list]:
    """Deterministic per-column literal pool: ~8 evenly spaced distinct
    values straight from the data, so predicates are selective-but-
    matching instead of always-empty."""
    con = duckdb.connect()
    pool: dict[tuple[str, str], list] = {}
    for t, spec in TABLES.items():
        for c in spec["cols"]:
            vals = [r[0] for r in con.execute(
                f"SELECT DISTINCT {c} FROM '{sf_dir}/{t}.parquet' "
                f"ORDER BY {c} LIMIT 401"
            ).fetchall()]
            step = max(1, len(vals) // 8)
            pool[(t, c)] = vals[::step][:8] or vals
    con.close()
    return pool


def lit_sql(v, typ: str) -> str:
    if v is None:
        return "NULL"
    if typ == "str":
        return "'" + str(v).replace("'", "''") + "'"
    if typ == "ts":
        return f"TIMESTAMP '{v}'"
    if typ == "double":
        # Spark parses a bare fractional literal as DECIMAL(p,s) while
        # DuckDB parses DECIMAL too but coerces to float on fetch -- any
        # decimal reaching the OUTPUT hash-fails by the driver's own
        # normalization rule. CAST keeps every literal a true DOUBLE.
        return f"CAST({float(v)!r} AS DOUBLE)"
    return str(int(v))


# ------------------------------------------------------------ generation
#
# Exprs are {"sql": str, "deps": frozenset[alias], "type": str,
# "col": (table, col) | None} -- col remembers the dominant source column
# so literals in predicates come from that column's pool.


def _leaf(sql, deps, typ, col=None):
    return {"sql": sql, "deps": frozenset(deps), "type": typ, "col": col}


class Gen:
    def __init__(self, rng: random.Random, pool, lits):
        self.rng = rng
        self.pool = pool          # [(alias, table, col, typ)]
        self.lits = lits          # (table, col) -> [values]

    def col_of(self, typ=None):
        cands = [p for p in self.pool if typ is None or p[3] == typ]
        if not cands:
            return None
        a, t, c, ty = self.rng.choice(cands)
        return _leaf(f"{a}.{c}", {a}, ty, (t, c))

    def digit_safe_str_col(self):
        """A str column whose substrings can only be digit-runs or
        non-numeric text -- never '12.5' / '1e3' / '0x1A' shapes, which
        DuckDB TRY_CAST parses to INT (rounding) while Spark ANSI
        try_cast yields NULL (pinned divergence). events.props is JSON
        ('{"k": 1.5, ...}'), the one fixture column that produces them."""
        cands = [p for p in self.pool
                 if p[3] == "str" and (p[1], p[2]) != ("events", "props")]
        if not cands:
            return None
        a, t, c, ty = self.rng.choice(cands)
        return _leaf(f"{a}.{c}", {a}, ty, (t, c))

    def literal_for(self, e):
        if e["col"] and self.lits.get(e["col"]):
            return self.rng.choice(self.lits[e["col"]])
        return {"int": 3, "double": 10.0, "str": "a",
                "ts": "1997-01-01 00:00:00"}[e["type"]]

    # -- scalar expressions ------------------------------------------
    def expr(self, typ, depth=0):
        r = self.rng.random()
        base = self.col_of(typ)
        if base is None or depth >= 2 or r < 0.45:
            return base or self.const(typ)
        if typ == "int":
            return self.int_expr(depth)
        if typ == "str":
            return self.str_expr(depth)
        if typ == "double":
            return self.double_expr(depth)
        return self.ts_expr(depth)

    def const(self, typ):
        v = {"int": self.rng.randint(0, 20),
             "double": round(self.rng.uniform(0, 100), 2),
             "str": self.rng.choice(["a", "Z", ""]),
             "ts": "1997-06-01 00:00:00"}[typ]
        return _leaf(lit_sql(v, typ), set(), typ)

    def int_expr(self, depth):
        e = self.col_of("int") or self.const("int")
        kind = self.rng.randrange(13)
        if kind == 8:
            # ANSI string->int cast straddling: digit-run substrings cast,
            # alpha substrings yield NULL -- identically on both engines
            # as long as the source can't produce fractional/scientific/
            # hex shapes (digit_safe_str_col; divergence pinned)
            s = self.digit_safe_str_col()
            if s is not None:
                i, k = self.rng.randint(1, 9), self.rng.randint(1, 9)
                return _leaf(
                    f"TRY_CAST(SUBSTRING({s['sql']}, {i}, {k}) AS INTEGER)",
                    s["deps"], "int")
        if kind == 9:
            # overflow-straddling product, BIGINT-widened so neither
            # engine errors (int x int inputs bound the product < 2^62)
            o = self.col_of("int")
            if o is not None:
                return _leaf(
                    f"(CAST({e['sql']} AS BIGINT) * "
                    f"CAST({o['sql']} AS BIGINT))",
                    e["deps"] | o["deps"], "int")
        if kind == 10:
            # ... and TRY_CAST back down: NULL exactly when the product
            # overflows INT32 -- the cast-overflow semantics under test
            o = self.col_of("int")
            if o is not None:
                return _leaf(
                    f"TRY_CAST(CAST({e['sql']} AS BIGINT) * "
                    f"CAST({o['sql']} AS BIGINT) AS INTEGER)",
                    e["deps"] | o["deps"], "int")
        if kind == 11:
            # MOD straddling zero, NULLIF-guarded (Spark ANSI raises
            # REMAINDER_BY_ZERO where DuckDB returns NULL -- pinned)
            o = self.col_of("int")
            if o is not None:
                m = self.rng.randint(2, 5)
                return _leaf(
                    f"MOD({e['sql']}, NULLIF({o['sql']} % {m}, 0))",
                    e["deps"] | o["deps"], "int")
        if kind == 12:
            s = self.col_of("str")
            if s is not None:
                if self.rng.random() < 0.5:
                    return _leaf(f"ASCII(SUBSTRING({s['sql']}, 1, 1))",
                                 s["deps"], "int")
                needle = self.rng.choice(["a", "e", "r", "1"])
                return _leaf(f"POSITION('{needle}' IN {s['sql']})",
                             s["deps"], "int")
        if kind == 7:
            o = self.col_of("int")
            if o is not None:
                fn = self.rng.choice(["GREATEST", "LEAST"])
                return _leaf(f"{fn}({e['sql']}, {o['sql']})",
                             e["deps"] | o["deps"], "int")
        if kind == 0:
            return _leaf(f"({e['sql']} + {self.rng.randint(1, 9)})",
                         e["deps"], "int", e["col"])
        if kind == 1:
            return _leaf(f"({e['sql']} % {self.rng.randint(2, 13)})",
                         e["deps"], "int")
        if kind == 2:
            s = self.col_of("str")
            if s is not None:
                return _leaf(f"LENGTH({s['sql']})", s["deps"], "int")
        if kind == 3:
            t = self.col_of("ts")
            if t is not None:
                # no DOW (Spark 1..7 Sun-first vs DuckDB 0..6 Sun-first,
                # pinned) and no EPOCH (Spark: invalid extract field)
                part = self.rng.choice(
                    ["YEAR", "MONTH", "DAY", "QUARTER", "DOY", "WEEK",
                     "HOUR"])
                return _leaf(f"EXTRACT({part} FROM {t['sql']})",
                             t["deps"], "int")
        if kind == 4:
            lit = self.literal_for(e)
            return _leaf(f"NULLIF({e['sql']}, {lit_sql(lit, 'int')})",
                         e["deps"], "int", e["col"])
        if kind == 5 and depth < 2:
            p = self.pred(depth + 1)
            a, b = self.expr("int", 2), self.expr("int", 2)
            return _leaf(
                f"CASE WHEN {p['sql']} THEN {a['sql']} ELSE {b['sql']} END",
                p["deps"] | a["deps"] | b["deps"], "int")
        return e

    def str_expr(self, depth):
        e = self.col_of("str") or self.const("str")
        kind = self.rng.randrange(12)
        if kind == 7:
            fn = self.rng.choice(["LPAD", "RPAD"])
            n = self.rng.randint(1, 12)
            pad = self.rng.choice([".", "xy", "#"])
            return _leaf(f"{fn}({e['sql']}, {n}, '{pad}')",
                         e["deps"], "str")
        if kind == 8:
            # positive lengths only: LEFT('hello', -1) is '' on Spark,
            # 'hell' on DuckDB (pinned)
            fn = self.rng.choice(["LEFT", "RIGHT"])
            return _leaf(f"{fn}({e['sql']}, {self.rng.randint(1, 5)})",
                         e["deps"], "str")
        if kind == 9:
            if self.rng.random() < 0.5:
                return _leaf(
                    f"TRANSLATE({e['sql']}, 'AEIOUaeiou', '__________')",
                    e["deps"], "str")
            # no SPLIT_PART: DuckDB returns '' for a NULL input string
            # where Spark NULL-propagates -- found by seed 424242 #342
            # via a FULL JOIN null-extended column, pinned
            fn = self.rng.choice(["LTRIM", "RTRIM"])
            return _leaf(f"{fn}({e['sql']})", e["deps"], "str", e["col"])
        if kind == 10:
            i = self.col_of("int")
            if i is not None:
                # CHR needs the explicit INT cast: DuckDB has no
                # chr(BIGINT) overload and fixture ints read as BIGINT
                return _leaf(
                    f"CHR(CAST(65 + (ABS({i['sql']}) % 26) AS INTEGER))",
                    i["deps"], "str")
        if kind == 11:
            o = self.col_of("str")
            if o is not None:
                # CONCAT_WS skips NULLs identically on both engines
                # (CONCAT itself does not -- Spark NULL-propagates,
                # DuckDB skips; pinned, excluded)
                return _leaf(f"CONCAT_WS('-', {e['sql']}, {o['sql']})",
                             e["deps"] | o["deps"], "str")
        if kind == 0:
            fn = self.rng.choice(["UPPER", "LOWER", "TRIM", "REVERSE"])
            return _leaf(f"{fn}({e['sql']})", e["deps"], "str", e["col"])
        if kind == 1:
            k = self.rng.randint(1, 6)
            return _leaf(f"SUBSTRING({e['sql']}, 1, {k})", e["deps"], "str")
        if kind == 2:
            o = self.col_of("str") or self.const("str")
            return _leaf(f"({e['sql']} || {o['sql']})",
                         e["deps"] | o["deps"], "str")
        if kind == 3:
            lit = self.literal_for(e)
            return _leaf(f"NULLIF({e['sql']}, {lit_sql(lit, 'str')})",
                         e["deps"], "str", e["col"])
        if kind == 4 and e["col"]:
            frag = str(self.literal_for(e))[:3].replace("'", "''") or "a"
            return _leaf(f"REPLACE({e['sql']}, '{frag}', 'Q')",
                         e["deps"], "str")
        if kind == 5:
            # GREATEST/LEAST skip NULL arguments identically on both
            # engines (verified: GREATEST(1, NULL, 3) = 3 on each)
            o = self.col_of("str")
            if o is not None:
                fn = self.rng.choice(["GREATEST", "LEAST"])
                return _leaf(f"{fn}({e['sql']}, {o['sql']})",
                             e["deps"] | o["deps"], "str")
        return e

    def double_expr(self, depth):
        e = self.col_of("double") or self.const("double")
        kind = self.rng.randrange(7)
        if kind == 4:
            # guarded division straddling zero: NULLIF turns the zero
            # divisor into NULL on BOTH engines (unguarded: Spark ANSI
            # raises DIVIDE_BY_ZERO even for doubles, DuckDB returns
            # NULL -- pinned). The quotient itself is one IEEE op, so
            # the bits agree exactly.
            o = self.col_of("double")
            if o is not None:
                return _leaf(
                    f"({e['sql']} / NULLIF({o['sql']}, CAST(0 AS DOUBLE)))",
                    e["deps"] | o["deps"], "double")
        if kind == 5:
            i = self.col_of("int")
            if i is not None:
                return _leaf(
                    f"({e['sql']} / NULLIF(CAST({i['sql']} AS DOUBLE), "
                    f"CAST(0 AS DOUBLE)))",
                    e["deps"] | i["deps"], "double")
        if kind == 6:
            # IEEE-754 requires sqrt correctly rounded, so cross-engine
            # bits agree; ABS() because DuckDB errors on negatives where
            # Spark returns NaN (pinned). EXP/LN/POWER stay excluded:
            # libm transcendentals are not required to be correctly
            # rounded, so bits may legally differ.
            return _leaf(f"SQRT(ABS({e['sql']}))", e["deps"], "double")
        if kind == 0:
            return _leaf(f"({e['sql']} * {self.rng.randint(2, 9)})",
                         e["deps"], "double", e["col"])
        if kind == 1:
            o = self.col_of("double")
            if o is not None:
                return _leaf(f"({e['sql']} + {o['sql']})",
                             e["deps"] | o["deps"], "double")
        if kind == 2:
            lit = lit_sql(self.literal_for(e), "double")
            return _leaf(f"ABS({e['sql']} - {lit})",
                         e["deps"], "double", e["col"])
        return e

    def ts_expr(self, depth):
        """Timestamp expressions (v4): interval arithmetic, DATE_TRUNC
        'hour' (coarser units return TIMESTAMP on Spark, DATE on DuckDB
        -- pinned; the date-typed variants live in date_select_expr),
        GREATEST/LEAST. All probe-verified to agree, including the
        end-of-month clamp (Jan 31 + 1 MONTH = Feb 29 on both)."""
        e = self.col_of("ts")
        if e is None:
            return self.const("ts")
        kind = self.rng.randrange(6)
        if kind == 0:
            n = self.rng.randint(1, 12)
            unit = self.rng.choice(["DAY", "MONTH", "HOUR"])
            op = self.rng.choice(["+", "-"])
            return _leaf(f"({e['sql']} {op} INTERVAL {n} {unit})",
                         e["deps"], "ts", e["col"])
        if kind == 1:
            return _leaf(f"DATE_TRUNC('hour', {e['sql']})",
                         e["deps"], "ts", e["col"])
        if kind == 2:
            o = self.col_of("ts")
            if o is not None:
                fn = self.rng.choice(["GREATEST", "LEAST"])
                return _leaf(f"{fn}({e['sql']}, {o['sql']})",
                             e["deps"] | o["deps"], "ts")
        return e

    def date_select_expr(self):
        """Date-typed SELECT items (v4): the DATE_TRUNC coarse units /
        LAST_DAY / DATE_ADD family, CAST-wrapped where the two engines'
        return TYPES differ (values agree)."""
        t = self.col_of("ts")
        if t is None:
            return None
        kind = self.rng.randrange(4)
        if kind == 0:
            unit = self.rng.choice(["month", "year", "quarter", "week",
                                    "day"])
            return _leaf(f"CAST(DATE_TRUNC('{unit}', {t['sql']}) AS DATE)",
                         t["deps"], "date")
        if kind == 1:
            return _leaf(f"LAST_DAY(CAST({t['sql']} AS DATE))",
                         t["deps"], "date")
        if kind == 2:
            return _leaf(
                f"DATE_ADD(CAST({t['sql']} AS DATE), {self.rng.randint(1, 90)})",
                t["deps"], "date")
        return _leaf(f"CAST({t['sql']} AS DATE)", t["deps"], "date")

    # -- predicates (AST nodes: leaf | not | and | or) ----------------
    def pred(self, depth=0):
        r = self.rng.random()
        if depth < 2 and r < 0.30:
            op = self.rng.choice(["AND", "OR"])
            a, b = self.pred(depth + 1), self.pred(depth + 1)
            return {"op": op, "a": a, "b": b,
                    "sql": f"({a['sql']} {op} {b['sql']})",
                    "deps": a["deps"] | b["deps"]}
        if depth < 2 and r < 0.38:
            a = self.pred(depth + 1)
            return {"op": "NOT", "a": a, "sql": f"(NOT {a['sql']})",
                    "deps": a["deps"]}
        return self.leaf_pred(depth)

    def leaf_pred(self, depth):
        typ = self.rng.choice(["int", "int", "str", "str", "double", "ts"])
        e = self.expr(typ, depth + 1)
        kind = self.rng.randrange(8)
        if kind == 0:
            return {"op": "leaf",
                    "sql": f"{e['sql']} IS "
                           f"{self.rng.choice(['NULL', 'NOT NULL'])}",
                    "deps": e["deps"]}
        if kind == 1 and e["col"]:
            vals = [self.literal_for(e) for _ in range(self.rng.randint(2, 4))]
            lits = ", ".join(lit_sql(v, e["type"]) for v in vals)
            neg = self.rng.choice(["", "NOT "])
            return {"op": "leaf", "sql": f"{e['sql']} {neg}IN ({lits})",
                    "deps": e["deps"]}
        if kind == 2 and e["type"] in ("int", "double", "ts"):
            lo, hi = sorted(
                [self.literal_for(e), self.literal_for(e)],
                key=lambda v: (v is None, v),
            )
            return {"op": "leaf",
                    "sql": f"{e['sql']} BETWEEN {lit_sql(lo, e['type'])} "
                           f"AND {lit_sql(hi, e['type'])}",
                    "deps": e["deps"]}
        if kind == 3 and e["type"] == "str" and e["col"]:
            v = str(self.literal_for(e))
            frag = v[: self.rng.randint(1, max(1, min(4, len(v))))] if v else "a"
            frag = frag.replace("'", "''").replace("%", "").replace("_", "")
            pat = self.rng.choice([f"{frag}%", f"%{frag}%", f"%{frag}"])
            neg = self.rng.choice(["", "NOT "])
            return {"op": "leaf", "sql": f"{e['sql']} {neg}LIKE '{pat}'",
                    "deps": e["deps"]}
        op = self.rng.choice(["=", "<>", "<", "<=", ">", ">="])
        if self.rng.random() < 0.6:
            rhs = lit_sql(self.literal_for(e), e["type"])
            deps = e["deps"]
        else:
            o = self.expr(e["type"], depth + 1)
            rhs, deps = o["sql"], e["deps"] | o["deps"]
        return {"op": "leaf", "sql": f"{e['sql']} {op} {rhs}", "deps": deps}

    def subquery_pred(self):
        """IN / NOT IN / EXISTS with a one-table subquery -- the
        three-valued NOT IN trap and correlated EXISTS decorrelation."""
        kind = self.rng.randrange(3)
        if kind < 2:
            # (alias.intcol) [NOT] IN (SELECT intcol2 FROM t2 WHERE p)
            e = self.col_of("int")
            if e is None:
                return None
            t2 = self.rng.choice(list(TABLES))
            int_cols = [c for c, ty in TABLES[t2]["cols"].items()
                        if ty == "int"]
            c2 = self.rng.choice(int_cols)
            sub_gen = Gen(self.rng, [("s0", t2, c, ty)
                                     for c, ty in TABLES[t2]["cols"].items()],
                          self.lits)
            p = sub_gen.leaf_pred(1)
            # NULLIF injects NULLs into the subquery output: NOT IN over
            # a NULL-bearing list is the classic three-valued corner
            inner = f"s0.{c2}"
            if self.rng.random() < 0.4:
                lv = self.lits.get((t2, c2), [0])
                inner = f"NULLIF(s0.{c2}, {lit_sql(self.rng.choice(lv), 'int')})"
            neg = "NOT " if kind == 1 else ""
            sql = (f"{e['sql']} {neg}IN (SELECT {inner} FROM {t2} s0 "
                   f"WHERE {p['sql']})")
            return {"op": "leaf", "sql": sql, "deps": e["deps"]}
        # correlated EXISTS over an FK edge touching a pooled alias
        edges = []
        for a, t, _c, _ty in self.pool:
            for (ch, cc, pa, pc) in FK:
                if t == pa:
                    edges.append((a, pc, ch, cc))
                if t == ch:
                    edges.append((a, cc, pa, pc))
        if not edges:
            return None
        a, acol, t2, c2 = self.rng.choice(edges)
        neg = self.rng.choice(["", "NOT "])
        sql = f"{neg}EXISTS (SELECT 1 FROM {t2} s0 WHERE s0.{c2} = {a}.{acol})"
        return {"op": "leaf", "sql": sql, "deps": frozenset({a})}

    def subquery_scalar(self):
        """Correlated scalar subquery over an FK edge: per-row COUNT or
        MAX of the related table -- the decorrelation shape."""
        edges = []
        for a, t, _c, _ty in self.pool:
            for (ch, cc, pa, pc) in FK:
                if t == pa:
                    edges.append((a, pc, ch, cc))
                if t == ch:
                    edges.append((a, cc, pa, pc))
        if not edges:
            return None
        a, acol, t2, c2 = self.rng.choice(edges)
        if self.rng.random() < 0.6:
            inner = "CAST(COUNT(*) AS BIGINT)"
        else:
            int_cols = [c for c, ty in TABLES[t2]["cols"].items()
                        if ty == "int"]
            inner = f"MAX(s0.{self.rng.choice(int_cols)})"
        sql = (f"(SELECT {inner} FROM {t2} s0 "
               f"WHERE s0.{c2} = {a}.{acol})")
        return _leaf(sql, {a}, "int")

    # -- aggregates ----------------------------------------------------
    def agg(self, idx):
        kind = self.rng.randrange(8)
        alias = f"agg{idx}"
        if kind == 7:
            # BOOL_AND/BOOL_OR (probe-verified identical incl. NULL and
            # empty-group handling)
            p = self.leaf_pred(1)
            fn = self.rng.choice(["BOOL_AND", "BOOL_OR"])
            return {"sql": f"{fn}({p['sql']})", "deps": p["deps"],
                    "alias": alias, "type": "bool"}
        if kind == 6:
            # aggregate FILTER clause (SQL:2003; both engines support)
            p = self.leaf_pred(1)
            return {"sql": f"COUNT(*) FILTER (WHERE {p['sql']})",
                    "deps": p["deps"], "alias": alias, "type": "int"}
        if kind == 0:
            return {"sql": "COUNT(*)", "deps": frozenset(), "alias": alias,
                    "type": "int"}
        if kind == 1:
            e = self.expr(self.rng.choice(["int", "str"]), 1)
            d = "DISTINCT " if self.rng.random() < 0.4 else ""
            return {"sql": f"COUNT({d}{e['sql']})", "deps": e["deps"],
                    "alias": alias, "type": "int"}
        if kind == 2:
            e = self.expr("int", 1)
            return {"sql": f"CAST(SUM({e['sql']}) AS BIGINT)",
                    "deps": e["deps"], "alias": alias, "type": "int"}
        if kind == 3:
            e = self.col_of("double")
            if e is not None:
                # exact cents: FLOOR(x*100) is the same IEEE double op on
                # both engines; the BIGINT sum is then exact
                return {"sql": f"CAST(SUM(CAST(FLOOR({e['sql']} * 100) "
                               f"AS BIGINT)) AS BIGINT)",
                        "deps": e["deps"], "alias": alias, "type": "int"}
        fn = self.rng.choice(["MIN", "MAX"])
        e = self.expr(self.rng.choice(["int", "str", "double", "ts"]), 1)
        return {"sql": f"{fn}({e['sql']})", "deps": e["deps"],
                "alias": alias, "type": e["type"]}

    # -- window items (v4) ---------------------------------------------
    def _rows_frame(self):
        """A syntactically valid ROWS/RANGE-int frame: lo never after hi
        by construction."""
        r = self.rng.randrange(4)
        n, m = self.rng.randint(1, 5), self.rng.randint(1, 5)
        if r == 0:
            lo = self.rng.choice(["UNBOUNDED PRECEDING", f"{n} PRECEDING",
                                  "CURRENT ROW"])
            hi = self.rng.choice(["CURRENT ROW", f"{m} FOLLOWING",
                                  "UNBOUNDED FOLLOWING"])
            return f"BETWEEN {lo} AND {hi}"
        if r == 1:
            lo, hi = max(n, m), min(n, m)
            return f"BETWEEN {lo} PRECEDING AND {hi} PRECEDING"
        if r == 2:
            lo, hi = min(n, m), max(n, m)
            return f"BETWEEN {lo} FOLLOWING AND {hi} FOLLOWING"
        return f"BETWEEN {self.rng.randint(1, 5)} PRECEDING AND CURRENT ROW"

    def _win_agg(self, over):
        """A window aggregate whose output type is portable: SUM/COUNT
        cast BIGINT (DuckDB window SUM(int) is HUGEINT), AVG over
        exactly-representable ints, MIN/MAX pass through."""
        r = self.rng.randrange(5)
        if r == 0:
            i = self.col_of("int")
            if i is not None:
                return _leaf(f"CAST(SUM({i['sql']}) OVER {over} AS BIGINT)",
                             i["deps"], "int")
        if r == 1:
            c = self.col_of()
            if c is not None:
                return _leaf(f"CAST(COUNT({c['sql']}) OVER {over} AS BIGINT)",
                             c["deps"], "int")
        if r == 2:
            i = self.col_of("int")
            if i is not None:
                return _leaf(
                    f"AVG(CAST({i['sql']} AS DOUBLE)) OVER {over}",
                    i["deps"], "double")
        if r == 3:
            c = self.col_of(self.rng.choice(["int", "str", "ts"]))
            if c is not None:
                fn = self.rng.choice(["MIN", "MAX"])
                return _leaf(f"{fn}({c['sql']}) OVER {over}",
                             c["deps"], c["type"])
        return _leaf(f"CAST(COUNT(*) OVER {over} AS BIGINT)",
                     frozenset(), "int")

    def window_item(self, tables):
        """One portable window expression (v4 family): ranking / NTILE /
        CUME_DIST / PERCENT_RANK, LAG/LEAD with defaults, FIRST/LAST/
        NTH_VALUE with explicit ROWS frames, and frame aggregates over
        ROWS, numeric-RANGE, and interval-RANGE frames.

        Determinism contract: row-position functions (ROW_NUMBER, NTILE,
        LAG/LEAD, *_VALUE, ROWS-frame aggs) order by the chosen order
        expr PLUS every column of every table, explicit direction and
        NULLS placement per key. ALL columns, not the declared pks: the
        synthetic fixtures carry duplicate (l_orderkey, l_linenumber)
        pairs, so a pk tiebreak is NOT total (found by this fuzzer's own
        seed-8801 run as a false LEAD mismatch) -- full row content is;
        rows that still tie are identical, and swapping identical rows
        leaves the output MULTISET invariant even for position functions.
        RANGE frames use exactly ONE raw order column: peers share the
        frame, so equal order values get equal results. Excluded and
        pinned: IGNORE NULLS (engine-incompatible placement), frame
        EXCLUDE and DISTINCT window aggregates (Spark unsupported), and
        RANGE '0 PRECEDING' bounds (DuckDB excludes the current row and
        its peers where Spark/the standard treat it as CURRENT ROW --
        found by seed 8801, pinned)."""
        p = self.group_expr()
        all_deps = frozenset({alias for _t, alias in tables})
        pk = [f"{alias}.{c} ASC NULLS LAST"
              for t, alias in tables for c in TABLES[t]["cols"]]
        o = self.col_of()
        if o is None:
            return None
        dirn = (f"{self.rng.choice(['ASC', 'DESC'])} NULLS "
                f"{self.rng.choice(['FIRST', 'LAST'])}")
        total = ", ".join([f"{o['sql']} {dirn}"] + pk)
        fam = self.rng.randrange(6)
        if fam == 0:  # ranking family
            tie_aware = self.rng.random() < 0.5
            if tie_aware:
                fn = self.rng.choice(
                    ["RANK()", "DENSE_RANK()", "PERCENT_RANK()",
                     "CUME_DIST()"])
                order = f"{o['sql']} {dirn}"
            else:
                fn = self.rng.choice(
                    ["ROW_NUMBER()", f"NTILE({self.rng.randint(2, 7)})"])
                order = total
            typ = ("double" if fn in ("PERCENT_RANK()", "CUME_DIST()")
                   else "int")
            return _leaf(
                f"{fn} OVER (PARTITION BY {p['sql']} ORDER BY {order})",
                all_deps | p["deps"] | o["deps"], typ)
        if fam == 1:  # LAG/LEAD, optionally with offset + default
            v = self.col_of("int")
            if v is None:
                return None
            fn = self.rng.choice(["LAG", "LEAD"])
            arg = v["sql"]
            if self.rng.random() < 0.6:
                arg += f", {self.rng.randint(1, 3)}"
                if self.rng.random() < 0.5:
                    arg += f", {self.rng.randint(-1, 1)}"
            return _leaf(
                f"{fn}({arg}) OVER (PARTITION BY {p['sql']} "
                f"ORDER BY {total})",
                all_deps | p["deps"] | o["deps"] | v["deps"], "int")
        if fam == 2:  # FIRST/LAST/NTH_VALUE with explicit ROWS frame
            v = self.col_of(self.rng.choice(["int", "str"]))
            if v is None:
                return None
            fn = self.rng.choice(["FIRST_VALUE", "LAST_VALUE"])
            call = f"{fn}({v['sql']})"
            if self.rng.random() < 0.3:
                call = f"NTH_VALUE({v['sql']}, {self.rng.randint(1, 3)})"
            frame = self._rows_frame()
            return _leaf(
                f"{call} OVER (PARTITION BY {p['sql']} ORDER BY {total} "
                f"ROWS {frame})",
                all_deps | p["deps"] | o["deps"] | v["deps"], v["type"])
        if fam == 3:  # agg over ROWS frame (total order)
            over = (f"(PARTITION BY {p['sql']} ORDER BY {total} "
                    f"ROWS {self._rows_frame()})")
            e = self._win_agg(over)
            return _leaf(e["sql"], all_deps | p["deps"] | e["deps"],
                         e["type"])
        if fam == 4:  # agg over numeric RANGE frame: ONE raw int order col
            oi = self.col_of("int")
            if oi is None:
                return None
            d = self.rng.choice(["ASC", "DESC"])
            # offsets >= 1 only: 'RANGE ... AND 0 PRECEDING' diverges
            # (DuckDB excludes current row + peers; Spark = CURRENT ROW)
            frame = self.rng.choice([
                f"BETWEEN {self.rng.randint(1, 20)} PRECEDING AND CURRENT ROW",
                "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
                f"BETWEEN {self.rng.randint(2, 20)} PRECEDING AND "
                f"1 PRECEDING",
            ])
            over = (f"(PARTITION BY {p['sql']} ORDER BY {oi['sql']} {d} "
                    f"RANGE {frame})")
            e = self._win_agg(over)
            return _leaf(e["sql"],
                         all_deps | p["deps"] | oi["deps"] | e["deps"],
                         e["type"])
        # fam == 5: agg over interval RANGE frame on a ts order col
        ot = self.col_of("ts")
        if ot is None:
            return None
        n = self.rng.randint(1, 48)
        unit = self.rng.choice(["HOUR", "DAY", "MINUTE"])
        over = (f"(PARTITION BY {p['sql']} ORDER BY {ot['sql']} ASC "
                f"RANGE BETWEEN INTERVAL {n} {unit} PRECEDING "
                f"AND CURRENT ROW)")
        e = self._win_agg(over)
        return _leaf(e["sql"], all_deps | p["deps"] | ot["deps"] | e["deps"],
                     e["type"])

    def group_expr(self):
        kind = self.rng.randrange(5)
        if kind == 0:
            e = self.col_of("str")
            if e is not None:
                return e
        if kind == 1:
            e = self.col_of("int")
            if e is not None:
                return _leaf(f"({e['sql']} % {self.rng.randint(2, 7)})",
                             e["deps"], "int")
        if kind == 2:
            t = self.col_of("ts")
            if t is not None:
                return _leaf(f"EXTRACT(YEAR FROM {t['sql']})",
                             t["deps"], "int")
        if kind == 3:
            e = self.col_of(self.rng.choice(["int", "str"]))
            if e is not None and e["col"]:
                lit = self.literal_for(e)
                return _leaf(
                    f"NULLIF({e['sql']}, {lit_sql(lit, e['type'])})",
                    e["deps"], e["type"], e["col"])
        return self.col_of(self.rng.choice(["int", "str"])) or self.const("int")


def gen_query(rng: random.Random, lits) -> dict:
    """One random well-typed query AST."""
    # FROM clause: random FK walk, 1-3 tables
    n_tables = rng.choice([1, 1, 2, 2, 2, 3, 3])
    base = rng.choice(list(TABLES))
    tables = [(base, "t0")]
    joins = []
    for i in range(1, n_tables):
        # allow_revisit: a quarter of walks may re-join an already-present
        # table under a fresh alias -- self-join shapes (orders o1 ->
        # customer -> orders o2) have their own planner paths
        allow_revisit = rng.random() < 0.25
        edges = []
        for (ch, cc, pa, pc) in FK:
            for (tname, alias) in tables:
                if tname == ch and (
                    allow_revisit or pa not in [t for t, _ in tables]
                ):
                    edges.append((alias, cc, pa, pc))
                if tname == pa and (
                    allow_revisit or ch not in [t for t, _ in tables]
                ):
                    edges.append((alias, pc, ch, cc))
        if not edges:
            break
        a, acol, t2, c2 = rng.choice(edges)
        alias = f"t{i}"
        joins.append({
            "type": rng.choice(JOIN_TYPES), "table": t2, "alias": alias,
            "on": f"{a}.{acol} = {alias}.{c2}",
            "deps": frozenset({a, alias}),
        })
        tables.append((t2, alias))

    pool = [(alias, t, c, ty)
            for (t, alias) in tables
            for c, ty in TABLES[t]["cols"].items()]
    g = Gen(rng, pool, lits)

    q = {"tables": tables, "joins": joins, "where": None, "group": [],
         "aggs": [], "select": [], "distinct": False, "having": None,
         "order_limit": None, "setop": None, "where2": None,
         "rollup": False}

    if rng.random() < 0.75:
        q["where"] = g.pred()
        if rng.random() < 0.15:
            sp = g.subquery_pred()
            if sp is not None:
                w = q["where"]
                q["where"] = {"op": "AND", "a": w, "b": sp,
                              "sql": f"({w['sql']} AND {sp['sql']})",
                              "deps": w["deps"] | sp["deps"]}

    mode = rng.random()
    if mode < 0.55:  # aggregate mode
        q["group"] = [g.group_expr() for _ in range(rng.randint(0, 3))]
        q["aggs"] = [g.agg(i) for i in range(rng.randint(1, 3))]
        # ROLLUP/CUBE subtotal rows mix grouping-NULLs with data-NULLs
        # from NULLIF group exprs -- a grouping-sets corner both engines
        # must agree on. No ORDER BY+LIMIT here: subtotal keys can
        # collide with data keys, making top-k at the boundary legal
        # nondeterminism.
        if len(q["group"]) >= 2 and rng.random() < 0.25:
            q["rollup"] = rng.choice(["rollup", "cube"])
        int_aggs = [a for a in q["aggs"] if a["type"] == "int"]
        if q["group"] and int_aggs and rng.random() < 0.3:
            a = rng.choice(int_aggs)
            q["having"] = {"op": "leaf",
                           "sql": f"{a['sql']} > {rng.randint(0, 5)}",
                           "deps": a["deps"]}
        if q["group"] and not q["rollup"] and rng.random() < 0.35:
            dirs = [
                f"{i + 1} {rng.choice(['ASC', 'DESC'])} "
                f"NULLS {rng.choice(['FIRST', 'LAST'])}"
                for i in range(len(q["group"]))
            ]
            q["order_limit"] = {"by": dirs, "limit": rng.randint(1, 20)}
    elif mode < 0.85:  # plain projection mode
        q["select"] = [
            {"expr": g.expr(rng.choice(["int", "str", "double", "ts"])),
             "alias": f"c{i}"}
            for i in range(rng.randint(1, 4))
        ]
        if rng.random() < 0.15:
            # correlated scalar subquery in the SELECT list over an FK
            # edge (decorrelation path): COUNT of children per row
            sub = g.subquery_scalar()
            if sub is not None:
                q["select"].append(
                    {"expr": sub, "alias": f"c{len(q['select'])}"})
        if rng.random() < 0.20:
            # date-typed item (v4): DATE_TRUNC/LAST_DAY/DATE_ADD family
            d = g.date_select_expr()
            if d is not None:
                q["select"].append(
                    {"expr": d, "alias": f"c{len(q['select'])}"})
        q["distinct"] = rng.random() < 0.45
        if rng.random() < 0.45 and not q["distinct"]:
            # window item (v4 family: ranking/NTILE/LAG/LEAD/*_VALUE/
            # frame aggregates over ROWS + numeric/interval RANGE)
            w = g.window_item(tables)
            if w is not None:
                q["select"].append(
                    {"expr": w, "alias": f"c{len(q['select'])}"})
    else:  # set-op mode: one select list, two WHEREs
        q["select"] = [
            {"expr": g.col_of() or g.const("int"), "alias": f"c{i}"}
            for i in range(rng.randint(1, 3))
        ]
        q["setop"] = rng.choice(
            ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
             "EXCEPT", "EXCEPT ALL"])
        q["where"] = g.pred()
        q["where2"] = g.pred()
    return q


# -------------------------------------------------------------- render

def render(q: dict) -> str:
    def one_select(where):
        if q["aggs"] or q["group"]:
            items = [f"{e['sql']} AS g{i}" for i, e in enumerate(q["group"])]
            items += [f"{a['sql']} AS {a['alias']}" for a in q["aggs"]]
        else:
            items = [f"{s['expr']['sql']} AS {s['alias']}"
                     for s in q["select"]]
        head = "SELECT DISTINCT" if q["distinct"] else "SELECT"
        sql = [head, ", ".join(items), f"FROM {q['tables'][0][0]} t0"]
        for j in q["joins"]:
            sql.append(f"{j['type']} {j['table']} {j['alias']} ON {j['on']}")
        if where is not None:
            sql.append(f"WHERE {where['sql']}")
        if q["group"]:
            exprs = ", ".join(e["sql"] for e in q["group"])
            if q.get("rollup"):
                kw = "CUBE" if q["rollup"] == "cube" else "ROLLUP"
                sql.append(f"GROUP BY {kw} ({exprs})")
            else:
                sql.append(f"GROUP BY {exprs}")
        if q["having"] is not None:
            sql.append(f"HAVING {q['having']['sql']}")
        return " ".join(sql[0:1] + sql[1:])

    if q["setop"]:
        body = (f"{one_select(q['where'])} {q['setop']} "
                f"{one_select(q['where2'])}")
    else:
        body = one_select(q["where"])
    if q["order_limit"]:
        body += (" ORDER BY " + ", ".join(q["order_limit"]["by"])
                 + f" LIMIT {q['order_limit']['limit']}")
    return body


# ------------------------------------------------------------- running

ROW_CAP = 400_000  # safety valve; sf0.001/0.01 stay far below


def run_spark(spark, sql: str):
    df = spark.sql(sql)
    rows = [tuple(r) for r in df.limit(ROW_CAP + 1).collect()]
    return [c.lower() for c in df.columns], rows


def run_duck(con, sql: str):
    rel = con.sql(sql)
    cols = [c.lower() for c in rel.columns]
    types = [str(t).upper() for t in rel.types]
    float_cols = frozenset(
        i for i, t in enumerate(types) if "DECIMAL" in t or "HUGEINT" in t)
    return cols, rel.fetchall(), float_cols


def compare(spark, con, sql: str):
    """None when both engines agree (or both error); otherwise a dict
    describing the mismatch -- the shrinker preserves the mismatch KIND."""
    s_err = d_err = None
    try:
        s_cols, s_rows = run_spark(spark, sql)
    except Exception as e:
        s_err = f"{type(e).__name__}: {str(e)[:300]}"
    try:
        d_cols, d_rows, d_float = run_duck(con, sql)
    except Exception as e:
        d_err = f"{type(e).__name__}: {str(e)[:300]}"
    if s_err and d_err:
        return {"kind": "both_error", "spark": s_err, "duck": d_err}
    if s_err or d_err:
        return {"kind": "one_error", "spark": s_err, "duck": d_err}
    if len(s_rows) > ROW_CAP or len(d_rows) > ROW_CAP:
        return {"kind": "too_big"}
    if len(s_rows) != len(d_rows):
        return {"kind": "rowcount", "spark": len(s_rows), "duck": len(d_rows)}
    s_ms, s_sorted = rows_multiset(s_cols, s_rows)
    d_ms, d_sorted = rows_multiset(d_cols, d_rows, duck=True,
                                   float_cols=d_float)
    if s_sorted != d_sorted:
        return {"kind": "cols", "spark": s_sorted, "duck": d_sorted}
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:3]
        only_d = list((d_ms - s_ms).items())[:3]
        # full multisets ride along under private keys (stripped before
        # any record is persisted) so classify_divergence can scrub the
        # EXACT observed results instead of re-executing both engines
        return {"kind": "values", "spark_only": only_s, "duck_only": only_d,
                "_s_ms": s_ms, "_d_ms": d_ms}
    return None


MISMATCH_KINDS = {"one_error", "rowcount", "cols", "values"}


def scrub_zero_sign(ms):
    """Multiset with every floating \"-0.0\" value rewritten to \"0.0\"
    (values are norm_value strings at this point)."""
    import collections

    out = collections.Counter()
    for tup, n in ms.items():
        out[tuple("0.0" if v == "-0.0" else v for v in tup)] += n
    return out


def _negzero_direction_ok(s_ms, d_ms) -> bool:
    """True iff the symmetric difference between the two multisets is
    explained ONLY by Spark carrying \"+0.0\" where DuckDB carries
    \"-0.0\" (the NormalizeFloatingNumbers direction). Pairs each
    Spark-only tuple with a DuckDB-only tuple of identical scrubbed form
    and requires every differing element to be spark==\"0.0\" vs
    duck==\"-0.0\"; a -0.0 appearing on the SPARK side of a difference
    is a new bug, not the documented divergence."""
    import collections

    only_s = s_ms - d_ms
    only_d = d_ms - s_ms
    by_scrub = collections.defaultdict(list)
    for tup, n in only_d.items():
        key = tuple("0.0" if v == "-0.0" else v for v in tup)
        by_scrub[key].extend([tup] * n)
    for tup, n in only_s.items():
        key = tuple("0.0" if v == "-0.0" else v for v in tup)
        pool = by_scrub.get(key, [])

        def compatible(mate):
            return all(
                sv == dv or (sv == "0.0" and dv == "-0.0")
                for sv, dv in zip(tup, mate)
            )

        for _ in range(n):
            mate_i = next(
                (i for i, mt in enumerate(pool) if compatible(mt)), None
            )
            if mate_i is None:
                return False
            pool.pop(mate_i)
    return not any(pool for pool in by_scrub.values())


def classify_divergence(spark, con, q, m):
    """Return a tag when a mismatch is a KNOWN, documented engine
    divergence rather than a bug; None otherwise.

    rollup_empty_input: GROUP BY ROLLUP/CUBE/GROUPING SETS over an EMPTY input
    -- the SQL standard (and DuckDB/PostgreSQL) emit one grand-total row
    for the () grouping set, exactly like a global aggregate; Spark's
    Expand-based implementation produces zero rows (verified on Spark
    4.1: `SELECT x, COUNT(*) FROM t WHERE false GROUP BY ROLLUP(x)` ->
    [] while the plain global `SELECT COUNT(*)` correctly returns 0).
    Pinned by tests/test_fuzz_oracle.py so a Spark version that fixes it
    gets flagged for re-classification.

    negzero_grouping (found by seed 990001 #598): IEEE 0.0/negative is
    -0.0; Spark's NormalizeFloatingNumbers rule canonicalizes -0.0 to
    +0.0 in DISTINCT / GROUP BY / join keys (COLUMN data only --
    constant-folded expressions keep the sign), while DuckDB groups
    -0.0 == 0.0 but surfaces the sign bit of its representative. The
    two engines' results are identical up to the sign of floating zero;
    classified when scrubbing \"-0.0\" -> \"0.0\" in BOTH multisets
    makes them equal (and they differ before scrubbing), AND the
    divergence has the documented DIRECTION (ADVICE r8: an origin-blind
    scrub-equal check would silently file a genuinely new zero-sign bug
    as documented): the query must have a dedup surface where
    NormalizeFloatingNumbers fires (DISTINCT / GROUP BY / set op), and
    every element-wise difference between paired tuples must be Spark
    \"0.0\" vs DuckDB \"-0.0\" -- never the reverse. Pinned by
    tests/test_fuzz_oracle.py::test_negzero_grouping_divergence_is_pinned."""
    import copy

    if m["kind"] == "values" and "_s_ms" in m:
        s_ms, d_ms = m["_s_ms"], m["_d_ms"]
        if (
            s_ms != d_ms
            and scrub_zero_sign(s_ms) == scrub_zero_sign(d_ms)
            and (q.get("group") or q.get("distinct") or q.get("setop"))
            and _negzero_direction_ok(s_ms, d_ms)
        ):
            return "negzero_grouping"

    if q.get("rollup") and m["kind"] in ("rowcount", "values"):
        plain = copy.deepcopy(q)
        plain["rollup"] = False
        plain_sql = render(plain)
        if compare(spark, con, plain_sql) is None:
            try:
                _, s_rows = run_spark(spark, plain_sql)
            except Exception:
                return None
            if not s_rows:
                return "rollup_empty_input"

    # duck_datetrunc_nullability (r10; found by the NULL tier and
    # independently re-found by this fuzzer at seed 990102 #88): DuckDB
    # 1.0 mis-infers date_trunc as NON-NULLABLE, so NULL-sensitive
    # contexts over DATE_TRUNC(nullable_ts) return wrong results --
    # e.g. WHERE DATE_TRUNC('hour', ts) IS NOT NULL is constant-true
    # (SWEEP_NULLS_r10/CLASSIFICATION.md D2). Classified by REPAIR:
    # CASE-wrapping every DATE_TRUNC in the duck SQL restores correct
    # nullability; if spark(original) == duck(wrapped), the divergence
    # is exactly this bug (direction-safe: any other difference keeps
    # the mismatch un-classified).
    sql = render(q)
    if m["kind"] in ("rowcount", "values") and "DATE_TRUNC" in sql.upper():
        import re as _re

        wrapped = _re.sub(
            r"DATE_TRUNC\('(\w+)',\s*([A-Za-z0-9_.]+)\)",
            r"CASE WHEN \2 IS NULL THEN NULL ELSE DATE_TRUNC('\1', \2) END",
            sql,
        )
        if wrapped != sql:
            try:
                s_cols, s_rows = run_spark(spark, sql)
                d_cols, d_rows, d_float = run_duck(con, wrapped)
            except Exception:
                return None
            if len(s_rows) == len(d_rows) and len(s_rows) <= ROW_CAP:
                s_ms, s_sorted = rows_multiset(s_cols, s_rows)
                d_ms, d_sorted = rows_multiset(
                    d_cols, d_rows, duck=True, float_cols=d_float
                )
                if s_sorted == d_sorted and s_ms == d_ms:
                    return "duck_datetrunc_nullability"
    return None


# ------------------------------------------------------------- shrinker

def _used_aliases(q) -> set[str]:
    used = set()
    for e in q["group"]:
        used |= e["deps"]
    for a in q["aggs"]:
        used |= a["deps"]
    for s in q["select"]:
        used |= s["expr"]["deps"]
    for w in (q["where"], q["where2"], q["having"]):
        if w is not None:
            used |= w["deps"]
    return used


def _variants(q):
    """Yield reduced copies of q, most aggressive first."""
    import copy

    def cp():
        return copy.deepcopy(q)

    if q["setop"]:
        for side in ("where", "where2"):
            v = cp()
            v["setop"] = None
            v["where"] = v[side]
            v["where2"] = None
            yield v
        v = cp()
        if v["setop"] != "UNION ALL":
            v["setop"] = "UNION ALL"
            yield v
    if q["order_limit"]:
        v = cp(); v["order_limit"] = None; yield v
    if q.get("rollup"):
        v = cp(); v["rollup"] = False; yield v
    if q["having"]:
        v = cp(); v["having"] = None; yield v
    for w_key in ("where", "where2"):
        w = q[w_key]
        if w is None:
            continue
        v = cp(); v[w_key] = None; yield v
        if w["op"] in ("AND", "OR"):
            for branch in ("a", "b"):
                v = cp(); v[w_key] = w[branch]; yield v
        if w["op"] == "NOT":
            v = cp(); v[w_key] = w["a"]; yield v
    if q["distinct"]:
        v = cp(); v["distinct"] = False; yield v
    if len(q["aggs"]) > 1 or (q["aggs"] and (q["group"] or q["select"])):
        for i in range(len(q["aggs"])):
            v = cp(); del v["aggs"][i]
            if v["aggs"] or v["group"] or v["select"]:
                yield v
    for i in range(len(q["group"])):
        v = cp(); del v["group"][i]
        v["order_limit"] = None
        if v["aggs"] or v["group"]:
            yield v
    if len(q["select"]) > 1:
        for i in range(len(q["select"])):
            v = cp(); del v["select"][i]; yield v
    # joins: drop the last join when its alias is referenced nowhere
    if q["joins"]:
        last = q["joins"][-1]
        v = cp(); v["joins"] = v["joins"][:-1]
        if last["alias"] not in _used_aliases(v) and not any(
                last["alias"] in j["deps"] for j in v["joins"]):
            yield v
        for i, j in enumerate(q["joins"]):
            if j["type"] != "JOIN":
                v = cp(); v["joins"][i]["type"] = "JOIN"; yield v


def shrink(spark, con, q, kind):
    """Greedy fixpoint: apply the first reduction that preserves the
    mismatch kind, repeat."""
    changed = True
    rounds = 0
    while changed and rounds < 40:
        changed = False
        rounds += 1
        for v in _variants(q):
            m = compare(spark, con, render(v))
            if m is not None and m["kind"] == kind:
                q = v
                changed = True
                break
    return q


# ----------------------------------------------------------------- main

def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

    from dockerized_data_pipeline_spark.catalog import load_table
    from dockerized_data_pipeline_spark.session import get_session

    spark = get_session("fuzz-oracle")
    # analysis errors are expected fuzz outcomes, captured in Python --
    # keep the JVM from dumping a full stack per generated type error
    spark.sparkContext.setLogLevel("OFF")
    con = duckdb.connect()
    # NULL-bearing tiers need single-threaded duck: its parallel window
    # operator returns nondeterministically wrong results when keys
    # contain NULLs (r10, SWEEP_NULLS_r10/CLASSIFICATION.md)
    duck_threads = os.environ.get("SPARK_GRAFT_DUCK_THREADS")
    if duck_threads:
        con.execute(f"SET threads={int(duck_threads)}")
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    lits = sample_literals(sf_dir)
    corpus_dir = os.path.join(REPO, "tools", "fuzz_corpus")
    os.makedirs(corpus_dir, exist_ok=True)
    corpus_path = os.path.join(corpus_dir, f"corpus_seed{seed}_n{n}.jsonl")

    counts = {"pass": 0, "both_error": 0, "too_big": 0,
              "documented_divergence": 0, "mismatch": 0}
    fails = []
    t0 = time.time()
    with open(corpus_path, "w") as corpus:
        for i in range(n):
            rng = random.Random((seed << 20) + i)
            try:
                q = gen_query(rng, lits)
                sql = render(q)
            except Exception:
                traceback.print_exc(limit=2)
                continue
            m = compare(spark, con, sql)
            rec = {"i": i, "sql": sql}
            if m is None:
                counts["pass"] += 1
                rec["result"] = "pass"
            elif m["kind"] in ("both_error", "too_big"):
                counts[m["kind"]] += 1
                rec["result"] = m["kind"]
                rec["detail"] = {k: v for k, v in m.items() if k != "kind"}
            elif (tag := classify_divergence(spark, con, q, m)) is not None:
                counts["documented_divergence"] += 1
                rec["result"] = "documented_divergence"
                rec["tag"] = tag
                rec["detail"] = {k: v for k, v in m.items()
                                 if not k.startswith("_")}
                print(f"documented divergence #{i} [{tag}]: {sql}")
            else:
                counts["mismatch"] += 1
                small = shrink(spark, con, q, m["kind"])
                small_sql = render(small)
                small_m = compare(spark, con, small_sql)
                rec["result"] = "MISMATCH"
                rec["kind"] = m["kind"]
                rec["detail"] = {k: v for k, v in m.items()
                                 if not k.startswith("_")}
                rec["minimal"] = small_sql
                rec["minimal_detail"] = (
                    {k: v for k, v in small_m.items() if not k.startswith("_")}
                    if isinstance(small_m, dict) else small_m)
                fails.append(rec)
                path = os.path.join(corpus_dir, f"fail_seed{seed}_{i}.json")
                with open(path, "w") as f:
                    json.dump(rec, f, indent=2, default=str)
                print(f"MISMATCH #{i} [{m['kind']}]\n  full:    {sql}\n"
                      f"  minimal: {small_sql}\n  detail:  {small_m}")
            corpus.write(json.dumps(rec, default=str) + "\n")
            if (i + 1) % 50 == 0:
                print(f"... {i + 1}/{n} "
                      f"(pass {counts['pass']}, mism {counts['mismatch']}, "
                      f"both_err {counts['both_error']}) "
                      f"[{time.time() - t0:.0f}s]")

    summary = {"n": n, "seed": seed, "sf_dir": sf_dir, **counts,
               "elapsed_sec": round(time.time() - t0, 1)}
    with open(os.path.join(corpus_dir, f"summary_seed{seed}_n{n}.json"),
              "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 1 if counts["mismatch"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
