"""Portable HyperLogLog as a DataFrame composition: approximate distinct
counts whose EVERY step is exactly replayable cross-engine (unlike the
engine-internal HLL++ binary behind ``approx_count_distinct``, which is
rows-only by necessity).

Construction (Flajolet et al., the PCSA/LogLog register family):

- register index = ``pmod(xxhash64(key), m)`` (m = 256, p = 8);
- rank rho = 1 + trailing zeros of the REMAINING hash bits
  (``shiftrightunsigned(hash, 8)``) -- the classic geometric observable.
  Trailing zeros come from a 6-step binary search over power-of-two
  moduli: pure integer ops, no libm, identical in any engine. The
  all-zero remainder (probability 2^-56) deterministically ranks 64.
- registers = ``groupBy(key-space, idx).agg(max(rho))``;
- estimate = alpha_m * m^2 / sum_j 2^(-M_j). The harmonic denominator is
  computed EXACTLY: each term 2^(64-M_j) is looked up from a literal
  table of the 64 powers of two as DECIMAL(38,0), summed exactly
  (associative -- partition-order invariant), and only the final
  already-exact denominator is cast to double for the one division.
  No float sum ever happens, so the estimate is bit-identical on any
  partitioning and replays in DuckDB (the xxhash64 register assignment
  via plans/duckhash.py's XXH64-in-SQL).

The standard linear-counting small-range correction (E <= 2.5m and some
register empty -> E = m*ln(m/V)) IS applied, portably: ln(m/V) has only
m possible values, so the whole correction is a 256-entry literal table
precomputed in Python at CODEGEN time -- both engines look up identical
bigint literals and no libm call ever runs at query time. The one
deviation from Flajolet's paper: no 32-bit truncation (we keep Spark's
full 64-bit hash, so the large-range correction is unnecessary). Error
is the asymptotic 1.04/sqrt(m) ~ 6.5% at m=256.

Scale shape: ONE scan -> map-side-combined groupBy onto at most
m * n_groups register rows regardless of input size -- the fixed-memory
distinct for 100 TB. Registers are mergeable by max (tested), so daily
register tables roll up without touching raw data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 8
M = 1 << P
ALPHA = 0.7213 / (1 + 1.079 / M)
# alpha_m * m^2 * 2^64: the numerator of the scaled harmonic-mean
# estimate, one double literal shared verbatim with the DuckDB oracle
NUM = ALPHA * M * M * 2.0**64
# 2^(64-rho) for rho in 1..64 as decimal strings (index rho, 1-based)
POW2 = [str(1 << (64 - r)) for r in range(1, 65)]
# linear-counting estimates m*ln(m/V) for V (zero-register count) in
# 1..m, precomputed so the correction needs no runtime libm (index V)
import math as _math

LINEAR = [str(round(M * _math.log(M / v))) for v in range(1, M + 1)]
# small-range threshold from the HLL paper: apply linear counting when
# the raw estimate is below 2.5m and at least one register is empty
LC_THRESHOLD = 2.5 * M


def rho(v: Column) -> Column:
    """1 + trailing zeros of non-negative ``v``; v == 0 -> 64. Binary
    search over power-of-two moduli -- six integer CASE steps, no loops,
    no libm, portable to any engine."""
    r = F.lit(1)
    x = v
    for k in (32, 16, 8, 4, 2, 1):
        c = x % F.lit(1 << k) == 0
        r = r + F.when(c, F.lit(k)).otherwise(F.lit(0))
        x = F.when(c, F.shiftrightunsigned(x, k)).otherwise(x)
    return r


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """(group_cols..., reg_idx, reg): the max-rank register table, at most
    ``M`` rows per group (absent registers mean rank 0). Mergeable: union
    two register tables and re-aggregate max.

    NULL keys are excluded -- COUNT(DISTINCT) semantics, and required for
    the cross-engine oracle: Spark's xxhash64(NULL) returns the seed (a
    real register hit) while a NULL-propagating SQL replay drops the row;
    filtering makes both engines agree AND keeps the estimate comparable
    to the exact countDistinct it validates against."""
    h = F.xxhash64(F.col(key_col))
    df = df.filter(F.col(key_col).isNotNull())
    return (
        df.select(
            *group_cols,
            F.pmod(h, F.lit(M)).alias("reg_idx"),
            rho(F.shiftrightunsigned(h, P)).alias("rho"),
        )
        .groupBy(*group_cols, "reg_idx")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group_cols..., approx_distinct, n_zero_regs) from a register
    table. Exact-decimal harmonic sum; one double division at the end."""
    pow_table = F.array(*[F.lit(s) for s in POW2])
    term = F.element_at(pow_table, F.col("reg")).cast("decimal(38,0)")
    two64 = F.lit("18446744073709551616").cast("decimal(38,0)")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(term).alias("sum_term"),
        F.count("*").alias("n_regs"),
    )
    denom = (
        F.col("sum_term")
        + (F.lit(M) - F.col("n_regs")).cast("decimal(38,0)") * two64
    )
    raw = F.lit(NUM) / denom.cast("double")
    n_zero = F.lit(M) - F.col("n_regs")
    lc_table = F.array(*[F.lit(s) for s in LINEAR])
    est = F.when(
        (n_zero > 0) & (raw <= F.lit(LC_THRESHOLD)),
        F.element_at(lc_table, n_zero.cast("int")).cast("bigint"),
    ).otherwise(F.floor(raw).cast("bigint"))
    return agg.select(
        *group_cols,
        est.alias("approx_distinct"),
        n_zero.cast("bigint").alias("n_zero_regs"),
    )


def hll_distinct(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """One-call build + estimate."""
    return hll_estimate(hll_registers(df, key_col, group_cols), group_cols)
