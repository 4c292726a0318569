"""Property tests for the round-2 operators against independent reference
implementations: linear interpolation vs numpy-style rational arithmetic,
SymSpell candidate generation vs brute-force Levenshtein, CDC application
vs a dict replay."""

from __future__ import annotations

import datetime as dt
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dockerized_data_pipeline_spark.operators.fuzzyjoin import symspell_pairs
from dockerized_data_pipeline_spark.operators.merge import apply_cdc
from dockerized_data_pipeline_spark.operators.timeseries import (
    dense_join,
    interpolate_linear,
)

BASE = dt.datetime(2024, 1, 1)
_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def sparse_series(draw):
    hours = draw(st.lists(st.integers(0, 40), unique=True, min_size=2, max_size=8))
    return sorted((h, draw(st.integers(1, 10_000))) for h in hours)


@given(series=sparse_series())
@_SETTINGS
def test_interpolation_matches_rational_reference(spark, series):
    rows = [("k", BASE + dt.timedelta(hours=h), v) for h, v in series]
    obs = spark.createDataFrame(rows, "key string, bucket timestamp, v bigint")
    dense = dense_join(obs, ["key"], unit="hour")
    got = {
        int((r.bucket - BASE).total_seconds() // 3600): r.interp
        for r in interpolate_linear(dense, ["key"], "v", unit="hour").collect()
    }
    # reference: exact rational interpolation, truncated at scale 1000
    known = dict(series)
    hs = sorted(known)
    for h in range(hs[0], hs[-1] + 1):
        if h in known:
            expect = known[h] * 1000
        else:
            h0 = max(x for x in hs if x < h)
            h1 = min(x for x in hs if x > h)
            num = known[h0] * (h1 - h) + known[h1] * (h - h0)
            expect = num * 1000 // (h1 - h0)
        assert got[h] == expect, (h, got[h], expect)


@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        unique=True,
        min_size=2,
        max_size=8,
    )
)
@_SETTINGS
def test_symspell_equals_bruteforce_levenshtein(spark, names):
    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = {
        (r.id_a, r.id_b) for r in symspell_pairs(df, "id", "name").collect()
    }
    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if lev(a, b) <= 1
    }
    assert got == want


@st.composite
def cdc_case(draw):
    target = {
        k: draw(st.integers(0, 9)) for k in draw(st.sets(st.integers(0, 6)))
    }
    feed = [
        (
            draw(st.sampled_from(["I", "U", "D"])),
            draw(st.integers(0, 6)),
            draw(st.integers(0, 9)),
            seq,
        )
        for seq in range(draw(st.integers(0, 6)))
    ]
    return target, feed


@given(case=cdc_case())
@_SETTINGS
def test_apply_cdc_equals_dict_replay(spark, case):
    target, feed = case
    tdf = spark.createDataFrame(
        list(target.items()) or [(None, None)], "k long, v long"
    ).filter("k IS NOT NULL")
    fdf = spark.createDataFrame(
        feed or [("I", None, None, None)], "op string, k long, v long, seq long"
    ).filter("k IS NOT NULL")
    got = {r.k: r.v for r in apply_cdc(tdf, fdf, ["k"], order_by=["seq"]).collect()}

    # reference: keep only each key's newest change, then apply
    expect = dict(target)
    newest: dict[int, tuple[str, int]] = {}
    for op, k, v, _seq in feed:  # feed is already seq-ordered
        newest[k] = (op, v)
    for k, (op, v) in newest.items():
        if op == "D":
            expect.pop(k, None)
        else:
            expect[k] = v
    assert got == expect


@st.composite
def diff_case(draw):
    keys = st.integers(0, 8)
    vals = st.one_of(st.none(), st.integers(0, 3))
    left = {k: draw(vals) for k in draw(st.sets(keys))}
    right = {k: draw(vals) for k in draw(st.sets(keys))}
    return left, right


@given(case=diff_case())
@_SETTINGS
def test_table_diff_equals_dict_diff(spark, case):
    from dockerized_data_pipeline_spark.operators.tablediff import table_diff

    left, right = case

    def df_of(d):
        return spark.createDataFrame(
            list(d.items()) or [(None, None)], "k long, v long"
        ).filter("k IS NOT NULL")

    got = {
        r.k: r.change_type
        for r in table_diff(df_of(left), df_of(right), ["k"]).collect()
    }
    expect = {}
    for k in set(left) | set(right):
        if k not in left:
            expect[k] = "added"
        elif k not in right:
            expect[k] = "removed"
        elif left[k] == right[k]:  # None == None is 'same' (null-safe)
            expect[k] = "same"
        else:
            expect[k] = "changed"
    assert got == expect


@given(
    shared=st.lists(st.sampled_from("pqrs"), min_size=8, max_size=12),
    pre=st.lists(st.sampled_from("abcd"), min_size=0, max_size=5),
    post=st.lists(st.sampled_from("wxyz"), min_size=0, max_size=5),
)
@_SETTINGS
def test_winnow_guarantee_property(spark, shared, pre, post):
    """Any two docs sharing a token run of length >= k + w - 1 = 8 must
    share a winnow fingerprint, wherever the run sits in each doc."""
    from dockerized_data_pipeline_spark.functions.text import winnow_fingerprints

    doc1 = " ".join(pre + shared + post)
    doc2 = " ".join(list("mnop") + shared)
    df = spark.createDataFrame([(1, doc1), (2, doc2)], "doc_id long, text string")
    rows = {
        r.doc_id: set(r.fp)
        for r in winnow_fingerprints(df, "text", k=5, w=4, out_col="fp")
        .select("doc_id", "fp")
        .collect()
    }
    assert rows[1] & rows[2]


# --- int8 scalar quantization: bounded codes, bounded reconstruction error


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100.0,
                max_value=100.0,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=4,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
@_SETTINGS
def test_int8_quantize_code_and_error_bounds(spark, vecs):
    """For ANY vector: |code| <= 127 (the int8 envelope), and the
    reconstruction error per element is <= scale/2 by construction of
    floor(x/s + 0.5), so err_num <= dim * (s/2)^2."""
    from dockerized_data_pipeline_spark.functions.vectors import (
        int8_quantize_stats,
    )

    rows = [(i, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in int8_quantize_stats(emb).collect()}
    for i, v in rows:
        r = out[i]
        assert r.n_dims == len(v)
        assert 0 <= r.max_abs_code <= 127
        s = max(max(abs(x) for x in v) / 127.0, 1e-30)
        den = sum(x * x for x in v)
        if den > 0:
            bound_ppm = len(v) * (s / 2) ** 2 / den * 1e6
            # +1 for the floor; tiny float slack on the analytic bound
            assert r.err_ppm <= bound_ppm * (1 + 1e-9) + 1, (v, r.err_ppm, bound_ppm)
        else:
            assert r.max_abs_code == 0


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-8.0, max_value=8.0, allow_nan=False, allow_infinity=False),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=6,
        unique_by=lambda v: tuple(v),
    ),
    parts=st.integers(1, 5),
)
@_SETTINGS
def test_logreg_partition_invariance_property(spark, vecs, parts):
    """Decimal gradient sums: the fitted weights are EXACTLY equal under
    any repartitioning, for arbitrary feature data."""
    from dockerized_data_pipeline_spark.operators.logreg import logreg_fit

    rows = [
        (i, v[0], v[1], 1 if v[2] + v[3] > 0 else 0) for i, v in enumerate(vecs)
    ]
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y int")
    w1 = logreg_fit(df.repartition(1), ["x1", "x2"], "y", iterations=4)
    wp = logreg_fit(df.repartition(parts), ["x1", "x2"], "y", iterations=4)
    assert w1 == wp


# --- codec parsers: arbitrary bytes must raise cleanly or parse -- never
# hang or corrupt (the PGM header-scan hang was a real found bug)


@given(blob=st.binary(min_size=0, max_size=400))
@_SETTINGS
def test_codec_parsers_never_hang_on_fuzz(spark, blob):
    import struct

    from dockerized_data_pipeline_spark.functions.multimodal import (
        _pgm_parse,
        _png_parse,
        _y4m_parse,
    )

    for parser in (_pgm_parse, _y4m_parse, _png_parse):
        try:
            parser(blob)
        except (ValueError, struct.error, OverflowError, MemoryError):
            pass  # clean rejection is the contract


@given(blob=st.binary(min_size=0, max_size=200))
@_SETTINGS
def test_codec_parsers_reject_prefixed_garbage(spark, blob):
    """Valid magic + garbage body: still a clean ValueError, never a hang."""
    import struct

    from dockerized_data_pipeline_spark.functions.multimodal import (
        _PNG_SIG,
        _pgm_parse,
        _png_parse,
        _y4m_parse,
    )

    for parser, magic in (
        (_pgm_parse, b"P5\n"),
        (_y4m_parse, b"YUV4MPEG2 "),
        (_png_parse, _PNG_SIG),
    ):
        try:
            parser(magic + blob)
        except (ValueError, struct.error, OverflowError, MemoryError):
            pass


@given(
    keys=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=60),
    split=st.integers(2, 5),
)
@_SETTINGS
def test_hll_merge_equals_single_pass_property(spark, keys, split):
    """For ANY key multiset and ANY partition of it into shards, the
    max-merged shard registers must reproduce the single-pass registers
    and estimate BIT-EXACTLY (commutative max + exact decimal harmonic
    sum). This is the property that makes incremental / sharded HLL
    maintenance sound at scale."""
    from pyspark.sql import functions as F

    from dockerized_data_pipeline_spark.operators import hll

    df = spark.createDataFrame([("g", k) for k in keys], "g string, k long")
    full = {tuple(r) for r in hll.hll_distinct(df, "k", ["g"]).collect()}
    shards = [
        hll.hll_registers(
            df.filter(F.pmod(F.col("k"), F.lit(split)) == i), "k", ["g"]
        )
        for i in range(split)
    ]
    merged_regs = shards[0]
    for s in shards[1:]:
        merged_regs = merged_regs.unionByName(s)
    merged_regs = merged_regs.groupBy("g", "reg_idx").agg(
        F.max("reg").alias("reg")
    )
    merged = {tuple(r) for r in hll.hll_estimate(merged_regs, ["g"]).collect()}
    assert merged == full


@given(
    prices=st.lists(
        st.floats(0.01, 5000.0, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=80,
    )
)
@_SETTINGS
def test_histogram_rank_bracket_property(spark, prices):
    """For ANY price list, each histogram-quantile edge must bracket the
    rank-ceil(n*q/100) order statistic: fewer than rank values strictly
    below the bin, at least rank values below its upper edge -- checked
    against a pure-Python recount."""
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(p,) for p in prices], "l_extendedprice double")
    counts = df.groupBy(
        F.floor(F.col("l_extendedprice") / F.lit(64.0)).cast("bigint").alias("bin")
    ).agg(F.count("*").alias("c"))
    cum = counts.withColumn(
        "cum", F.sum("c").over(Window.orderBy("bin"))
    )
    n = len(prices)
    edges = cum.select(
        *[
            (F.min(F.when(F.col("cum") * 100 >= n * q, F.col("bin"))) * 64)
            .cast("bigint")
            .alias(f"p{q}")
            for q in (25, 50, 75, 99)
        ]
    ).collect()[0]
    for q in (25, 50, 75, 99):
        rank = math.ceil(n * q / 100)
        edge = edges[f"p{q}"]
        below = sum(1 for p in prices if p < edge)
        upto = sum(1 for p in prices if p < edge + 64)
        assert below < rank <= upto, (q, edge, below, rank, upto)
