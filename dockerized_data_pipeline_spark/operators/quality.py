"""Data-quality checks as observe() metrics (SURVEY section 2.9 T8).

The reference documents a quality-check task ("validates data integrity and
completeness", README.md:107-108) without implementing it. Here the checks
are ``DataFrame.observe`` aggregates: they piggyback on a write/scan the job
already performs -- zero extra passes over the data, which is the only
acceptable cost at 100 TB.

Invariants mirrored from the reference's schema/upsert guarantees
(dags/stock_data_pipeline.py:25-39):
  * key columns non-null (PK columns NOT NULL)
  * high >= low per row (OHLC sanity)
  * volume >= 0
  * row count > 0 (completeness)
Key uniqueness (the PK invariant) needs a shuffle, so it is a separate
explicit check rather than an observe metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    observation: Observation,
    key_cols: list[str],
    high_col: str | None = None,
    low_col: str | None = None,
    nonneg_cols: list[str] | None = None,
) -> DataFrame:
    metrics = [F.count(F.lit(1)).alias("rows_total")]
    for k in key_cols:
        metrics.append(
            F.count(F.when(F.col(k).isNull(), 1)).alias(f"null_{k}")
        )
    if high_col and low_col:
        metrics.append(
            F.count(
                F.when(F.col(high_col) < F.col(low_col), 1)
            ).alias("high_lt_low")
        )
    for c in nonneg_cols or []:
        metrics.append(F.count(F.when(F.col(c) < 0, 1)).alias(f"neg_{c}"))
    return df.observe(observation, *metrics)


def quality_violations(observation: Observation) -> dict[str, int]:
    """Metrics that indicate violations (everything but rows_total; plus
    rows_total==0 reported as 'empty')."""
    got = observation.get
    out = {k: v for k, v in got.items() if k != "rows_total" and v}
    if got.get("rows_total", 0) == 0:
        out["empty"] = 1
    return out


def duplicate_key_count(df: DataFrame, key_cols: list[str]) -> int:
    """PK-uniqueness check (post-MERGE invariant): number of keys with >1 row."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition metrics (quality filters for
    training-corpus prep): type-token ratio, top-unigram fraction and
    top-bigram fraction, all as FLOOR(ppm) integers.

    Scale shape: explode tokens/bigrams then aggregate BY DOCUMENT -- the
    shuffle key is the (unique) document id, so partial aggregation absorbs
    the per-token rows map-side and skew is impossible. No O(doc_len^2)
    per-row array scans: a pathological 1 GB document costs its own rows,
    not a quadratic blowup inside one task.
    """
    from ..catalog import spread_input

    # r11: spread a single-split input so the tokenize + explode pipelines
    # parallelize (no-op on multi-split inputs; catalog.spread_input)
    docs = spread_input(docs.select(id_col, text_col))
    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
    uni = (
        toks.select(id_col, F.explode("toks").alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("top_c"),
            F.count("*").alias("n_distinct"),
        )
    )
    bigrams = toks.select(
        id_col,
        F.expr(
            "zip_with(slice(toks, 1, size(toks) - 1),"
            "         slice(toks, 2, size(toks) - 1),"
            "         (a, b) -> concat(a, ' ', b))"
        ).alias("bgs"),
    )
    bg = (
        bigrams.select(id_col, F.explode("bgs").alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_bg"))
    )

    def ppm(num, den):
        # identical double operands floor identically on every engine
        return F.floor(num * F.lit(1000000.0) / den).cast("bigint")

    return (
        uni.join(bg, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            ppm(F.col("n_distinct"), F.col("n_tokens")).alias("distinct_token_ppm"),
            ppm(F.col("top_c"), F.col("n_tokens")).alias("top_token_ppm"),
            ppm(
                F.coalesce(F.col("top_bg"), F.lit(0)),
                F.greatest(F.col("n_tokens") - 1, F.lit(1)),
            ).alias("top_bigram_ppm"),
        )
    )
