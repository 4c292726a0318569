"""Distributed n-gram language model: train bigram/unigram counts over a
corpus, score documents with stupid backoff (Brants et al. 2007, "Large
Language Models in Machine Translation") — the CCNet-style perplexity
filter (Wenzek et al. 2020) that buckets a crawl into head/middle/tail by
LM score, re-expressed Spark-first.

The reference pipeline has no LM stage (its analytics stop at SQL
aggregates, README.md:202-226); this belongs to the mandated
training-data-pipeline extensions (SURVEY.md section 2.11: text analysis /
quality scoring at corpus scale).

Exact-arithmetic posture (house rule, see plans/llm.py module doc): the
per-transition score is the INVERSE probability in ppm — an exact integer
— rather than a log-probability, because libm log ulps differ across
engines while integer ratios never do:

  seen bigram   : inv_ppm = (1_000_000 * c(w1)) div c(w1 w2)
  backoff (w2)  : inv_ppm = (2_500_000 * N) div c(w2)      # 1/0.4 = 2.5
  OOV           : inv_ppm =  2_500_000 * N                 # c(w2) := 1

The per-document mean of inv_ppm (AMIP — arithmetic-mean inverse
probability) is the perplexity analog: for a uniform model it equals
vocabulary-size * 1e6, and it ranks documents identically to true
stupid-backoff perplexity whenever transition tiers agree. Every number
from the count tables to the final AMIP is a BIGINT — bit-identical on
any engine.

Scale notes (100 TB): both count tables are map-side-combinable hash
aggregates over the exploded token stream — the shuffle carries partial
counts keyed by vocabulary, not tokens. Scoring is a stream x model join
keyed on vocabulary terms: the model side is unique-keyed (no row
explosion), Zipf-hot probe keys are plain hash-join probe skew that AQE
skew-split absorbs, and when the pruned model fits (vocab, not corpus,
bounded) it broadcasts. At trillion-token scale lift the 1e6/2.5e6
scalers to DECIMAL(38,0) before the multiply; at the fixture scales the
products stay far below 2^63 and ANSI mode would throw loudly if not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Stupid backoff alpha = 0.4 (Brants et al. 2007): inverse-probability
# scoring multiplies by 1/alpha = 2.5, kept exact as 2_500_000 ppm.
_PPM = 1_000_000
_BACKOFF_INV_PPM = 2_500_000


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, t: array<string>) — whitespace tokenization, engine-portable."""
    return docs.select(F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("t"))


def transitions(toks: DataFrame) -> DataFrame:
    """Explode each doc's adjacent-token transitions to (id, w1, w2).

    Docs with < 2 tokens contribute no rows. Gotcha this guards:
    ``sequence(1, 0)`` DESCENDS in Spark (yields [1, 0], not []), so a
    short doc must be short-circuited to an empty array explicitly rather
    than relying on an empty sequence range — the same trap
    x8_epoch_upsample hit."""
    pair = F.when(
        F.size("t") >= 2,
        F.transform(
            F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
            lambda x, i: F.struct(
                x.alias("w1"), F.element_at(F.col("t"), i + 2).alias("w2")
            ),
        ),
    ).otherwise(F.array())
    return (
        toks.select("id", F.explode(pair).alias("p"))
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_lm(train_docs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables of the LM: (uni(w, c), bi(w1, w2, c12), total(n)).

    Two hash aggregates (partial aggregation makes the shuffle carry
    vocabulary-keyed partials); ``total`` is a 1-row frame meant to be
    broadcast into the scoring join."""
    toks = tokens(train_docs)
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    bi = transitions(toks).groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    total = uni.agg(F.sum("c").cast("bigint").alias("n"))
    return uni, bi, total


def stupid_backoff_inverse(
    score_docs: DataFrame, uni: DataFrame, bi: DataFrame, total: DataFrame
) -> DataFrame:
    """Per-transition exact inverse-probability: (id, w1, w2, tier, inv_ppm).

    tier: 0 = bigram hit, 1 = unigram backoff, 2 = OOV. The three joins
    are all stream-x-model on vocabulary keys; the model sides are
    unique-keyed so no row amplification is possible."""
    tr = transitions(tokens(score_docs))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    j = (
        tr.join(bi, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(total))
    )
    inv = (
        F.when(
            F.col("c12").isNotNull(),
            F.expr(f"({_PPM} * c1) div c12"),
        )
        .when(
            F.col("c2").isNotNull(),
            F.expr(f"({_BACKOFF_INV_PPM} * n) div c2"),
        )
        .otherwise(F.lit(_BACKOFF_INV_PPM) * F.col("n"))
    )
    tier = (
        F.when(F.col("c12").isNotNull(), F.lit(0))
        .when(F.col("c2").isNotNull(), F.lit(1))
        .otherwise(F.lit(2))
    )
    return j.select(
        "id",
        "w1",
        "w2",
        tier.cast("int").alias("tier"),
        inv.cast("bigint").alias("inv_ppm"),
    )


def score_documents(
    score_docs: DataFrame, uni: DataFrame, bi: DataFrame, total: DataFrame
) -> DataFrame:
    """Per-document stupid-backoff summary, all-BIGINT:

    doc_id, n_trans, n_backoff (tier>=1), n_oov (tier=2),
    sum_inv_ppm, amip (= sum_inv_ppm div n_trans — the perplexity
    analog), max_inv_ppm (the most surprising transition).

    Documents with zero transitions (< 2 tokens) are absent, exactly as
    in the SQL oracle (inner aggregation over existing transitions)."""
    scored = stupid_backoff_inverse(score_docs, uni, bi, total)
    return (
        scored.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count("*").alias("n_trans"),
            F.sum((F.col("tier") >= 1).cast("bigint")).alias("n_backoff"),
            F.sum((F.col("tier") == 2).cast("bigint")).alias("n_oov"),
            F.sum("inv_ppm").alias("sum_inv_ppm"),
            F.max("inv_ppm").alias("max_inv_ppm"),
        )
        .withColumn("amip", F.expr("sum_inv_ppm div n_trans"))
        .select(
            "doc_id", "n_trans", "n_backoff", "n_oov",
            "sum_inv_ppm", "amip", "max_inv_ppm",
        )
    )


# ---------------------------------------------------------------------------
# Trigram stupid backoff: the full recursive chain of Brants 2007 --
# trigram hit -> bigram backoff (x 1/alpha) -> unigram backoff (x 1/alpha^2)
# -> OOV. 1/0.4 = 2.5 and 1/0.16 = 6.25 are exact in ppm, so the whole
# chain stays integer arithmetic.
# ---------------------------------------------------------------------------

_BACKOFF2_INV_PPM = 6_250_000  # 1/alpha^2 = 6.25, exact


def trigram_transitions(toks: DataFrame) -> DataFrame:
    """(id, w1, w2, w3) for every length-3 window; docs with < 3 tokens
    contribute no rows (guarded empty array, same trap as bigrams)."""
    tri = F.when(
        F.size("t") >= 3,
        F.transform(
            F.slice("t", 1, F.greatest(F.size("t") - 2, F.lit(0))),
            lambda x, i: F.struct(
                x.alias("w1"),
                F.element_at(F.col("t"), i + 2).alias("w2"),
                F.element_at(F.col("t"), i + 3).alias("w3"),
            ),
        ),
    ).otherwise(F.array())
    return (
        toks.select("id", F.explode(tri).alias("p"))
        .select("id", "p.w1", "p.w2", "p.w3")
    )


def train_trigram_lm(
    train_docs: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(uni, bi, tri, total) count tables. Three vocabulary-keyed hash
    aggregates over the exploded streams; a trigram's prefix bigram is
    always present in ``bi`` by construction, which the scoring chain
    relies on (the trigram-hit numerator is the CONTEXT count c(w1 w2))."""
    uni, bi, total = train_bigram_lm(train_docs)
    tri = (
        trigram_transitions(tokens(train_docs))
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c123"))
    )
    return uni, bi, tri, total


def score_documents_trigram(
    score_docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    tri: DataFrame,
    total: DataFrame,
) -> DataFrame:
    """Per-document trigram stupid-backoff summary (positions 3..n; docs
    with < 3 tokens are absent). Per transition, exact-integer inverse
    probability:

      tri hit       : (1e6     * c(w1 w2)) div c(w1 w2 w3)
      bigram backoff: (2.5e6   * c(w2))    div c(w2 w3)
      unigram       : (6.25e6  * N)        div c(w3)
      OOV           : 6.25e6 * N

    Model sides are unique-keyed vocab tables (broadcast when they fit);
    the transition stream is never shuffled on itself."""
    tr = trigram_transitions(tokens(score_docs))
    ctx = bi.select(
        F.col("w1"), F.col("w2"), F.col("c12").alias("c12ctx")
    )
    b23 = bi.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c12").alias("c23")
    )
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2ctx"))
    u3 = uni.select(F.col("w").alias("w3"), F.col("c").alias("c3"))
    j = (
        tr.join(tri, ["w1", "w2", "w3"], "left")
        .join(ctx, ["w1", "w2"], "left")
        .join(b23, ["w2", "w3"], "left")
        .join(u2, "w2", "left")
        .join(u3, "w3", "left")
        .crossJoin(F.broadcast(total))
    )
    inv = (
        F.when(
            F.col("c123").isNotNull(),
            F.expr(f"({_PPM} * c12ctx) div c123"),
        )
        .when(
            F.col("c23").isNotNull(),
            F.expr(f"({_BACKOFF_INV_PPM} * c2ctx) div c23"),
        )
        .when(
            F.col("c3").isNotNull(),
            F.expr(f"({_BACKOFF2_INV_PPM} * n) div c3"),
        )
        .otherwise(F.lit(_BACKOFF2_INV_PPM) * F.col("n"))
    )
    tier = (
        F.when(F.col("c123").isNotNull(), F.lit(0))
        .when(F.col("c23").isNotNull(), F.lit(1))
        .when(F.col("c3").isNotNull(), F.lit(2))
        .otherwise(F.lit(3))
    )
    scored = j.select(
        "id",
        tier.cast("int").alias("tier"),
        inv.cast("bigint").alias("inv_ppm"),
    )
    return (
        scored.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count("*").alias("n_trans"),
            F.sum((F.col("tier") == 0).cast("bigint")).alias("n_tri"),
            F.sum((F.col("tier") == 1).cast("bigint")).alias("n_bi_backoff"),
            F.sum((F.col("tier") == 2).cast("bigint")).alias("n_uni_backoff"),
            F.sum((F.col("tier") == 3).cast("bigint")).alias("n_oov"),
            F.sum("inv_ppm").alias("sum_inv_ppm"),
            F.max("inv_ppm").alias("max_inv_ppm"),
        )
        .withColumn("amip", F.expr("sum_inv_ppm div n_trans"))
        .select(
            "doc_id", "n_trans", "n_tri", "n_bi_backoff", "n_uni_backoff",
            "n_oov", "sum_inv_ppm", "amip", "max_inv_ppm",
        )
    )


def merge_counts(a: DataFrame, b: DataFrame) -> DataFrame:
    """Additive merge of two count tables with identical schemas
    (key columns..., count column last): union + re-aggregate.

    This additivity is what makes the LM incrementally maintainable at
    corpus scale -- a new document batch trains its own (small) count
    tables and merges them into the persisted model without touching
    the historical corpus; exact integer counts make merged and
    from-scratch models identical (tests/test_ngramlm.py pins this)."""
    keys, cnt = a.columns[:-1], a.columns[-1]
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(F.sum(cnt).cast("bigint").alias(cnt))
    )
