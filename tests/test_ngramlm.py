"""Hand-computed stupid-backoff LM scoring (operators/ngramlm.py).

Training corpus (2 docs):
  d1: "a b a b c"     transitions: (a,b) (b,a) (a,b) (b,c)
  d2: "a b b"         transitions: (a,b) (b,b)
Unigram counts: a=3, b=4, c=1          N = 8
Bigram counts:  (a,b)=3, (b,a)=1, (b,c)=1, (b,b)=1

Scored doc: "a b z c b"  transitions: (a,b) (b,z) (z,c) (c,b)
  (a,b) tier 0: inv = 1e6 * c(a)/c(ab)      = 1_000_000 * 3 // 3 = 1_000_000
  (b,z) tier 2: z OOV                       = 2_500_000 * 8     = 20_000_000
  (z,c) tier 1: backoff to c(c)=1           = 2_500_000 * 8 // 1 = 20_000_000
  (c,b) tier 1: bigram unseen, c(b)=4       = 2_500_000 * 8 // 4 = 5_000_000
  sum = 46_000_000, amip = 46_000_000 // 4 = 11_500_000
"""

import pytest

from dockerized_data_pipeline_spark.operators import ngramlm as LM


@pytest.fixture(scope="module")
def lm_frames(spark):
    train = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b b")], "doc_id long, text string"
    )
    held = spark.createDataFrame(
        [(10, "a b z c b"), (20, "x")], "doc_id long, text string"
    )
    return train, held


def test_train_counts(spark, lm_frames):
    train, _ = lm_frames
    uni, bi, total = LM.train_bigram_lm(train)
    assert {(r.w, r.c) for r in uni.collect()} == {("a", 3), ("b", 4), ("c", 1)}
    assert {(r.w1, r.w2, r.c12) for r in bi.collect()} == {
        ("a", "b", 3),
        ("b", "a", 1),
        ("b", "c", 1),
        ("b", "b", 1),
    }
    assert total.collect()[0].n == 8


def test_transition_tiers_and_inverse_probs(spark, lm_frames):
    train, held = lm_frames
    uni, bi, total = LM.train_bigram_lm(train)
    got = {
        (r.w1, r.w2): (r.tier, r.inv_ppm)
        for r in LM.stupid_backoff_inverse(held, uni, bi, total).collect()
    }
    assert got == {
        ("a", "b"): (0, 1_000_000),
        ("b", "z"): (2, 20_000_000),
        ("z", "c"): (1, 20_000_000),
        ("c", "b"): (1, 5_000_000),
    }


def test_document_scores_and_short_doc_exclusion(spark, lm_frames):
    train, held = lm_frames
    uni, bi, total = LM.train_bigram_lm(train)
    rows = LM.score_documents(held, uni, bi, total).collect()
    # the 1-token doc (doc_id=20) has no transitions and is absent
    assert [r.doc_id for r in rows] == [10]
    r = rows[0]
    assert (r.n_trans, r.n_backoff, r.n_oov) == (4, 3, 1)
    assert r.sum_inv_ppm == 46_000_000
    assert r.amip == 11_500_000
    assert r.max_inv_ppm == 20_000_000


def test_uniform_model_amip_is_vocab_size_ppm(spark):
    """Perplexity-analog sanity: on a uniform corpus every transition is
    a seen bigram with c(w1)/c(w1 w2) == vocab size, so AMIP == V * 1e6
    (the uniform-model perplexity, exactly)."""
    # 4-symbol cyclic corpus: every unigram count 25, every bigram 25
    text = " ".join("abcd"[i % 4] for i in range(101))
    train = spark.createDataFrame([(1, text)], "doc_id long, text string")
    uni, bi, total = LM.train_bigram_lm(train)
    # unigrams 26,25,25,25; bigrams (a,b)=25 etc. -- use the exact corpus
    held = spark.createDataFrame([(10, "a b c d a")], "doc_id long, text string")
    r = LM.score_documents(held, uni, bi, total).collect()[0]
    assert r.n_backoff == 0
    # c(a)=26 ((26*1e6)//25=1_040_000), others 25 -> 1_000_000
    assert r.sum_inv_ppm == 1_040_000 + 3 * 1_000_000


def test_trigram_backoff_chain(spark, lm_frames):
    """All four tiers, hand-computed on the module corpus.

    Training trigrams: (a,b,a) (b,a,b) (a,b,c) (a,b,b), each count 1.
    Held "a b c b z a": (a,b,c) tri hit -> 1e6*c(ab)=3//1 = 3_000_000;
    (b,c,b) uni backoff on c(b)=4 -> 6_250_000*8//4 = 12_500_000;
    (c,b,z) OOV -> 6_250_000*8 = 50_000_000;
    (b,z,a) uni backoff on c(a)=3 -> 6_250_000*8//3 = 16_666_666.
    Held "c a b": trigram unseen but bigram (a,b)=3 seen ->
    2_500_000*c(a)=3//3 = 2_500_000 (tier 1)."""
    train, _ = lm_frames
    held = spark.createDataFrame(
        [(10, "a b c b z a"), (20, "c a b"), (30, "x y")],
        "doc_id long, text string",
    )
    uni, bi, tri, total = LM.train_trigram_lm(train)
    assert {(r.w1, r.w2, r.w3, r.c123) for r in tri.collect()} == {
        ("a", "b", "a", 1), ("b", "a", "b", 1),
        ("a", "b", "c", 1), ("a", "b", "b", 1),
    }
    rows = {r.doc_id: r for r in
            LM.score_documents_trigram(held, uni, bi, tri, total).collect()}
    assert set(rows) == {10, 20}  # the 2-token doc has no trigram windows
    r = rows[10]
    assert (r.n_trans, r.n_tri, r.n_bi_backoff, r.n_uni_backoff, r.n_oov) == (
        4, 1, 0, 2, 1
    )
    assert r.sum_inv_ppm == 3_000_000 + 12_500_000 + 50_000_000 + 16_666_666
    assert r.amip == r.sum_inv_ppm // 4
    assert r.max_inv_ppm == 50_000_000
    r = rows[20]
    assert (r.n_trans, r.n_tri, r.n_bi_backoff, r.n_uni_backoff, r.n_oov) == (
        1, 0, 1, 0, 0
    )
    assert r.sum_inv_ppm == 2_500_000


def test_count_merge_additivity(spark):
    """merge_counts(train(A), train(B)) == train(A union B) for all three
    tables -- the property that makes the persisted LM incrementally
    maintainable without retraining on the historical corpus."""
    a = spark.createDataFrame([(1, "a b a"), (2, "b c")], "doc_id long, text string")
    b = spark.createDataFrame([(3, "a b"), (4, "c c b a")], "doc_id long, text string")
    both = a.unionByName(b)

    ua, ba, _ = LM.train_bigram_lm(a)
    ub, bb, _ = LM.train_bigram_lm(b)
    uf, bf, tf = LM.train_bigram_lm(both)

    assert {tuple(r) for r in LM.merge_counts(ua, ub).collect()} == {
        tuple(r) for r in uf.collect()
    }
    assert {tuple(r) for r in LM.merge_counts(ba, bb).collect()} == {
        tuple(r) for r in bf.collect()
    }
    # total follows from the merged unigrams
    merged_n = LM.merge_counts(ua, ub).agg(
        __import__("pyspark.sql.functions", fromlist=["sum"]).sum("c")
    ).collect()[0][0]
    assert merged_n == tf.collect()[0].n
