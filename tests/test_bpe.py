"""Distributed BPE training/application (operators/bpe.py): the learned
merge table must match an independent pure-Python BPE reference on the
classic corpus, tokenization must be lossless, and edge cases (single
chars, rare pairs) must not wedge."""

from __future__ import annotations

import collections

from dockerized_data_pipeline_spark.operators.bpe import (
    END,
    bpe_apply,
    bpe_train,
    word_vocab,
)


def _ref_bpe(words: list[str], k: int, min_count: int = 2):
    """Independent reference: textbook BPE with (count DESC, pair ASC)
    tie-break -- deliberately re-implemented, not shared code."""
    vocab = collections.Counter(words)
    segs = {w: list(w) + [END] for w in vocab}
    out = []
    for _ in range(k):
        pc: collections.Counter = collections.Counter()
        for w, n in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        mx = max(pc.values())
        if mx < min_count:
            break
        a, b = min(p for p, c in pc.items() if c == mx)
        out.append((a, b, mx))
        for w in segs:
            s = segs[w]
            ns: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            segs[w] = ns
    return out, segs


WORDS = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3


def _docs(spark):
    # spread the corpus over several docs AND partitions: training must
    # not depend on document boundaries or partitioning
    rows = [(i, " ".join(WORDS[i::3])) for i in range(3)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(5)


def test_bpe_train_matches_independent_reference(spark):
    merges = bpe_train(_docs(spark), num_merges=10)
    expected, _ = _ref_bpe(WORDS, 10)
    assert merges == expected
    # the classic corpus's famous first merges
    assert [(a, b) for a, b, _ in merges[:3]] == [
        ("e", "s"), ("es", "t"), ("est", END),
    ]


def test_bpe_apply_is_lossless_and_matches_training_segmentation(spark):
    docs = _docs(spark)
    merges = bpe_train(docs, num_merges=10)
    _, ref_segs = _ref_bpe(WORDS, 10)

    vocab = word_vocab(docs).withColumnRenamed("word", "text").withColumn(
        "doc_id", __import__("pyspark").sql.functions.monotonically_increasing_id()
    )
    import hashlib

    got = {
        r.doc_id: (r.n_tokens, r.tokens_md5)
        for r in bpe_apply(vocab, merges).collect()
    }
    words = {r.doc_id: r.text for r in vocab.collect()}
    for did, w in words.items():
        seg = ref_segs[w]
        # apply (rank-priority loop) reproduces the training segmentation
        assert got[did][0] == len(seg), w
        assert got[did][1] == hashlib.md5(
            " ".join(seg).encode("utf-8")
        ).hexdigest(), w
        assert "".join(seg) == w + END  # lossless


def test_bpe_more_merges_never_increase_token_count(spark):
    docs = _docs(spark)
    m4 = bpe_train(docs, num_merges=4)
    m10 = bpe_train(docs, num_merges=10)
    n4 = sum(r.n_tokens for r in bpe_apply(docs, m4).collect())
    n10 = sum(r.n_tokens for r in bpe_apply(docs, m10).collect())
    assert n10 <= n4


def test_bpe_min_pair_count_stops_early(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab cd")], "doc_id long, text string"
    )
    merges = bpe_train(docs, num_merges=50, min_pair_count=2)
    # only pairs from 'ab' (count 2) qualify; 'cd' pairs occur once
    assert 0 < len(merges) <= 3
    assert all(n >= 2 for _, _, n in merges)


def test_bpe_single_char_words_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b a"), (2, "")], "doc_id long, text string"
    )
    merges = bpe_train(docs, num_merges=5)
    # 'a </w>' pair occurs 3 times -> at least one merge learned
    assert any(a == "a" and b == END for a, b, _ in merges)
    rows = {r.doc_id: r.n_tokens for r in bpe_apply(docs, merges).collect()}
    assert rows[2] == 0  # empty doc -> zero tokens, no crash


def test_unicode_whitespace_splits_identically_train_and_apply(spark):
    """Review r4.2: Java \\s (train side) is ASCII-only while Python's
    str.split is Unicode-aware -- both sides now share one explicit ASCII
    whitespace class, so a NBSP-joined token is ONE word in both train
    and apply and tokenization stays lossless."""
    from dockerized_data_pipeline_spark.operators.bpe import split_words

    nbsp_word = "a b"  # NBSP: not a split point on either side
    docs = spark.createDataFrame(
        [(1, f"{nbsp_word} {nbsp_word} plain plain")],
        "doc_id long, text string",
    )
    vocab = {r.word: r.n for r in word_vocab(docs).collect()}
    assert vocab == {nbsp_word: 2, "plain": 2}
    assert split_words(f"{nbsp_word} {nbsp_word} plain plain") == [
        nbsp_word, nbsp_word, "plain", "plain",
    ]
    merges = bpe_train(docs, num_merges=8, min_pair_count=2)
    rows = bpe_apply(docs, merges).collect()
    # lossless through the NBSP: token stream reconstructs both words
    import hashlib

    from dockerized_data_pipeline_spark.operators.bpe import (
        _tokenize_word,
    )

    ranks = {(a, b): i for i, (a, b, _n) in enumerate(merges)}
    expected = []
    for w in [nbsp_word, nbsp_word, "plain", "plain"]:
        toks = _tokenize_word(w, ranks)
        assert "".join(toks) == w + END
        expected.extend(toks)
    assert rows[0].n_tokens == len(expected)
    assert rows[0].tokens_md5 == hashlib.md5(
        " ".join(expected).encode("utf-8")
    ).hexdigest()


# ---------------------------------------------------------------------------
# Property-based: random corpora vs the independent reference. Spark-side
# examples are kept small (each example is a full train run), but the
# corpus SHAPES are adversarial: repeated chars (overlapping pairs),
# shared prefixes/suffixes, single-char words.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def corpora(draw):
    alphabet = "abc"
    n_words = draw(st.integers(2, 6))
    words = [
        draw(st.text(alphabet=alphabet, min_size=1, max_size=5))
        for _ in range(n_words)
    ]
    # repetition factors give pairs real frequency structure
    reps = [draw(st.integers(1, 4)) for _ in range(n_words)]
    out = []
    for w, r in zip(words, reps):
        out += [w] * r
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpora(), st.integers(1, 6))
def test_bpe_train_matches_reference_on_random_corpora(spark, words, k):
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    ).repartition(3)
    got = bpe_train(docs, num_merges=k)
    expected, ref_segs = _ref_bpe(words, k)
    assert got == expected
    # and the rank-priority tokenizer reproduces the reference
    # segmentation for every corpus word (the greedy/rank equivalence)
    from dockerized_data_pipeline_spark.operators.bpe import _tokenize_word

    ranks = {(a, b): i for i, (a, b, _n) in enumerate(got)}
    for w in set(words):
        assert _tokenize_word(w, ranks) == ref_segs[w], (w, got)
