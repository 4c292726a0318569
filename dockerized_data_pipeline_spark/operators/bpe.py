"""Distributed BPE tokenizer training and application.

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) learns the
subword vocabulary every modern LLM tokenizer is built on; training one
over the corpus IS a training-data-pipeline job, not a library call --
at 100 TB the pair statistics cannot fit one machine. The reference has
nothing comparable (north-star surface).

Scale design -- the standard trick plus Spark shapes:

  * Training runs over the WORD VOCABULARY with frequencies, not the
    corpus: one corpus-wide explode+count shuffle compresses 100 TB of
    text to O(distinct words) rows (Heaps' law: ~10^8 at corpus scale),
    and every merge iteration after that touches only the vocab table.
  * Each iteration is: pair-count aggregate (explode adjacent symbol
    pairs weighted by word frequency -> one small shuffle) -> 1-row
    argmax collect (bounded control data, like the k-means centroids) ->
    plan-side merge application via a fold (``F.aggregate``) that
    rewrites each word's symbol array without any shuffle.
  * Determinism: counts are exact integers and the argmax orders by
    (count DESC, left, right) -- a total order, so the learned merge
    table is partition-invariant (covered by the rows-only twin-run
    harness) and engine-reproducible.
  * The segmentation DataFrame is localCheckpoint'ed each iteration:
    the argmax already materializes it, and truncating lineage keeps
    iteration k from re-evaluating k chained folds.

Application (:func:`bpe_apply`) broadcasts the learned merge ranks and
tokenizes with the classic lowest-rank-first loop in an Arrow-batched
``mapInPandas`` (a per-word memo makes it O(distinct words per batch));
tokens concatenate back to the exact input -- losslessness is the
tokenizer invariant the tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker: merges never cross word boundaries


# Train and apply MUST split identically: Java's \s (Spark side) is the
# ASCII whitespace class only, while Python's str.split()/\s is
# Unicode-aware -- a mismatch would segment the same document into
# different words at train vs apply time (e.g. around a NBSP), breaking
# the lossless-tokenization invariant. Both sides therefore use this
# explicit ASCII whitespace class.
_WS_CLASS = "[ \\t\\n\\x0b\\f\\r]"


def split_words(text: str) -> list[str]:
    """Python-side twin of the training split (identical semantics)."""
    import re

    return [w for w in re.split(_WS_CLASS + "+", text) if w]


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) corpus word frequencies -- the one corpus-wide pass."""
    from ..catalog import spread_input

    return (
        spread_input(docs.select(text_col))  # r11: parallelize the split
        .select(
            F.explode(F.split(F.col(text_col), _WS_CLASS + "+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _initial_segmentation(vocab: DataFrame) -> DataFrame:
    """word -> array of single-character symbols + the end marker."""
    return vocab.withColumn(
        "seg",
        F.concat(
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ),
            F.array(F.lit(END)),
        ),
    )


def _pair_counts(seg_df: DataFrame) -> DataFrame:
    """(left, right, total) adjacent-symbol pair frequencies, weighted by
    word frequency: the per-iteration aggregate (one small shuffle over
    the vocab, never the corpus)."""
    pairs = seg_df.select(
        "n",
        F.explode(
            # sequence(1, 0) DESCENDS instead of being empty (and ANSI
            # seg[1] then throws): guard the single-symbol case explicitly
            F.expr(
                "CASE WHEN size(seg) >= 2 THEN"
                " transform(sequence(1, size(seg) - 1),"
                "  i -> struct(seg[i - 1] AS left, seg[i] AS right))"
                " ELSE CAST(array() AS array<struct<left string, right string>>)"
                " END"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(
        F.sum("n").cast("bigint").alias("total")
    )


def _merge_expr(a: str, b: str):
    """Fold that rewrites a symbol array replacing every non-overlapping
    adjacent (a, b) with the fused symbol, left to right -- the exact
    greedy replacement BPE training specifies, as a pure expression."""
    return F.aggregate(
        "seg",
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(a + b)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


_BATCH_TOPK = 64  # pairs collected per round: bounded control data, O(1)


def _safe_merge_batch(
    top: list, already: int, num_merges: int, min_pair_count: int, topk: int
) -> tuple[list[tuple[str, str, int]], bool]:
    """From one sorted (count DESC, left, right) top-K pair-count snapshot,
    select the longest PREFIX of merges that the strictly-sequential BPE
    algorithm is guaranteed to pick in this exact order (r12: cuts the
    sequential round count -- each round is a full cluster barrier, the
    dominant cost of training at every scale).

    Why the batch is exact: merging (a, b) only changes the counts of
    pairs that TOUCH a or b -- (x, a) and (b, y) counts can only decrease
    (some of their occurrences fuse into the new symbol), and every newly
    created pair ((x, ab), (ab, y), (ab, ab)) inherits a count bounded by
    one of those touched pairs' old counts. Pairs DISJOINT from {a, b}
    keep their counts exactly (the fused symbol ab is brand new, so a
    disjoint pair cannot gain or lose occurrences). Scanning the snapshot
    in the algorithm's own (count DESC, left, right) order and selecting
    greedily while pairs are disjoint from every symbol already selected,
    the first conflicting pair (count c_p) bounds every count the pending
    merges could have changed; a selected pair with count > c_p therefore
    still ranks strictly first when its turn comes, ties included (any
    changed or new pair has count <= c_p < its count). Selected pairs
    with count == c_p are dropped back to the next round -- a new pair
    with the same count could sort lexicographically before them.

    Returns (batch, stop): stop=True when the snapshot's best pair is
    already below min_pair_count (training is done)."""
    if not top or int(top[0]["total"]) < min_pair_count:
        return [], True
    touched: set[str] = set()
    sel: list[tuple[str, str, int]] = []
    c_p: int | None = None
    for r in top:
        n = int(r["total"])
        if n < min_pair_count:
            break
        a, b = r["left"], r["right"]
        if a in touched or b in touched:
            # first conflicting pair: the tie bound. Found even after the
            # merge quota fills -- a selected pair whose count TIES a
            # conflicting one is unsafe regardless of quota.
            c_p = n
            break
        if already + len(sel) < num_merges:
            sel.append((a, b, n))
            touched.add(a)
            touched.add(b)
        else:
            # quota full: this disjoint pair would be picked after the
            # batch (it sorts below every selected pair), so it neither
            # joins the batch nor bounds it -- keep scanning for the
            # first pair that touches a selected symbol.
            pass
    if c_p is None and len(top) >= topk:
        # the snapshot was truncated: an unseen pair beyond the top-K may
        # touch a selected symbol, so bound by the last count we saw
        c_p = int(top[-1]["total"])
    if c_p is not None:
        sel = sel[:1] + [s for s in sel[1:] if s[2] > c_p]
    return sel, False


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``num_merges`` BPE merges from the corpus. Returns
    [(left, right, pair_count)] in rank order; stops early when the best
    remaining pair's frequency drops below ``min_pair_count``.

    r12: each round collects the top-K pair counts (K=64, bounded control
    data like the 1-row argmax before it) and applies the longest
    provably-safe PREFIX of merges per round (:func:`_safe_merge_batch`),
    so the number of sequential pair-count barriers drops below the merge
    count (24 merges in 19 rounds on the sf0.1 corpus; merge list verified
    identical). Worst case (every adjacent snapshot pair conflicting) it
    degrades to exactly the old one-merge-per-round behavior."""
    # eager=False (r11): materialization folds into the next pair-count
    # job instead of spending a dedicated job per checkpoint -- the merge
    # loop ran TWO jobs per merge (count + eager checkpoint); now one.
    seg = _initial_segmentation(word_vocab(docs, text_col)).localCheckpoint(
        eager=False
    )
    merges: list[tuple[str, str, int]] = []
    while len(merges) < num_merges:
        top = (
            _pair_counts(seg)
            .orderBy(F.desc("total"), F.asc("left"), F.asc("right"))
            .limit(_BATCH_TOPK)
            .collect()
        )
        batch, stop = _safe_merge_batch(
            top, len(merges), num_merges, min_pair_count, _BATCH_TOPK
        )
        if stop or not batch:
            break
        for a, b, n in batch:
            merges.append((a, b, n))
            seg = seg.withColumn("seg", _merge_expr(a, b))
        seg = seg.localCheckpoint(eager=False)
    return merges


def bpe_merges_df(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "rank int, left string, right string, pair_count long",
    )


def _tokenize_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic BPE apply: repeatedly fuse the lowest-rank adjacent pair."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


BPE_TOKENIZED_SCHEMA = "doc_id long, n_tokens int, tokens_md5 string"


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize each document with the learned merges (ranks broadcast as
    a closure literal -- they are O(num_merges), control data). Emits the
    token count and the md5 of the space-joined token stream, so any
    rank-ordering or fusion bug changes the output. Arrow-batched
    mapInPandas with a per-batch word memo: cost tracks DISTINCT words
    per batch, not tokens."""
    import hashlib
    from collections.abc import Iterator

    import pandas as pd

    ranks = {(a, b): i for i, (a, b, _n) in enumerate(merges)}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in it:
            out = {"doc_id": [], "n_tokens": [], "tokens_md5": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    # NULL text -> NULL tokenization (r10 NULL tier): the
                    # oracle's length/md5 chain propagates NULL the same way
                    out["doc_id"].append(did)
                    out["n_tokens"].append(None)
                    out["tokens_md5"].append(None)
                    continue
                toks: list[str] = []
                for w in split_words(text):
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _tokenize_word(w, ranks)
                    toks.extend(got)
                out["doc_id"].append(did)
                out["n_tokens"].append(len(toks))
                out["tokens_md5"].append(
                    hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(
        batches, schema=BPE_TOKENIZED_SCHEMA
    )
