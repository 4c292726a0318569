"""Property-fuzz for the X-family parameter space (VERDICT r8 item 6).

The SQL fuzzer (tools/fuzz_oracle.py) covers relational expressions;
the dedup/ANN operators were only ever tested at their registry-default
parameters. This harness sweeps (shingle n, bands, rows_per_band,
est-Jaccard threshold, corpus size) x (k, n_lists, n_probe, cosine
threshold) over seeded random planted-duplicate corpora and asserts:

MinHash-LSH family (operators/dedup.py):
  P1  differential: ``minhash_neardup_pairs_native`` output ==
      a straightforward Python re-derivation (banding, bucket collision,
      signature-agreement estimate, threshold filter) over the COLLECTED
      ``minhash_signatures`` table -- validating the distributed
      band/join/estimate logic at every parameter point without
      reimplementing xxhash.
  P2  planted EXACT duplicates are always recovered with est = 1e6
      (identical shingle sets -> identical signatures -> guaranteed
      bucket collision; deterministic, not statistical).
  P3  canonical form: doc_a < doc_b, no self/duplicate pairs; twin run
      is identical (xxhash64, no RNG).
  P4  aggregate recall over all draws for planted mutations with true
      shingle-Jaccard >= 0.85 under banding P[candidate] >= 0.999:
      asserted >= 0.9 (statistically conservative; individual draws are
      recorded, not asserted).

IVF ANN family (operators/similarity.py):
  P5  full probe is exact: ivf_topk(n_probe = n_lists) ==
      cosine_topk, row for row (ids and DECIMAL scores).
  P6  probe monotonicity: sum of top-k scores is non-decreasing in
      n_probe (rank_probe_clusters probes a sorted prefix, so the
      candidate set only grows).
  P7  brute-force cosine pairs agree with a Python re-computation of
      every cosine (same left-to-right fold order): planted vector
      near-dups clearly above threshold are found; every returned pair
      is truly above threshold (margin 1e-3 guards the DECIMAL round).

Usage: python tools/fuzz_xfamily.py [n_draws] [seed]
Writes FUZZ_XFAMILY_r9.json. Exit 1 on any violation.
"""

from __future__ import annotations

import itertools
import json
import math
import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from dockerized_data_pipeline_spark.operators import dedup, similarity

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "spark", "query",
    "shuffle", "column", "vector", "batch",
]


# ------------------------------------------------------------ corpora

def make_text_corpus(rng: random.Random, n_docs: int, doc_len: int):
    """Random docs + planted mutation near-dups + planted exact dups.
    Returns (rows, exact_pairs, mutated_pairs) where mutated_pairs maps
    (a, b) -> true word-3-gram Jaccard."""
    docs = {}
    for i in range(n_docs):
        docs[i] = [rng.choice(VOCAB) for _ in range(doc_len)]
    next_id = n_docs
    exact_pairs = []
    mutated = {}
    for _ in range(max(3, n_docs // 20)):
        src = rng.randrange(n_docs)
        dup = next_id
        next_id += 1
        docs[dup] = list(docs[src])
        exact_pairs.append((src, dup))
    for _ in range(max(3, n_docs // 12)):
        src = rng.randrange(n_docs)
        dup = next_id
        next_id += 1
        words = list(docs[src])
        n_mut = max(1, int(len(words) * rng.uniform(0.01, 0.08)))
        for _ in range(n_mut):
            words[rng.randrange(len(words))] = rng.choice(VOCAB)
        docs[dup] = words
        mutated[(src, dup)] = None  # jaccard filled per shingle-n below
    rows = [(i, " ".join(w)) for i, w in sorted(docs.items())]
    return rows, docs, exact_pairs, mutated


def true_jaccard(a_words, b_words, n: int) -> float:
    def sh(ws):
        return {tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    sa, sb = sh(a_words), sh(b_words)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# --------------------------------------------- python LSH reference

def py_reference_pairs(spark, sig_df, bands, rows_per_band, min_ppm):
    """Banding + bucket collision + estimate in driver-side Python, but
    band signatures come from Spark's own xxhash64 on the signature
    columns (one tiny auxiliary query), so no Python xxhash port is
    needed and the differential still exercises the DISTRIBUTED join /
    dedup / estimate logic against an independent composition."""
    num_hashes = bands * rows_per_band
    banded = dedup.banded_signatures(sig_df, bands, rows_per_band)
    band_rows = banded.collect()
    sig_rows = {r["doc"]: [r[f"mh{i}"] for i in range(num_hashes)]
                for r in sig_df.collect()}
    buckets: dict[tuple, list] = {}
    for r in band_rows:
        buckets.setdefault((r["band"], r["sig"]), []).append(r["doc"])
    cand = set()
    for docs in buckets.values():
        for a, b in itertools.combinations(sorted(docs), 2):
            cand.add((a, b))
    out = {}
    for a, b in cand:
        eq = sum(1 for i in range(num_hashes) if sig_rows[a][i] == sig_rows[b][i])
        ppm = math.floor(eq * 1_000_000.0 / num_hashes)
        if ppm >= min_ppm:
            out[(a, b)] = ppm
    return out


# ------------------------------------------------------------ draws

def minhash_draw(spark, rng: random.Random, report: dict) -> list[str]:
    violations = []
    n_docs = rng.choice([80, 150, 250])
    doc_len = rng.choice([30, 60, 100])
    n = rng.choice([2, 3, 4])
    bands = rng.choice([4, 8, 12, 16])
    rows_per_band = rng.choice([1, 2, 3, 4])
    min_ppm = rng.choice([200_000, 300_000, 500_000])
    rows, docs, exact_pairs, mutated = make_text_corpus(rng, n_docs, doc_len)
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got_df = dedup.minhash_neardup_pairs_native(
        df, "doc_id", "text", n=n, bands=bands,
        rows_per_band=rows_per_band, min_est_jaccard_ppm=min_ppm,
    )
    got = {(r["doc_a"], r["doc_b"]): r["est_jaccard_ppm"] for r in got_df.collect()}

    # P3 canonical + deterministic twin
    for (a, b) in got:
        if not a < b:
            violations.append(f"P3 non-canonical pair ({a},{b})")
    got2 = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard_ppm"]
        for r in dedup.minhash_neardup_pairs_native(
            df, "doc_id", "text", n=n, bands=bands,
            rows_per_band=rows_per_band, min_est_jaccard_ppm=min_ppm,
        ).collect()
    }
    if got != got2:
        violations.append("P3 twin-run mismatch")

    # P1 differential vs python composition over Spark signatures
    sig = dedup.minhash_signatures(df, "doc_id", "text", n, bands * rows_per_band)
    want = py_reference_pairs(spark, sig, bands, rows_per_band, min_ppm)
    if got != want:
        only_g = set(got) - set(want)
        only_w = set(want) - set(got)
        violations.append(
            f"P1 differential mismatch: spark-only={sorted(only_g)[:3]} "
            f"python-only={sorted(only_w)[:3]}"
        )

    # P2 exact duplicates guaranteed
    for a, b in exact_pairs:
        key = (min(a, b), max(a, b))
        if got.get(key) != 1_000_000:
            violations.append(f"P2 exact dup {key} missing or est != 1e6")

    # P4 bookkeeping (asserted in aggregate by the caller)
    hi_planted = hits = 0
    for (a, b) in mutated:
        j = true_jaccard(docs[a], docs[b], n)
        p_cand = 1 - (1 - j ** rows_per_band) ** bands
        est_needed = min_ppm / 1e6
        if j >= max(0.85, est_needed + 0.15) and p_cand >= 0.999:
            hi_planted += 1
            if (min(a, b), max(a, b)) in got:
                hits += 1
    report["minhash_draws"].append(
        {
            "params": [n_docs, doc_len, n, bands, rows_per_band, min_ppm],
            "pairs": len(got),
            "hi_planted": hi_planted,
            "hi_hits": hits,
        }
    )
    report["hi_planted_total"] += hi_planted
    report["hi_hits_total"] += hits
    return violations


def make_vec_corpus(rng: random.Random, n_vecs: int, dim: int):
    vecs = {}
    for i in range(n_vecs):
        vecs[i] = [rng.uniform(-1, 1) for _ in range(dim)]
    planted = []
    next_id = n_vecs
    for _ in range(max(3, n_vecs // 15)):
        src = rng.randrange(n_vecs)
        v = [x + rng.uniform(-0.01, 0.01) for x in vecs[src]]
        vecs[next_id] = v
        planted.append((src, next_id))
        next_id += 1
    rows = [(i, [float(f"{x:.6f}") for x in v]) for i, v in sorted(vecs.items())]
    return rows, planted


def py_cos(a, b) -> float:
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb) if na and nb else 0.0


def ivf_draw(spark, rng: random.Random, report: dict) -> list[str]:
    violations = []
    n_vecs = rng.choice([150, 300])
    dim = rng.choice([16, 32])
    k = rng.choice([5, 10, 20])
    n_lists = rng.choice([4, 8])
    rows, planted = make_vec_corpus(rng, n_vecs, dim)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # spark-side float32 truncation: read the corpus back as python floats
    stored = {r["vec_id"]: list(r["embedding"]) for r in df.collect()}
    query = [rng.uniform(-1, 1) for _ in range(dim)]
    centroids = [stored[rng.randrange(n_vecs)] for _ in range(n_lists)]

    # P5 full probe == exact
    exact = [tuple(r) for r in similarity.cosine_topk(df, query, k=k).collect()]
    full = [
        tuple(r)
        for r in similarity.ivf_topk(
            df, query, centroids, k=k, n_probe=n_lists
        ).collect()
    ]
    if exact != full:
        violations.append(f"P5 full-probe != exact: {exact[:2]} vs {full[:2]}")

    # P6 monotone in n_probe
    prev = None
    for n_probe in range(1, n_lists + 1):
        res = similarity.ivf_topk(df, query, centroids, k=k, n_probe=n_probe).collect()
        s = sum(float(r["cos_sim"]) for r in res)
        if prev is not None and s < prev - 1e-9:
            violations.append(f"P6 non-monotone at n_probe={n_probe}: {s} < {prev}")
        prev = s
    # recall bookkeeping at n_probe=1
    res1 = {r["vec_id"] for r in
            similarity.ivf_topk(df, query, centroids, k=k, n_probe=1).collect()}
    exact_ids = {r[0] for r in exact}
    report["ivf_draws"].append(
        {
            "params": [n_vecs, dim, k, n_lists],
            "recall_probe1": round(len(res1 & exact_ids) / max(len(exact_ids), 1), 3),
        }
    )

    # P7 brute-force pairs vs python
    threshold = rng.choice([0.85, 0.9, 0.95])
    got = {
        (r["id_a"], r["id_b"]): float(r["cos_sim"])
        for r in similarity.cosine_neardup_pairs(df, threshold=threshold).collect()
    }
    for (a, b), cs in got.items():
        pc = py_cos(stored[a], stored[b])
        if pc < threshold - 1e-3:
            violations.append(f"P7 false positive ({a},{b}): spark={cs} py={pc:.6f}")
    for a, b in planted:
        pc = py_cos(stored[a], stored[b])
        if pc >= threshold + 1e-3:
            key = (min(a, b), max(a, b))
            if key not in got:
                violations.append(f"P7 planted near-dup {key} missing (py={pc:.6f})")
    return violations


def main() -> int:
    n_draws = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 90_901
    from dockerized_data_pipeline_spark.session import get_session

    spark = get_session("fuzz-xfamily", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(seed)
    report = {
        "seed": seed,
        "n_draws": n_draws,
        "minhash_draws": [],
        "ivf_draws": [],
        "hi_planted_total": 0,
        "hi_hits_total": 0,
        "violations": [],
    }
    for d in range(n_draws):
        fn = minhash_draw if d % 2 == 0 else ivf_draw
        v = fn(spark, rng, report)
        if v:
            report["violations"].extend([f"draw {d}: {x}" for x in v])
        if (d + 1) % 20 == 0:
            print(
                f"[{d + 1}/{n_draws}] violations={len(report['violations'])} "
                f"recall_hi={report['hi_hits_total']}/{report['hi_planted_total']}",
                flush=True,
            )
    # P4 aggregate recall
    if report["hi_planted_total"] >= 20:
        recall = report["hi_hits_total"] / report["hi_planted_total"]
        report["hi_recall"] = round(recall, 4)
        if recall < 0.9:
            report["violations"].append(f"P4 aggregate hi-recall {recall:.3f} < 0.9")
    out = os.path.join(REPO, "FUZZ_XFAMILY_r9.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(
        json.dumps(
            {k: v for k, v in report.items() if k not in ("minhash_draws", "ivf_draws")}
        )
    )
    return 1 if report["violations"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
