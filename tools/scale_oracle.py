"""Oracle-differential correctness ABOVE the driver fixtures (VERDICT r8
item 2).

``tools/scale_validate.py`` (r8) only TIMES the generated sf1/sf10 tiers;
no answer above 600k rows had ever been cross-checked, leaving decimal
overflow, AQE-triggered plan changes, and precision drift at 6M/60M
lineitem unverified. This tool generates (or reuses) the deterministic
``tools/gen_scale.py`` tiers and runs the exact driver-faithful
differential from ``tools/check_oracle.py`` on them: the 15 round-1
headline queries plus the 10 heaviest LLM/x-family sweep entries
(ranked by SWEEP_r8 sf0.1 wall time).

The generated tiers are PERFORMANCE fixtures with fixture-matching
schemas and value ranges, so every oracle consumes them unchanged; both
engines read the same parquet, so hash agreement is as meaningful as on
/root/testdata -- just 10x/100x bigger.

Usage: python tools/scale_oracle.py [sf ...] [--out DIR]
       default sfs: 1 10; output: SCALE_ORACLE_r9/check_oracle_sf{sf}.txt
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_BASE = "/tmp/spark_graft_scale"

HEADLINE_15 = [
    "q1_pricing_summary",
    "q3_unshipped_revenue_top10",
    "q5_region_nation_revenue",
    "q6_forecast_revenue",
    "q18_large_orders",
    "a1_records_per_key",
    "agg_rollup_revenue",
    "window_dedup_keep_newest",
    "asof_click_to_purchase",
    "s4_merge_upsert_events",
    "p1_json_map_flatten",
    "x1_exact_dedup_docs",
    "x5_text_stats",
    "x3_cosine_topk",
    "x2_minhash_neardup_pairs",
]

# 10 heaviest oracled LLM/x-family entries in SWEEP_r8/check_oracle_sf0.1.txt
HEAVY_10 = [
    "x7_corpus_prep_semantic",
    "x3_semantic_dedup",
    "x3_cosine_neardup_pairs",
    "fuzzy_name_pairs",
    "x5_quality_classifier",
    "x3_neardup_collapse",
    "graph_pagerank_trade",
    "x3_ivfpq_topk",
    "x3_pq_mse",
    "x7_corpus_prep_neardup",
]


def ensure_tier(sf: float, files: int = 32) -> str:
    tag = f"sf{sf:g}"
    out_dir = os.path.join(SCALE_BASE, tag)
    marker = os.path.join(out_dir, "_GEN_DONE")
    if not os.path.exists(marker):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "gen_scale.py"),
             out_dir, str(sf), str(files)],
            check=True,
        )
        open(marker, "a").close()
    return out_dir


def main() -> int:
    args = sys.argv[1:]
    out_dir = os.path.join(REPO, "SCALE_ORACLE_r9")
    if "--out" in args:
        i = args.index("--out")
        out_dir = args[i + 1]
        del args[i : i + 2]
    sfs = [float(a) for a in args] or [1.0, 10.0]
    os.makedirs(out_dir, exist_ok=True)
    queries = HEADLINE_15 + HEAVY_10
    rc = 0
    for sf in sfs:
        tier = ensure_tier(sf)
        report = os.path.join(out_dir, f"check_oracle_sf{sf:g}.txt")
        print(f"== sf{sf:g} -> {report}", flush=True)
        with open(report, "w") as f:
            p = subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
                 tier, *queries],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for line in p.stdout:
                sys.stdout.write(line)
                sys.stdout.flush()
                f.write(line)
            p.wait()
            rc |= p.returncode
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
