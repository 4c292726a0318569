"""Re-base committed BENCH_DETAIL_r{N}.json files into the r11 pinned
normalization unit (quiet-reference-equivalent seconds; see bench.py
_CALIBRATION_REF_S_PER_ROW) so per-query timings are comparable across
rounds despite (a) the r10 calibration-op resize 2B->4B rows and (b)
ambient-load differences between driver runs.

For each round file: normalized(q) = raw_sec(q) * ref_probe_sec(round) /
bracket_mean(chunk of q), where ref_probe_sec(round) = 2.9e-10 s/row *
calibration_rows(round). Emits a markdown table to stdout.

Usage: python tools/bench_renorm.py BENCH_DETAIL_r9.json BENCH_DETAIL_r10.json [BENCH_DETAIL.json ...]
"""

from __future__ import annotations

import json
import sys

REF_S_PER_ROW = 2.9e-10
# calibration-op size per round (bench.py history): r9 and earlier 2B,
# r10 onward 4B. Newer files carry calibration_rows explicitly.
DEFAULT_ROWS = {"r9": 2_000_000_000, "r10": 4_000_000_000}


def renorm(path: str) -> dict[str, float]:
    d = json.load(open(path))
    cal = d["calibration"]
    rows = cal.get("calibration_rows")
    if rows is None:
        tag = "r9" if "r9" in path else "r10" if "r10" in path else None
        if tag is None:
            raise SystemExit(f"{path}: no calibration_rows and no r-tag in name")
        rows = DEFAULT_ROWS[tag]
    ref_sec = REF_S_PER_ROW * rows
    out: dict[str, float] = {}
    for probes, qnames in zip(cal["chunk_probes"], cal["chunk_queries"]):
        bracket = (probes[0] + probes[1]) / 2.0
        for q in qnames:
            out[q] = round(d["queries"][q] * ref_sec / bracket, 3)
    return out


def main() -> None:
    paths = sys.argv[1:]
    cols = {p: renorm(p) for p in paths}
    names: list[str] = []
    for c in cols.values():
        for q in c:
            if q not in names:
                names.append(q)
    hdr = " | ".join(p.replace("BENCH_DETAIL", "").replace(".json", "").strip("_") or "now" for p in paths)
    print(f"| query | {hdr} |")
    print("|---|" + "---|" * len(paths))
    for q in names:
        vals = " | ".join(
            f"{cols[p][q]:.3f}" if q in cols[p] else "-" for p in paths
        )
        print(f"| {q} | {vals} |")
    tot = " | ".join(f"{sum(cols[p].values()):.3f}" for p in paths)
    print(f"| **total** | {tot} |")


if __name__ == "__main__":
    main()
