"""Versioned full-sweep artifacts (VERDICT r5 item 4).

The grading driver samples the same 50 queries every round; the other
~180 registered queries' correctness evidence otherwise lives only in a
builder-local terminal. This runner executes the complete oracle
differential (tools/check_oracle.py) at all three scale factors plus the
output-type audit (tools/audit_types.py) and writes each run's full
stdout to SWEEP_r{N}/, so the evidence is committed, diffable round over
round, and judge-verifiable without a 15-minute re-run.

Usage: python tools/run_sweep.py <round>     e.g. python tools/run_sweep.py 6
Exit code 0 only if every sub-run reports zero failures.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ("sf0.001", "sf0.01", "sf0.1")


def run_to_file(cmd: list[str], out_path: str) -> str:
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=3600
    )
    with open(out_path, "w") as f:
        f.write(proc.stdout)
        if proc.returncode != 0:
            f.write(f"\n[exit code {proc.returncode}]\n")
            f.write(proc.stderr[-4000:])
    return proc.stdout


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    out_dir = os.path.join(REPO, f"SWEEP_r{rnd}")
    os.makedirs(out_dir, exist_ok=True)

    ok = True
    summaries = []
    for sf in SFS:
        out = run_to_file(
            [sys.executable, "tools/check_oracle.py", f"/root/testdata/{sf}"],
            os.path.join(out_dir, f"check_oracle_{sf}.txt"),
        )
        m = re.search(r"(\d+) pass, (\d+) fail, (\d+) rows-only", out)
        line = f"{sf}: {m.group(0) if m else 'NO SUMMARY LINE'}"
        summaries.append(line)
        print(line, flush=True)
        if not m or int(m.group(2)) != 0:
            ok = False

    out = run_to_file(
        [sys.executable, "tools/audit_types.py"],
        os.path.join(out_dir, "audit_types.txt"),
    )
    # audit_types' last line: "<bad> / <total> queries with non-portable ..."
    tail = out.strip().splitlines()[-1] if out.strip() else "NO OUTPUT"
    summaries.append(f"audit_types: {tail}")
    print(f"audit_types: {tail}", flush=True)
    m = re.match(r"(\d+) / (\d+) queries", tail)
    if not m or int(m.group(1)) != 0:
        ok = False

    with open(os.path.join(out_dir, "SUMMARY.txt"), "w") as f:
        f.write("\n".join(summaries) + "\n")
    print("sweep", "GREEN" if ok else "RED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
