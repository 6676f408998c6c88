"""Scaling-efficiency evidence for the north rule (≥0.8 from N to 4N):
run the identical flagship job at local[8] and local[32] on the same
input in separate JVMs, report throughput at both + efficiency.

Usage: python tools/scaling_bench.py [--replicate 48] [--sf-dir ...]
Appends a measured-results block to BASELINE.md (replacing any prior
block between the markers).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK_A = "<!-- scaling-results:begin -->"
MARK_B = "<!-- scaling-results:end -->"


def run_at(cores: int, replicate: int, sf_dir: str, runs: int,
           text_repeat: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "flagship_run.py"),
         "--cores", str(cores), "--replicate", str(replicate),
         "--sf-dir", sf_dir, "--runs", str(runs),
         "--text-repeat", str(text_repeat)],
        capture_output=True, text=True, check=True, cwd=ROOT, timeout=3600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=48)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--n4", type=int, default=32)
    ap.add_argument("--text-repeat", type=int, default=20,
                    help="page size multiplier (20 ≈ 10 KB web-average pages)")
    args = ap.parse_args()

    r8 = run_at(args.n, args.replicate, args.sf_dir, args.runs, args.text_repeat)
    r32 = run_at(args.n4, args.replicate, args.sf_dir, args.runs, args.text_repeat)
    eff = (r32["pages_per_sec"] / r8["pages_per_sec"]) / (args.n4 / args.n)

    summary = {
        "n_cores": args.n, "n4_cores": args.n4,
        "pages": r8["pages"],
        "sec_n": r8["sec"], "sec_n4": r32["sec"],
        "pages_per_sec_n": r8["pages_per_sec"],
        "pages_per_sec_n4": r32["pages_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "meets_0_8": eff >= 0.8,
    }
    print(json.dumps(summary))
    # persisted for bench.py to attach to its driver-recorded JSON line
    with open(os.path.join(ROOT, "tools", "scaling_latest.json"), "w") as fh:
        json.dump(summary, fh)

    block = f"""{MARK_A}
## Measured scaling results ({datetime.date.today().isoformat()})

Same flagship job (documents → pages synth → transcode+extract via
mapInArrow → window features → backward as-of join), identical input
({r8['pages']:,} pages × ~{args.text_repeat // 2} KB html from
{args.sf_dir}, web-realistic page size), two parallelism levels,
separate JVMs, warm-up excluded, best of {args.runs} timed runs:

| Config | Wall (s) | Throughput (pages/s) |
| --- | --- | --- |
| `local[{args.n}]` (N) | {r8['sec']} | {r8['pages_per_sec']:,} |
| `local[{args.n4}]` (4N) | {r32['sec']} | {r32['pages_per_sec']:,} |

**Scaling efficiency (thr_4N / thr_N) / 4 = {eff:.3f}** — criterion ≥ 0.8: {"**MET**" if eff >= 0.8 else "**NOT MET**"}.

All runs N: {r8['all_runs_sec']} · 4N: {r32['all_runs_sec']}
{MARK_B}"""

    path = os.path.join(ROOT, "BASELINE.md")
    txt = open(path).read()
    if MARK_A in txt:
        txt = re.sub(re.escape(MARK_A) + r".*?" + re.escape(MARK_B), block,
                     txt, flags=re.S)
    else:
        txt = txt.rstrip() + "\n\n" + block + "\n"
    open(path, "w").write(txt)


if __name__ == "__main__":
    main()
