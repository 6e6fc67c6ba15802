"""Interleaved A/B benchmark between two git refs (VERDICT r3 wrong #2).

Settles whether a throughput delta between rounds is code or host state:
both refs run from their own clean worktrees, legs strictly interleaved
(A, B, A, B, ...) on byte-identical shared input, medians reported.

    python scripts/ab_interleave.py --a c7a2a48 --b 4a6ce39 \
        --runs 3 --cpus 4 --repl 256

Prints one JSON line: per-leg raw pipeline seconds + turns/sec, medians,
and the B/A throughput ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from run_scaling import prepare_replica  # noqa: E402


def worktree(ref: str) -> str:
    path = os.path.join(ROOT, ".ab", ref)
    if not os.path.isdir(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        subprocess.run(
            ["git", "-C", ROOT, "worktree", "add", "--detach", path, ref],
            check=True, capture_output=True,
        )
    return path


def run_leg(tree: str, cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_PIPELINE_ONLY="1",
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_REPL="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=tree,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="baseline ref (e.g. r2 tip)")
    ap.add_argument("--b", required=True, help="candidate ref (e.g. r3 tip)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--repl", type=int, default=256)
    args = ap.parse_args()

    sf = prepare_replica(args.repl)
    ta, tb = worktree(args.a), worktree(args.b)
    legs_a, legs_b = [], []
    for i in range(args.runs):
        print(f"run {i + 1}/{args.runs} A[{args.a}]...",
              file=sys.stderr, flush=True)
        legs_a.append(run_leg(ta, args.cpus, sf))
        print(f"run {i + 1}/{args.runs} B[{args.b}]...",
              file=sys.stderr, flush=True)
        legs_b.append(run_leg(tb, args.cpus, sf))

    med_a = statistics.median(d["turns_per_sec"] for d in legs_a)
    med_b = statistics.median(d["turns_per_sec"] for d in legs_b)
    print(json.dumps({
        "a_ref": args.a,
        "b_ref": args.b,
        "repl": args.repl,
        "cpus": args.cpus,
        "runs": args.runs,
        "turns": legs_a[0]["turns"],
        "a_pipeline_sec_runs": [d["value"] for d in legs_a],
        "b_pipeline_sec_runs": [d["value"] for d in legs_b],
        "a_turns_per_sec_runs": [d["turns_per_sec"] for d in legs_a],
        "b_turns_per_sec_runs": [d["turns_per_sec"] for d in legs_b],
        "median_a_turns_per_sec": med_a,
        "median_b_turns_per_sec": med_b,
        "b_over_a": round(med_b / med_a, 4),
        "a_stage_secs": legs_a[-1]["stage_secs"],
        "b_stage_secs": legs_b[-1]["stage_secs"],
    }))


if __name__ == "__main__":
    main()
