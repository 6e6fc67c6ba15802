"""Interleaved A/B/N benchmark between git refs (VERDICT r3 wrong #2).

Settles whether a throughput delta between rounds is code or host state:
every ref runs from its own clean worktree, legs strictly interleaved
(A, B, C, A, B, C, ...) on byte-identical shared input, medians reported.

    python scripts/ab_interleave.py --refs c7a2a48 4a6ce39 HEAD \
        --runs 3 --cpus 4 --repl 256

Prints one JSON line: per-ref raw pipeline seconds + turns/sec, medians,
and each ref's throughput ratio vs the first ref.
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
    sha = subprocess.run(
        ["git", "-C", ROOT, "rev-parse", ref],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    path = os.path.join(ROOT, ".ab", sha[:12])
    if not os.path.isdir(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        subprocess.run(
            ["git", "-C", ROOT, "worktree", "add", "--detach", path, sha],
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
    ap.add_argument("--refs", nargs="+", required=True,
                    help="git refs, first is the comparison baseline")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--repl", type=int, default=256)
    args = ap.parse_args()

    sf = prepare_replica(args.repl)
    trees = {r: worktree(r) for r in args.refs}
    legs: dict[str, list] = {r: [] for r in args.refs}
    for i in range(args.runs):
        for r in args.refs:
            print(f"run {i + 1}/{args.runs} [{r}]...",
                  file=sys.stderr, flush=True)
            legs[r].append(run_leg(trees[r], args.cpus, sf))

    meds = {
        r: statistics.median(d["turns_per_sec"] for d in legs[r])
        for r in args.refs
    }
    base = args.refs[0]
    print(json.dumps({
        "refs": args.refs,
        "repl": args.repl,
        "cpus": args.cpus,
        "runs": args.runs,
        "turns": legs[base][0]["turns"],
        "pipeline_sec_runs": {
            r: [d["value"] for d in legs[r]] for r in args.refs
        },
        "turns_per_sec_runs": {
            r: [d["turns_per_sec"] for d in legs[r]] for r in args.refs
        },
        "median_turns_per_sec": meds,
        "ratio_vs_first": {
            r: round(meds[r] / meds[base], 4) for r in args.refs
        },
        "stage_secs_last": {
            r: legs[r][-1]["stage_secs"] for r in args.refs
        },
    }))


if __name__ == "__main__":
    main()
