"""Round-final combined measurement: N->4N scaling legs for HEAD plus
interleaved r2-baseline legs, all in one strictly-interleaved batch on
the shared byte-identical 25.6M-turn replica.

    python scripts/final_measure.py [--baseline c7a2a48] [--runs 3]

Per round i: HEAD@local[1], HEAD@local[4], baseline@local[4].
Prints one JSON line with raw runs, medians, N->4N efficiency for HEAD,
and HEAD/baseline throughput at local[4].
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys

from ab_interleave import ROOT, run_leg, worktree  # noqa: E402
from run_scaling import prepare_replica  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default="c7a2a48")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--repl", type=int, default=256)
    args = ap.parse_args()

    head = subprocess.run(
        ["git", "-C", ROOT, "rev-parse", "HEAD"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()[:12]
    sf = prepare_replica(args.repl)
    th, tb = worktree(head), worktree(args.baseline)
    legs: dict[str, list] = {"head_c1": [], "head_c4": [], "base_c4": []}
    for i in range(args.runs):
        for name, tree, cpus in (
            ("head_c1", th, 1), ("head_c4", th, 4), ("base_c4", tb, 4),
        ):
            print(f"run {i + 1}/{args.runs} {name}...",
                  file=sys.stderr, flush=True)
            legs[name].append(run_leg(tree, cpus, sf))

    med = {
        k: statistics.median(d["turns_per_sec"] for d in v)
        for k, v in legs.items()
    }
    print(json.dumps({
        "head": head,
        "baseline": args.baseline,
        "repl": args.repl,
        "runs": args.runs,
        "turns": legs["head_c1"][0]["turns"],
        "pipeline_sec_runs": {
            k: [d["value"] for d in v] for k, v in legs.items()
        },
        "turns_per_sec_runs": {
            k: [d["turns_per_sec"] for d in v] for k, v in legs.items()
        },
        "median_turns_per_sec": med,
        "scaling_efficiency_1_to_4": round(
            (med["head_c4"] / med["head_c1"]) / 4.0, 3
        ),
        "head_over_baseline_c4": round(
            med["head_c4"] / med["base_c4"], 4
        ),
        "stage_secs_last": {
            k: v[-1]["stage_secs"] for k, v in legs.items()
        },
    }))


if __name__ == "__main__":
    main()
