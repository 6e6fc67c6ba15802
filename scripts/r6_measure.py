"""Round-6 unified measurement batch: ONE strictly-interleaved batch on
the shared 25.6M-turn replica (cross-round numbers are only valid from
interleaved legs — host drift measured ~23% between rounds):

  * head_over_r5_c4           — r5 (63cafe1) vs HEAD, both on the grown
    universe: the code delta of the r6 equivalences/cc work (vectorized
    Jaccard, K=5 blocks, single-agg argmax, cc shallow-graph path).
  * scaling_efficiency_1_to_4 — HEAD at local[1] vs local[4] on the
    grown universe: the north-rule two-parallelism evidence.

Legs also record per-leg turns / alias_dict / equivalence-edge counts:
the r6 universe fix (gen_pid residue union) could in principle change
the replica corpus vs r5 — identical counts prove the legs stayed
byte-comparable.

    python scripts/r6_measure.py [--r5 63cafe1] [--runs 3] [--repl 256]
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

from ab_interleave import worktree  # noqa: E402
from run_scaling import prepare_replica  # noqa: E402


def run_leg(tree: str, cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_PIPELINE_ONLY="1",
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_REPL="1",
    )
    env.pop("GUAC_SPARK_UNIVERSE", None)
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=tree,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--r5", default="63cafe1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--repl", type=int, default=256)
    args = ap.parse_args()

    head = subprocess.run(
        ["git", "-C", ROOT, "rev-parse", "HEAD"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()[:12]
    sf = prepare_replica(args.repl)
    th, t5 = worktree(head), worktree(args.r5)
    plan = {
        "r5_c4": (t5, 4),
        "head_c4": (th, 4),
        "head_c1": (th, 1),
    }
    legs: dict[str, list] = {k: [] for k in plan}
    for i in range(args.runs):
        for name, (tree, cpus) in plan.items():
            print(f"run {i + 1}/{args.runs} {name}...",
                  file=sys.stderr, flush=True)
            legs[name].append(run_leg(tree, cpus, sf))

    med = {
        k: statistics.median(d["turns_per_sec"] for d in v)
        for k, v in legs.items()
    }
    print(json.dumps({
        "head": head,
        "r5": args.r5,
        "repl": args.repl,
        "runs": args.runs,
        "turns_per_leg": {k: v[0]["turns"] for k, v in legs.items()},
        "pipeline_sec_runs": {
            k: [d["value"] for d in v] for k, v in legs.items()
        },
        "turns_per_sec_runs": {
            k: [d["turns_per_sec"] for d in v] for k, v in legs.items()
        },
        "median_turns_per_sec": med,
        "head_over_r5_c4": round(med["head_c4"] / med["r5_c4"], 4),
        "scaling_efficiency_1_to_4": round(
            (med["head_c4"] / med["head_c1"]) / 4.0, 3
        ),
        "stage_secs_last": {
            k: v[-1]["stage_secs"] for k, v in legs.items()
        },
        "per_leg_universe": {
            k: {
                "triples": v[-1].get("triples"),
                "equivalence_edges": v[-1].get("equivalence_edges"),
                "alias_dict_rows": v[-1].get("alias_dict_rows"),
            } for k, v in legs.items()
        },
        "head_cc_round_stats_c4":
            legs["head_c4"][-1].get("cc_round_stats"),
        "head_triples_per_sec_runs": {
            "c1": [d.get("triples_per_sec") for d in legs["head_c1"]],
            "c4": [d.get("triples_per_sec") for d in legs["head_c4"]],
        },
    }))


if __name__ == "__main__":
    main()
