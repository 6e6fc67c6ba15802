"""Round-5 unified measurement batch: ONE strictly-interleaved batch on
the shared byte-identical 25.6M-turn replica settles all three round-5
claims without cross-batch host drift (NOTES_r4: cross-round numbers are
only valid from interleaved legs):

  * head_over_r4_fixed_c4   — r4 (9845e3a) vs HEAD, both on the r1-r4
    fixed universe (GUAC_SPARK_UNIVERSE=fixed pins np=25/nt=20 so the
    derived corpus is byte-identical) — the like-for-like code delta
    including the span-in-identity feature cost.
  * grown_over_fixed_c4     — HEAD fixed vs HEAD grown universe at the
    same parallelism: the measured cost of corpus-proportional entity
    linking/LSH/CC (VERDICT r4 missing #1's load, now on by default).
  * scaling_efficiency_1_to_4 — HEAD grown at local[1] vs local[4]:
    the north-rule two-parallelism evidence, now with the pipeline's
    linking/CC carrying sf-proportional load.

    python scripts/r5_measure.py [--r4 9845e3a] [--runs 3] [--repl 256]

Prints one JSON line with raw runs, medians, ratios, stage seconds, and
the grown legs' equivalence/CC observability fields.
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


def run_leg(tree: str, cpus: int, sf_dir: str, universe: str | None) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_PIPELINE_ONLY="1",
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_REPL="1",
    )
    env.pop("GUAC_SPARK_UNIVERSE", None)
    if universe:
        env["GUAC_SPARK_UNIVERSE"] = universe
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=tree,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--r4", default="9845e3a")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--repl", type=int, default=256)
    args = ap.parse_args()

    head = subprocess.run(
        ["git", "-C", ROOT, "rev-parse", "HEAD"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()[:12]
    sf = prepare_replica(args.repl)
    th, t4 = worktree(head), worktree(args.r4)
    # leg name -> (tree, cpus, universe)
    plan = {
        "r4_c4": (t4, 4, None),
        "head_fixed_c4": (th, 4, "fixed"),
        "head_grown_c4": (th, 4, None),
        "head_grown_c1": (th, 1, None),
    }
    legs: dict[str, list] = {k: [] for k in plan}
    for i in range(args.runs):
        for name, (tree, cpus, uni) in plan.items():
            print(f"run {i + 1}/{args.runs} {name}...",
                  file=sys.stderr, flush=True)
            legs[name].append(run_leg(tree, cpus, sf, uni))

    med = {
        k: statistics.median(d["turns_per_sec"] for d in v)
        for k, v in legs.items()
    }
    grown = legs["head_grown_c4"][-1]
    print(json.dumps({
        "head": head,
        "r4": args.r4,
        "repl": args.repl,
        "runs": args.runs,
        "turns": legs["r4_c4"][0]["turns"],
        "pipeline_sec_runs": {
            k: [d["value"] for d in v] for k, v in legs.items()
        },
        "turns_per_sec_runs": {
            k: [d["turns_per_sec"] for d in v] for k, v in legs.items()
        },
        "median_turns_per_sec": med,
        "head_over_r4_fixed_c4": round(
            med["head_fixed_c4"] / med["r4_c4"], 4
        ),
        "grown_over_fixed_c4": round(
            med["head_grown_c4"] / med["head_fixed_c4"], 4
        ),
        "scaling_efficiency_1_to_4": round(
            (med["head_grown_c4"] / med["head_grown_c1"]) / 4.0, 3
        ),
        "stage_secs_last": {
            k: v[-1]["stage_secs"] for k, v in legs.items()
        },
        "grown_triples": grown.get("triples"),
        "grown_equivalence_edges": grown.get("equivalence_edges"),
        "grown_alias_dict_rows": grown.get("alias_dict_rows"),
        "grown_cc_round_stats_c4": grown.get("cc_round_stats"),
        "grown_cc_round_stats_c1":
            legs["head_grown_c1"][-1].get("cc_round_stats"),
        "grown_triples_per_sec_runs": {
            "c1": [d.get("triples_per_sec")
                   for d in legs["head_grown_c1"]],
            "c4": [d.get("triples_per_sec")
                   for d in legs["head_grown_c4"]],
        },
    }))


if __name__ == "__main__":
    main()
