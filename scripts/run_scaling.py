"""Interleaved scaling runs with medians (VERDICT r1: medians + run
counts, not best-of-N).

Runs bench.py alternately at N and 4N cores (pipeline-only, replicated
corpus), reports per-leg median turns/sec and the N->4N efficiency.

Usage:
  python scripts/run_scaling.py [--repl 256] [--low 1] [--high 4] [--runs 3]
Prints one JSON line with all raw runs + medians + efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def prepare_replica(repl: int) -> str:
    """Write the replicated corpus ONCE (at full parallelism) and share
    it across every leg — replication isn't part of the measured
    pipeline, so writing it per-leg only burns wall clock. Byte-identical
    input for all legs by construction."""
    import tempfile

    base = os.environ.get("SPARK_GRAFT_TMPDIR",
                          "/dev/shm" if os.path.isdir("/dev/shm")
                          else tempfile.gettempdir())
    out_dir = os.path.join(base, f"guac_scaling_repl{repl}")
    marker = os.path.join(out_dir, "_READY")
    if os.path.exists(marker):
        return out_dir
    env = dict(os.environ, SPARK_GRAFT_REPL=str(repl),
               SPARK_GRAFT_REPLICATE_ONLY=out_dir)
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    open(marker, "w").close()
    return out_dir


def run_leg(cpus: int, repl: int, sf_dir: str | None = None) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_PIPELINE_ONLY="1",
    )
    if sf_dir is not None:
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        env["SPARK_GRAFT_REPL"] = "1"
    else:
        env["SPARK_GRAFT_REPL"] = str(repl)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=256)
    ap.add_argument("--low", type=int, default=1)
    ap.add_argument("--high", type=int, default=4)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf_shared = prepare_replica(args.repl) if args.repl > 1 else None
    lows, highs = [], []
    for i in range(args.runs):
        # interleave legs so host drift hits both equally
        print(f"run {i + 1}/{args.runs} low[{args.low}]...",
              file=sys.stderr, flush=True)
        lows.append(run_leg(args.low, args.repl, sf_shared))
        print(f"run {i + 1}/{args.runs} high[{args.high}]...",
              file=sys.stderr, flush=True)
        highs.append(run_leg(args.high, args.repl, sf_shared))

    med_low = statistics.median(d["turns_per_sec"] for d in lows)
    med_high = statistics.median(d["turns_per_sec"] for d in highs)
    eff = (med_high / med_low) / (args.high / args.low)
    print(json.dumps({
        "repl": args.repl,
        "turns": lows[0]["turns"],
        "runs": args.runs,
        "low_cpus": args.low,
        "high_cpus": args.high,
        "low_turns_per_sec_runs": [d["turns_per_sec"] for d in lows],
        "high_turns_per_sec_runs": [d["turns_per_sec"] for d in highs],
        "low_pipeline_sec_runs": [d["value"] for d in lows],
        "high_pipeline_sec_runs": [d["value"] for d in highs],
        "median_low_turns_per_sec": med_low,
        "median_high_turns_per_sec": med_high,
        "scaling_efficiency": round(eff, 3),
        "low_stage_secs": lows[-1]["stage_secs"],
        "high_stage_secs": highs[-1]["stage_secs"],
        # corpus-proportional universe evidence (r5): the pipeline's own
        # linking/LSH/CC load at this scale point
        "triples": lows[0].get("triples"),
        "equivalence_edges": lows[0].get("equivalence_edges"),
        "alias_dict_rows": lows[0].get("alias_dict_rows"),
        "cc_round_stats_low": lows[-1].get("cc_round_stats"),
        "cc_round_stats_high": highs[-1].get("cc_round_stats"),
        "triples_per_sec_runs": {
            "low": [d.get("triples_per_sec") for d in lows],
            "high": [d.get("triples_per_sec") for d in highs],
        },
    }))


if __name__ == "__main__":
    main()
