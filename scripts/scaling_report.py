"""Compute scaling efficiency from two bench JSON lines.

Usage: python scripts/scaling_report.py low.json high.json
(low = N cores, high = 4N cores). Prints a markdown table row set.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    low = json.load(open(sys.argv[1]))
    high = json.load(open(sys.argv[2]))
    assert high["cpus"] == 4 * low["cpus"], "need N vs 4N"
    eff = (high["turns_per_sec"] / low["turns_per_sec"]) / 4
    print(f"| parallelism | turns | pipeline sec | turns/sec | triples/sec |")
    print(f"|---|---|---|---|---|")
    for d in (low, high):
        print(
            f"| local[{d['cpus']}] | {d['turns']:,} | {d['value']:.1f} "
            f"| {d['turns_per_sec']:,.0f} | {d['triples_per_sec']:,.0f} |"
        )
    print()
    print(
        f"**Scaling efficiency local[{low['cpus']}] → local[{high['cpus']}] "
        f"(N → 4N): {eff:.2f}**"
    )


if __name__ == "__main__":
    main()
