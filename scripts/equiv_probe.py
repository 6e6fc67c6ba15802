"""Isolate the equivalences stage's remaining cost at the headline scale
point, and A/B the aka-arm dedup placement (early distinct of surface
pairs before resolution vs r6-HEAD's resolve-then-distinct).

    python scripts/equiv_probe.py [--repl 256] [--cpus 4] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from run_scaling import prepare_replica  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=256)
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from guac_spark import assemble, link, pipeline
    from guac_spark.session import get_spark

    sf_dir = prepare_replica(args.repl)
    spark = get_spark(app_name="equiv_probe", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    wh = os.path.join(
        os.path.dirname(sf_dir), f"guac_probe_wh_repl{args.repl}"
    )
    res = pipeline.run_pipeline(spark, sf_dir, warehouse_root=wh,
                                resume=True)
    linked = res.tables["mentions_linked"]
    adict = res.tables["alias_dict"]
    out: dict = {"repl": args.repl, "cpus": args.cpus}

    def tail_arm():
        return link.link_tail(link.unmatched_surfaces(linked), adict)

    def aka_raw():
        return linked.filter(F.col("kind") == "aka").select(
            F.col("surface").alias("surface_a"), F.col("surface_b")
        )

    def links_current():
        aka_res = assemble.resolve_surfaces(
            aka_raw(), adict, ["surface_a", "surface_b"]
        ).select(
            F.col("surface_a").alias("src"), F.col("surface_b").alias("dst")
        )
        return (
            tail_arm().unionByName(aka_res)
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    def links_early_distinct():
        aka_res = assemble.resolve_surfaces(
            aka_raw().distinct(), adict, ["surface_a", "surface_b"]
        ).select(
            F.col("surface_a").alias("src"), F.col("surface_b").alias("dst")
        )
        return (
            tail_arm().unionByName(aka_res)
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    # sub-step isolation (once): raw aka volume, distinct pair volume,
    # tail-arm wall
    t0 = time.time()
    out["aka_rows"] = aka_raw().count()
    out["sec_aka_count"] = round(time.time() - t0, 2)
    t0 = time.time()
    out["aka_distinct_pairs"] = aka_raw().distinct().count()
    out["sec_aka_distinct"] = round(time.time() - t0, 2)
    t0 = time.time()
    out["tail_links"] = tail_arm().count()
    out["sec_tail_arm"] = round(time.time() - t0, 2)

    shapes = {"current": links_current, "early_distinct": links_early_distinct}
    legs: dict[str, list[float]] = {k: [] for k in shapes}
    counts: dict[str, int] = {}
    for i in range(args.runs):
        for name, fn in shapes.items():
            t0 = time.time()
            counts[name] = fn().count()
            legs[name].append(round(time.time() - t0, 2))
            print(f"run {i+1} {name}: {legs[name][-1]}s",
                  file=sys.stderr, flush=True)
    out["runs"] = legs
    out["medians"] = {k: statistics.median(v) for k, v in legs.items()}
    out["equivalence_counts"] = counts
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
