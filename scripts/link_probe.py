"""Instrument the equivalences stage: candidate volume per blocking arm.

VERDICT r5 order #1: before pruning, measure where the candidates (and
the wall time) of `link.lsh_candidate_pairs` actually come from at a
corpus-proportional universe. Runs the pipeline (resumable warehouse
keyed by repl) up to mentions_linked, then counts each arm's candidate
pairs and times candidate generation vs scoring.

    python scripts/link_probe.py [--repl 64] [--cpus 4]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from run_scaling import prepare_replica  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from guac_spark import link, pipeline
    from guac_spark.session import get_spark

    sf_dir = prepare_replica(args.repl)
    spark = get_spark(app_name="link_probe", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    wh = os.path.join(
        os.path.dirname(sf_dir), f"guac_probe_wh_repl{args.repl}"
    )
    res = pipeline.run_pipeline(spark, sf_dir, warehouse_root=wh,
                                resume=True)
    linked = res.tables["mentions_linked"]
    adict = res.tables["alias_dict"]

    out: dict = {"repl": args.repl, "cpus": args.cpus,
                 "resumed": not res.stages_run}

    t0 = time.time()
    unmatched = link.unmatched_surfaces(linked).cache()
    out["n_unmatched"] = unmatched.count()
    persons = (
        adict.filter(F.col("kind") == "person")
        .select("alias").distinct().cache()
    )
    out["n_person_aliases"] = persons.count()
    out["sec_inputs"] = round(time.time() - t0, 2)

    # per-arm candidate counts (each arm evaluated in isolation)
    t0 = time.time()
    sb = link._minhash_bands(unmatched, "surface")
    ab = link._minhash_bands(persons, "alias")
    lsh = (
        sb.join(ab, on=["band", "band_key"])
        .select("surface", "alias")
    )
    out["cand_lsh_raw"] = lsh.count()
    out["sec_lsh"] = round(time.time() - t0, 2)

    def blocked(k_expr):
        pb_s = unmatched.select(
            "surface", k_expr("surface").alias("blk"),
            (F.length("surface") / 4).cast("int").alias("lb"),
        )
        pb_a = persons.select(
            "alias", k_expr("alias").alias("blk"),
            (F.length("alias") / 4).cast("int").alias("lb"),
        )
        return (
            pb_s.join(pb_a, on=["blk"])
            .filter(F.abs(pb_s["lb"] - pb_a["lb"]) <= 1)
            .select("surface", "alias")
        )

    t0 = time.time()
    out["cand_pfx4"] = blocked(lambda c: F.substring(c, 1, 4)).count()
    out["sec_pfx4"] = round(time.time() - t0, 2)
    t0 = time.time()
    out["cand_sfx4"] = blocked(lambda c: F.substring(c, -4, 4)).count()
    out["sec_sfx4"] = round(time.time() - t0, 2)

    # longer deterministic keys (prune candidates, recall preserved for
    # append-tails as long as every alias is >= k chars)
    for k in (6, 8):
        t0 = time.time()
        out[f"cand_pfx{k}"] = blocked(
            lambda c, k=k: F.substring(c, 1, k)).count()
        out[f"cand_sfx{k}"] = blocked(
            lambda c, k=k: F.substring(c, -k, k)).count()
        out[f"sec_blk{k}"] = round(time.time() - t0, 2)

    t0 = time.time()
    cands = link.lsh_candidate_pairs(unmatched, persons).cache()
    out["cand_union_distinct"] = cands.count()
    out["sec_cands_union"] = round(time.time() - t0, 2)

    t0 = time.time()
    scored = cands.withColumn(
        "jacc", link.jaccard_udf()(F.col("surface"), F.col("alias"))
    ).filter(F.col("jacc") >= F.lit(link.JACCARD_THRESHOLD))
    out["n_scored_hits"] = scored.count()
    out["sec_score"] = round(time.time() - t0, 2)
    cands.unpersist()

    t0 = time.time()
    out["n_tail_links"] = link.link_tail(unmatched, adict).count()
    out["sec_link_tail_e2e"] = round(time.time() - t0, 2)

    out["alias_len_min"] = persons.select(
        F.min(F.length("alias"))).first()[0]
    out["stage_secs_pipeline"] = res.stage_secs
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
