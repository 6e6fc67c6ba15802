"""Round-7 probe: equivalences stage anatomy at sf1.0 + banding A/B.

Measures the stage's sub-parts (inputs-distinct, LSH band rows, blocked
arms, union-distinct, scoring, full stage) and A/Bs the r6 lever:
re-banding 8 bands x 4 rows -> 4 bands x 8 rows (NOTES_r6 #2b: the LSH
band rows are mostly true-pair duplicates feeding the union-distinct;
J~0.9 pairs still collide in ~1.9 of 4 bands while the deterministic
prefix/suffix-5 blocks carry in-corpus recall either way).

  python scripts/r7_equiv_probe.py [reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from guac_spark import assemble, link, pipeline  # noqa: E402
from guac_spark.session import get_spark  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"


def build_links(linked, adict):
    tail = link.link_tail(link.unmatched_surfaces(linked), adict)
    aka = (
        linked.filter(F.col("kind") == "aka")
        .select(F.col("surface").alias("surface_a"), F.col("surface_b"))
        .distinct()
    )
    aka_res = assemble.resolve_surfaces(
        aka, adict, ["surface_a", "surface_b"]
    ).select(
        F.col("surface_a").alias("src"), F.col("surface_b").alias("dst")
    )
    return (
        tail.unionByName(aka_res)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def noop(df) -> float:
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t, 3)


def main() -> None:
    spark = get_spark(app_name="r7_equiv_probe")
    spark.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix="r7eq_wh_", dir="/dev/shm")
    res = pipeline.run_pipeline(spark, SF, warehouse_root=wh, engine="sql")
    linked = res.tables["mentions_linked"]
    adict = res.tables["alias_dict"]
    persons = adict.filter(F.col("kind") == "person").select(
        "alias", "entity_id"
    )

    unmatched = link.unmatched_surfaces(linked)
    out: dict = {"sf": SF}
    out["n_unmatched"] = unmatched.count()
    out["n_aliases"] = persons.count()
    cands = link.lsh_candidate_pairs(
        unmatched.select("surface").distinct(),
        persons.select("alias").distinct(),
    )
    out["n_candidates"] = cands.count()
    sb = link._minhash_bands(unmatched, "surface")
    ab = link._minhash_bands(persons.select("alias"), "alias")
    out["n_lsh_rows"] = sb.join(ab, on=["band", "band_key"]).count()

    sub = {
        "inputs_distinct": lambda: unmatched,
        "bands_surfaces": lambda: sb,
        "bands_aliases": lambda: ab,
        "candidates": lambda: cands,
        "full_stage": lambda: build_links(linked, adict),
    }
    for name, fn in sub.items():
        ts = []
        for i in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            ts.append(noop(fn()))
        out[name] = ts
        out[name + "_median"] = sorted(ts)[len(ts) // 2]

    # banding A/B: 8x4 (shipped) vs 4x8 — same N_HASHES, same sigs;
    # output equality of the FULL stage checked first
    base = sorted(map(tuple, build_links(linked, adict).collect()))
    link.N_BANDS = 4
    alt = sorted(map(tuple, build_links(linked, adict).collect()))
    out["reband_equal"] = base == alt
    out["n_links"] = len(base)
    ab_t = {"b8": [], "b4": []}
    for i in range(REPS):
        link.N_BANDS = 8
        spark.sparkContext.setJobDescription(f"b8 rep{i}")
        ab_t["b8"].append(noop(build_links(linked, adict)))
        link.N_BANDS = 4
        spark.sparkContext.setJobDescription(f"b4 rep{i}")
        ab_t["b4"].append(noop(build_links(linked, adict)))
    link.N_BANDS = 8
    out["reband"] = ab_t
    out["b8_median"] = sorted(ab_t["b8"])[len(ab_t["b8"]) // 2]
    out["b4_median"] = sorted(ab_t["b4"])[len(ab_t["b4"]) // 2]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
