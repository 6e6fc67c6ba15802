"""Round-7 probe: q_doc_minhash_pairs anatomy + verify-shape A/B.

Anatomy: how much of the query is the banding mapInPandas vs the exploded
relational exact-Jaccard verify (5 shuffles over (doc_id, shingle) rows).

Variant: verify candidates against per-doc DISTINCT shingle-set ARRAYS
built as a plain projection (no explode, no distinct shuffle);
|intersection| = size(array_intersect(sa, sb)) — the same integers, so
jacc is bit-identical (guide §2.3: shuffle fewer bytes / §2.4: remove
shuffles outright).

  python scripts/r7_minhash_probe.py [reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from guac_spark.session import get_spark  # noqa: E402
from guac_spark.textops import dedup  # noqa: E402
from guac_spark.textops.minhash import band_rows_df  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"


def _candidates(docs):
    bands = band_rows_df(docs, "doc_id", "text")
    buckets = (
        bands.groupBy("band", "band_key")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return (
        buckets.select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(ids, (x, i) -> "
                        "transform(slice(ids, i + 2, size(ids)), "
                        "y -> struct(least(x, y) as a, greatest(x, y) as b)))"
                    )
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )


def new_impl(docs, threshold=0.7):
    cand = _candidates(docs)
    toks = F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), F.lit(0))
    base = docs.select("doc_id", toks.alias("w")).filter(F.size("w") >= 2)
    sh_arr = F.array_distinct(
        F.expr(
            "transform(sequence(1, size(w) - 1), "
            "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
        )
    )
    sets_df = base.select("doc_id", sh_arr.alias("sh"))
    da = sets_df.select(
        F.col("doc_id").alias("a"),
        F.col("sh").alias("sha"),
        F.size("sh").cast("long").alias("na"),
    )
    db = sets_df.select(
        F.col("doc_id").alias("b"),
        F.col("sh").alias("shb"),
        F.size("sh").cast("long").alias("nb"),
    )
    return (
        cand.join(da, on="a")
        .join(db, on="b")
        .withColumn(
            "common", F.size(F.array_intersect("sha", "shb")).cast("long")
        )
        .withColumn(
            "jacc",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .filter(F.col("jacc") >= threshold)
        .select("a", "b", F.round("jacc", 6).alias("jacc"))
    )


def noop(df) -> float:
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t, 3)


def main() -> None:
    spark = get_spark(app_name="r7_minhash_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = dedup.staged_documents(dedup.load_documents(spark, SF))

    # parity at the driver correctness SFs (doc_ids unique there; at
    # sf1.0 the staged fixture's +10000/+20000 offsets collide with base
    # ids 0..49999, so BOTH shapes are ill-defined — the old relational
    # verify then groups two different docs' shingle sets under one id,
    # reporting e.g. jacc 0.859 for an exact-copy pair)
    for psf in ("sf0.001", "sf0.01", "sf0.1"):
        pdocs = dedup.staged_documents(
            dedup.load_documents(spark, f"/root/testdata/{psf}")
        )
        spark.sparkContext.setJobDescription(f"parity {psf}")
        a = sorted(map(tuple, dedup.minhash_pairs(pdocs, 0.7).collect()))
        b = sorted(map(tuple, new_impl(pdocs, 0.7).collect()))
        assert a == b, f"MISMATCH {psf} old={len(a)} new={len(b)}"
        print(f"parity ok {psf}: {len(a)} pairs identical", file=sys.stderr)

    out = {
        "sf": SF,
        "bands_only": [],
        "cand_only": [],
        "old": [],
        "new": [],
    }
    docs_count = docs.count()
    out["docs"] = docs_count
    for i in range(REPS):
        spark.sparkContext.setJobDescription(f"bands rep{i}")
        out["bands_only"].append(
            noop(band_rows_df(docs, "doc_id", "text"))
        )
        spark.sparkContext.setJobDescription(f"cand rep{i}")
        out["cand_only"].append(noop(_candidates(docs)))
        spark.sparkContext.setJobDescription(f"old rep{i}")
        out["old"].append(noop(dedup.minhash_pairs(docs, 0.7)))
        spark.sparkContext.setJobDescription(f"new rep{i}")
        out["new"].append(noop(new_impl(docs, 0.7)))
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    for k in ("bands_only", "cand_only", "old", "new"):
        out[k + "_median"] = med(out[k])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
