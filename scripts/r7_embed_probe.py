"""Round-7 probe: q_embed_neardup (cosine_near_pairs_lsh) anatomy + A/B.

The shipped r6 shape dedups candidate pairs with dropDuplicates(["a","b"])
while each row still carries BOTH full 64-float embedding arrays plus two
norms — the dedup shuffle moves ~1 KB/row of payload to compare 16 bytes
of ids (guide §2.3 "shuffle keys and metadata instead of payloads" /
§8). The candidate variant generates ID-ONLY candidate pairs from the
bucket table, dedups those, and re-attaches the embeddings afterwards
(two joins against the small embedding relation).

Interleaved A/B (old -> new -> old -> new ...), noop sink, one session;
asserts byte-identical results first.

  python scripts/r7_embed_probe.py [reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from guac_spark.session import get_spark  # noqa: E402
from guac_spark.textops import similarity  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"


def old_impl(emb, threshold=0.99, n_bits=8, probe_hamming=1):
    """The r6 shape, verbatim (payload-carrying dedup)."""
    from itertools import combinations

    b = similarity.hyperplane_buckets(emb, n_bits=n_bits)
    l = emb.join(b, on="vec_id").select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("va"),
        similarity._norm("embedding").alias("na"),
        "bucket",
    )
    masks = [0] + [
        sum(1 << i for i in c)
        for r in range(1, probe_hamming + 1)
        for c in combinations(range(n_bits), r)
    ]
    r = emb.join(b, on="vec_id").select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("vb"),
        similarity._norm("embedding").alias("nb"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("bucket"),
    )
    return (
        l.join(r, on="bucket")
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .withColumn(
            "cos",
            similarity._dot("va", "vb") / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 6).alias("cos"))
    )


def new_impl(emb, threshold=0.99, n_bits=8, probe_hamming=1):
    """ID-only candidate dedup, embeddings attached after."""
    from itertools import combinations

    b = similarity.hyperplane_buckets(emb, n_bits=n_bits)
    masks = [0] + [
        sum(1 << i for i in c)
        for r in range(1, probe_hamming + 1)
        for c in combinations(range(n_bits), r)
    ]
    l_ids = b.select(F.col("vec_id").alias("a"), "bucket")
    r_ids = b.select(
        F.col("vec_id").alias("b"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("bucket"),
    )
    cand = (
        l_ids.join(r_ids, on="bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    ea = emb.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("va"),
        similarity._norm("embedding").alias("na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("vb"),
        similarity._norm("embedding").alias("nb"),
    )
    return (
        cand.join(ea, on="a")
        .join(eb, on="b")
        .withColumn(
            "cos",
            similarity._dot("va", "vb") / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 6).alias("cos"))
    )


def noop(df) -> float:
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t, 3)


def main() -> None:
    spark = get_spark(app_name="r7_embed_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = similarity.staged_embeddings(similarity.load_embeddings(spark, SF))

    # correctness first: byte-identical result sets at every driver
    # correctness SF (vec_ids unique there; at sf1.0 the staged fixture's
    # +10000 offset collides with base ids 10000-19999, making the OLD
    # shape's payload-carrying dropDuplicates nondeterministic — see
    # OPTIMIZATION_r07.md)
    for psf in ("sf0.001", "sf0.01", "sf0.1"):
        pemb = similarity.staged_embeddings(
            similarity.load_embeddings(spark, f"/root/testdata/{psf}")
        )
        spark.sparkContext.setJobDescription(f"parity {psf}")
        a = sorted(map(tuple, old_impl(pemb).collect()))
        bres = sorted(map(tuple, new_impl(pemb).collect()))
        assert a == bres, f"MISMATCH {psf}: old={len(a)} new={len(bres)}"
        print(f"parity ok {psf}: {len(a)} pairs identical", file=sys.stderr)

    out = {"old": [], "new": [], "sf": SF}
    out["old_pairs"] = old_impl(emb).count()
    out["new_pairs"] = new_impl(emb).count()
    for i in range(REPS):
        spark.sparkContext.setJobDescription(f"old rep{i}")
        out["old"].append(noop(old_impl(emb)))
        spark.sparkContext.setJobDescription(f"new rep{i}")
        out["new"].append(noop(new_impl(emb)))
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out["old_median"] = med(out["old"])
    out["new_median"] = med(out["new"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
