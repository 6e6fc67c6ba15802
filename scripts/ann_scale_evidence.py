"""ANN at corpus-proportional scale (VERDICT r5 missing #2 / order #4).

The sf testdata carries 2k vectors — enough for oracle-exact correctness,
not for scale evidence. This script grows a deterministic clustered
embedding corpus to >= 1M vectors (the same move r5 made for the entity
universe), then measures IVF and multi-probe-LSH ANN against the exact
brute-force ground truth:

  * recall@k by nprobe / multiprobe,
  * wall time: index BUILD (once) vs PROBE (per search config),
  * inverted-list balance for the closed-form (label-mean) quantizer vs
    the k-means-refined quantizer (the r5 A/B slot).

Corpus: nlist seeded gaussian cluster centers on the unit sphere; vector
i = normalize(center[i % nlist] + sigma * noise_i); label = its center —
the same (vec_id, embedding, label) shape as the testdata, deterministic
end-to-end (fixed numpy seeds). Queries are corpus members (the ann_*
operators hold the query out of the neighbor side themselves).

    python scripts/ann_scale_evidence.py [--n 1048576] [--nlist 128]
        [--cpus 32] [--k 10] [--queries 16]

Prints one JSON line (committed as BENCH_ann_r6.json).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DIM = 64
# cluster spread as TOTAL noise norm relative to the unit center (the
# per-dimension std is SIGMA/sqrt(DIM))
SIGMA = 1.0
# sibling-center offset within a super-cluster (see synth_corpus)
SUB_SPREAD = 0.55


def synth_corpus(path: str, n: int, nlist: int) -> None:
    """Write the deterministic clustered corpus as multi-file parquet.

    Centers are HIERARCHICAL — nlist/8 super-clusters, each with 8
    sibling centers offset by SUB_SPREAD — because isotropic gaussian
    clusters in 64-dim are almost-surely separable and make every
    quantizer look perfect (nprobe=1 recall 1.0, measured): with close
    sibling lists, a query's true neighbors spill into siblings and the
    nprobe/recall trade-off is the genuine IVF regime."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng_c = np.random.RandomState(1234)
    n_super = max(1, nlist // 8)
    supers = rng_c.normal(size=(n_super, DIM))
    supers /= np.linalg.norm(supers, axis=1, keepdims=True)
    centers = (
        supers[np.arange(nlist) % n_super]
        + SUB_SPREAD * rng_c.normal(size=(nlist, DIM)) / np.sqrt(DIM)
    )
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    os.makedirs(path, exist_ok=True)
    n_files = 16
    per = (n + n_files - 1) // n_files
    vid = 0
    for f in range(n_files):
        m = min(per, n - vid)
        if m <= 0:
            break
        rng = np.random.RandomState(5678 + f)  # per-file seed: deterministic
        ids = np.arange(vid, vid + m, dtype=np.int64)
        labels = (ids % nlist).astype(np.int32)
        vecs = centers[labels] + (SIGMA / np.sqrt(DIM)) * rng.normal(
            size=(m, DIM)
        )
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs.astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.ravel()), DIM
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(labels),
            }
        )
        pq.write_table(tbl, os.path.join(path, f"part-{f:02d}.parquet"))
        vid += m


def recall_at_k(got_rows, truth: dict[int, list[int]], k: int) -> float:
    by_q: dict[int, set] = {}
    for r in got_rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rs = [
        len(by_q.get(q, set()) & set(t[:k])) / k for q, t in truth.items()
    ]
    return round(float(np.mean(rs)), 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--nlist", type=int, default=128)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from guac_spark.session import get_spark
    from guac_spark.textops import similarity as S

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    work = os.path.join(base, f"guac_ann_n{args.n}_l{args.nlist}")
    corpus_path = os.path.join(work, "embeddings.parquet")
    if not os.path.exists(os.path.join(work, "_READY")):
        t0 = time.time()
        synth_corpus(corpus_path, args.n, args.nlist)
        open(os.path.join(work, "_READY"), "w").close()
        print(f"synth: {time.time()-t0:.1f}s", file=sys.stderr)

    spark = get_spark(app_name="ann_scale", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(corpus_path)
    # queries spread across clusters (ids 0..q-1 hit q distinct lists)
    qids = list(range(args.queries))
    out: dict = {
        "n_vectors": args.n, "nlist": args.nlist, "dim": DIM,
        "cpus": args.cpus, "k": args.k, "n_queries": args.queries,
        "sigma": SIGMA,
    }

    # --- exact ground truth ------------------------------------------------
    t0 = time.time()
    bf = S.ann_topk_bruteforce(emb, qids, args.k).collect()
    out["sec_bruteforce"] = round(time.time() - t0, 2)
    truth: dict[int, list[int]] = {}
    for r in sorted(bf, key=lambda r: (r["query_id"], r["rank"])):
        truth.setdefault(r["query_id"], []).append(r["neighbor_id"])

    # --- IVF: build once (centroids + inverted file), probe per nprobe ----
    t0 = time.time()
    cent = S.ivf_centroids(emb)
    cent.cache().count()
    idx_path = os.path.join(work, "ivf_index.parquet")
    # the inverted file IS a table at scale — materialize it once
    S.ivf_assign(emb, cent).write.mode("overwrite").parquet(idx_path)
    assigned = spark.read.parquet(idx_path)
    out["sec_ivf_build"] = round(time.time() - t0, 2)
    sizes = [
        r["c"] for r in assigned.groupBy("list_id")
        .agg(F.count("*").alias("c")).collect()
    ]
    out["ivf_list_balance"] = {
        "lists": len(sizes), "min": int(min(sizes)), "max": int(max(sizes)),
        "mean": round(float(np.mean(sizes)), 1),
        "std": round(float(np.std(sizes)), 1),
    }
    out["ivf"] = {}
    for nprobe in (1, 2, 4, 8):
        t0 = time.time()
        got = S.ann_topk_ivf(
            emb, qids, args.k, nprobe=nprobe, centroids=cent,
            assigned=assigned,
        ).collect()
        out["ivf"][f"nprobe={nprobe}"] = {
            "recall_at_k": recall_at_k(got, truth, args.k),
            "probe_sec": round(time.time() - t0, 2),
        }

    # --- k-means-refined quantizer A/B (list balance + recall) ------------
    t0 = time.time()
    cent_km = S.ivf_centroids_kmeans(emb, iters=1)
    cent_km.cache().count()
    asg_km = S.ivf_assign(emb, cent_km)
    asg_km.write.mode("overwrite").parquet(idx_path + ".km")
    asg_km = spark.read.parquet(idx_path + ".km")
    out["sec_ivf_kmeans_build"] = round(time.time() - t0, 2)
    sizes = [
        r["c"] for r in asg_km.groupBy("list_id")
        .agg(F.count("*").alias("c")).collect()
    ]
    out["ivf_km_list_balance"] = {
        "lists": len(sizes), "min": int(min(sizes)), "max": int(max(sizes)),
        "mean": round(float(np.mean(sizes)), 1),
        "std": round(float(np.std(sizes)), 1),
    }
    t0 = time.time()
    got = S.ann_topk_ivf(
        emb, qids, args.k, nprobe=4, centroids=cent_km, assigned=asg_km
    ).collect()
    out["ivf_km_nprobe4"] = {
        "recall_at_k": recall_at_k(got, truth, args.k),
        "probe_sec": round(time.time() - t0, 2),
    }

    # --- multi-probe LSH ---------------------------------------------------
    out["lsh"] = {}
    for mp in (1, 2):
        t0 = time.time()
        got = S.ann_topk_lsh(emb, qids, args.k, multiprobe=mp).collect()
        out["lsh"][f"multiprobe={mp}"] = {
            "recall_at_k": recall_at_k(got, truth, args.k),
            "sec": round(time.time() - t0, 2),
        }

    print(json.dumps(out))
    spark.stop()
    if os.environ.get("GUAC_ANN_KEEP") != "1":
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
