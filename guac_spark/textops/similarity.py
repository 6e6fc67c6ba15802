"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (all JVM-side: zip_with +
aggregate fold, no Python); the LSH-bucketed variant is the 100 TB path —
random-hyperplane signatures block the corpus so each query probes only its
bucket (and optional neighboring buckets), turning O(n·q) into
O(n/2^bits · q) with recall controlled by the number of probe tables.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(col: str):
    return F.sqrt(
        F.aggregate(
            F.col(col),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def staged_embeddings(emb: DataFrame) -> DataFrame:
    """embeddings ∪ scaled copies (vec_id%10==0, ×1.001) — deterministic
    near-duplicates (cosine ≈ 1.0) for the near-dup oracle, since the
    natural corpus is near-orthogonal (max pairwise cosine ≈ 0.51)."""
    base = emb.select("vec_id", "embedding")
    near = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * 1.001).cast("float")
        ).alias("embedding"),
    )
    return base.unionByName(near)


def cosine_near_pairs(emb: DataFrame, threshold: float = 0.99) -> DataFrame:
    """Exact near-dup pairs (a < b) with cosine >= threshold.

    Brute-force O(n²) — correct baseline for oracle checks; at scale,
    bucket with `hyperplane_buckets` first and run this within buckets.
    Norms are precomputed once per side so the crossed plan only pays the
    dot product.
    """
    l = emb.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("va"),
        _norm("embedding").alias("na"),
    )
    r = emb.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("vb"),
        _norm("embedding").alias("nb"),
    )
    return (
        l.crossJoin(r)
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", _dot("va", "vb") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 6).alias("cos"))
    )


def ann_topk_bruteforce(
    emb: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cos).

    Queries broadcast against the corpus — one scan of the corpus total,
    not one per query; rank via window with deterministic tie-break.
    """
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("vq"),
        _norm("embedding").alias("nq"),
    )
    c = emb.filter(~F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("vc"),
        _norm("embedding").alias("nc"),
    )
    scored = c.join(F.broadcast(q)).withColumn(
        "cos", _dot("vq", "vc") / (F.col("nq") * F.col("nc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("cos", 6).alias("cos"))
    )


# --- LSH-bucketed ANN (the scale path) --------------------------------------

def hyperplane_planes(
    n_bits: int = 8, seed: int = 11, dim: int = 64
) -> np.ndarray:
    """Deterministic integer hyperplanes derived from md5 — the same
    construction is renderable as SQL literals, so the DuckDB oracle
    computes byte-identical buckets (NOTES_r1 #4: the md5-integer trick
    proven for simhash, applied to ANN). plane[i][d] in [-1000, 1000]."""
    import hashlib

    vals = np.empty((n_bits, dim), dtype=np.int64)
    for i in range(n_bits):
        for d in range(dim):
            h = hashlib.md5(f"plane:{seed}:{i}:{d}".encode()).digest()
            vals[i, d] = int.from_bytes(h[:8], "big") % 2001 - 1000
    return vals


def hyperplane_buckets(
    emb: DataFrame, n_bits: int = 8, seed: int = 11, dim: int = 64
) -> DataFrame:
    """Random-hyperplane signature per vector: (vec_id, bucket).

    Deterministic planes (md5-derived ints, see hyperplane_planes);
    computed in one Arrow pass. Sign boundaries are robust: |dot| is
    O(1000·sqrt(dim)) against ~1e-9 float error.
    """
    planes = hyperplane_planes(n_bits, seed, dim).astype(np.float64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = (mat @ planes.T) > 0  # [n, n_bits]
            bucket = bits @ (1 << np.arange(n_bits))
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "bucket": bucket.astype(np.int64)}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        gen, "vec_id long, bucket long"
    )


def _adaptive_n_bits(n_rows: int, target_bucket: int = 2) -> int:
    """Signature width sized to the corpus: ~target_bucket vectors per
    bucket keeps the within-bucket candidate volume ~O(n) at any scale
    (a constant 8 bits = 256 buckets was tuned to a 2k-vector corpus;
    at 22k staged vectors it admitted 9.0M candidate pairs — measured
    r7, ~12s of the query — where 13 bits admit ~0.4M). Clamped to
    [8, 16]: fewer than 8 bits never helps, and past 16 the per-row
    probe fan-out (1 + n_bits masks at hamming 1) outgrows the bucket
    savings for any corpus this operator would see in one partition."""
    import math

    if n_rows <= 0:
        return 8
    return min(16, max(8, int(math.floor(math.log2(
        max(n_rows / float(target_bucket), 1.0))))))


def cosine_near_pairs_lsh(
    emb: DataFrame, threshold: float = 0.99, n_bits: int | None = None,
    probe_hamming: int = 1
) -> DataFrame:
    """Near-dup pairs via hyperplane bucketing — the 100 TB path.

    Candidates = pairs whose signatures agree within `probe_hamming` bits
    (same bucket, plus neighbor-bucket probes for boundary recall); each
    candidate is verified with the exact cosine, so precision is 1.0.
    The all-pairs work is confined to within-bucket joins: O(sum of
    bucket^2) instead of O(n^2). cosine_near_pairs (brute force) is the
    recall ground truth; a true near-dup (cosine ~ 1) is near-colinear,
    so its two vectors share every signature bit except for dots within
    float error of a plane — probe_hamming=1 covers that boundary, and
    the property is independent of n_bits, so the adaptive width below
    cannot cost recall on scalar-copy near-dups (r7: outputs verified
    identical at n_bits 8/12/13/14 on every driver SF).

    n_bits=None (default) sizes the signature to the corpus
    (_adaptive_n_bits) — one count() job, the snapshot-summary lookup at
    cluster scale.

    Physical shape (r7, guide §2.3/§8): candidate (a, b) ID pairs are
    generated and deduplicated from the bucket table alone — the r6
    shape ran dropDuplicates on rows still carrying BOTH 64-float
    embeddings plus norms, shuffling ~1 KB/row of payload to compare 16
    bytes of ids — and the embeddings are attached to the surviving
    pairs afterwards (two joins against the embedding relation;
    broadcast at bench scale, a plain id-keyed hash join at 100 TB).
    Requires unique vec_ids (every driver SF; GUAC ids are unique by
    construction) — under duplicate ids the old payload dedup silently
    picked an arbitrary embedding per pair, which is strictly worse."""
    from itertools import combinations

    if n_bits is None:
        n_bits = _adaptive_n_bits(emb.count())
    b = hyperplane_buckets(emb, n_bits=n_bits)
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
        .dropDuplicates(["a", "b"])  # multi-probe overlap — ids only
    )
    ea = emb.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("va"),
        _norm("embedding").alias("na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("vb"),
        _norm("embedding").alias("nb"),
    )
    return (
        cand.join(ea, on="a")
        .join(eb, on="b")
        .withColumn("cos", _dot("va", "vb") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 6).alias("cos"))
    )


def ann_topk_lsh(
    emb: DataFrame, query_ids: list[int], k: int = 5, n_bits: int = 8,
    multiprobe: int = 1
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's probe buckets.

    Multi-probe: probe every bucket within Hamming distance `multiprobe`
    of the query's signature — sum(C(n_bits, r) for r <= multiprobe)
    probes per query (9 at n_bits=8/multiprobe=1, 37 at multiprobe=2), vs
    scanning the full corpus for brute force. Recall increases
    monotonically with `multiprobe`; ann_topk_bruteforce is the
    correctness baseline.
    """
    from itertools import combinations

    b = hyperplane_buckets(emb, n_bits=n_bits)
    with_b = emb.join(b, on="vec_id")
    q0 = with_b.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("vq"),
        _norm("embedding").alias("nq"),
        "bucket",
    )
    if multiprobe >= 1:
        masks = [0] + [
            sum(1 << i for i in c)
            for r in range(1, multiprobe + 1)
            for c in combinations(range(n_bits), r)
        ]
        probes = F.array(
            *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks]
        )
        q = q0.select(
            "query_id", "vq", "nq", F.explode(probes).alias("bucket")
        )
    else:
        q = q0
    c = with_b.filter(~F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("vc"),
        _norm("embedding").alias("nc"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .withColumn("cos", _dot("vq", "vc") / (F.col("nq") * F.col("nc")))
        .dropDuplicates(["query_id", "neighbor_id"])  # multi-probe overlap
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("cos", 6).alias("cos"))
    )


# --- IVF ANN (inverted-file index: coarse quantizer + probed lists) ---------

def ivf_centroids(emb: DataFrame) -> DataFrame:
    """Coarse quantizer: one centroid vector per inverted list.

    (list_id int, cvec array<double>) — per-label mean, rounded to 6 dp
    BEFORE any downstream use so assignment and probing run on exactly
    the same quantizer in every engine (the oracle mirrors the rounding;
    IVF centroids are approximate by design, so quantizing the quantizer
    loses nothing). The quantizer is pluggable: k-means would slot in
    here — each Lloyd step is one more groupBy pass over this same
    shape — but a deterministic closed-form quantizer keeps the operator
    oracle-checkable end-to-end.

    Relational build (posexplode + groupBy): one pass, fully JVM, scales
    to any corpus; the output is nlist rows — driver/broadcast-sized by
    construction (FAISS holds IVF centroids in RAM the same way).
    """
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("cv"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                lambda s: s["cv"],
            ).alias("cvec")
        )
        .select(F.col("label").cast("int").alias("list_id"), "cvec")
    )


def _cos_cols(v: str, cv: str):
    return _dot(v, cv) / (_norm(v) * _norm(cv))


def ivf_centroids_kmeans(emb: DataFrame, iters: int = 1) -> DataFrame:
    """Lloyd-refined coarse quantizer: per-label means as deterministic
    init, then `iters` k-means steps (assign → re-mean), each step's
    centroids rounded to 6 dp so both engines iterate on the identical
    quantizer (same contract as ivf_centroids; the oracle mirrors the
    full chain). Lists that lose every member simply drop out — probing
    and assignment only ever reference surviving centroids.

    Each Lloyd step is two passes over the corpus, both already the
    scale shapes used elsewhere: assignment = broadcast × algebraic max
    (ivf_assign — no corpus window), re-mean = posexplode + groupBy
    partial aggregation. iters stays small by design (IVF coarse
    quantizers converge in a handful of steps; FAISS defaults to 10 on
    a SAMPLE — at 100 TB the training pass would run on a sampled
    fraction, which slots in here as a .sample() before the loop).
    """
    cent = ivf_centroids(emb)
    for _ in range(iters):
        a = ivf_assign(emb, cent)
        cent = (
            emb.join(a, on="vec_id")
            .select("list_id", F.posexplode("embedding").alias("dim", "x"))
            .groupBy("list_id", "dim")
            .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("cv"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                    lambda s: s["cv"],
                ).alias("cvec")
            )
        )
    return cent


def ivf_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Inverted-list assignment: (vec_id, list_id) — nearest centroid by
    cosine, ties to the smallest list_id.

    Shape for 100 TB: corpus × broadcast(nlist centroids) scores every
    vector against every centroid with zero shuffle, and the argmax is a
    plain algebraic max over struct(cos, -list_id) — partial-aggregated
    map-side, so the only exchange carries one row per vector. No window
    (a per-vec_id window would sort-shuffle nlist× the corpus). At scale
    the assigned table IS the inverted file — write it partitioned or
    bucketed by list_id and each probe reads only its lists.
    """
    # norms precomputed ONCE per side (r7): _cos_cols re-evaluated
    # _norm(v) and _norm(cvec) for every (vector, centroid) pair — at
    # 20k vectors x nlist centroids that folded each 64-dim array 3x per
    # pair; the quotient nv*ncv keeps the original operand order so cos
    # is bit-identical (same doubles, same argmax, oracle unchanged)
    e = emb.select(
        F.col("vec_id"),
        F.col("embedding").alias("v"),
        _norm("embedding").alias("nv"),
    )
    c = cent.select("list_id", "cvec", _norm("cvec").alias("ncv"))
    scored = (
        e.join(F.broadcast(c))
        .select(
            "vec_id",
            (_dot("v", "cvec") / (F.col("nv") * F.col("ncv"))).alias("cos"),
            F.col("list_id"),
        )
    )
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos"), (-F.col("list_id")).alias("neg")))
        .alias("m")
    )
    return best.select(
        "vec_id", (-F.col("m.neg")).cast("int").alias("list_id")
    )


def ann_topk_ivf(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 3,
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: (query_id, neighbor_id, rank, cos).

    Classic inverted-file search: the corpus is assigned to nlist
    disjoint lists by nearest centroid (ivf_assign); each query probes
    only its `nprobe` nearest lists and runs the exact cosine inside
    them. Cost per query drops from O(n) to O(n·nprobe/nlist) expected;
    recall rises monotonically with nprobe, and nprobe = nlist
    reproduces ann_topk_bruteforce exactly (pytest-pinned).
    ann_topk_lsh is the hash-blocked alternative — IVF trades its
    data-dependent quantizer (better list balance on clustered corpora)
    for the training pass.

    Lists are disjoint (one list per vector), so probe hits need no
    dedup — unlike multi-probe LSH.

    `centroids` plugs in an alternative coarse quantizer (e.g.
    ivf_centroids_kmeans) — assignment and probing always use the SAME
    centroid set, whatever produced it. `assigned` plugs in a
    MATERIALIZED inverted file (vec_id, list_id) built from those same
    centroids: at scale the index is written once (bucketed by list_id)
    and reused across every query batch instead of re-assigning the
    corpus per search — scripts/ann_scale_evidence.py measures exactly
    that split (build once, probe per nprobe).
    """
    cent = ivf_centroids(emb) if centroids is None else centroids
    if assigned is None:
        assigned = ivf_assign(emb, cent)
    q0 = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("vq"),
        _norm("embedding").alias("nq"),
    )
    # probe selection: queries × broadcast centroids, top-nprobe lists.
    # The window is per-QUERY over nlist rows — query-set sized, never
    # corpus sized.
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("ccos"), F.asc("list_id")
    )
    probes = (
        q0.join(F.broadcast(cent))
        .withColumn("ccos", _cos_cols("vq", "cvec"))
        .withColumn("pr", F.row_number().over(w_probe))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "vq", "nq", "list_id")
    )
    c = (
        emb.filter(~F.col("vec_id").isin(query_ids))
        .join(assigned, on="vec_id")
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("vc"),
            _norm("embedding").alias("nc"),
            "list_id",
        )
    )
    scored = c.join(F.broadcast(probes), on="list_id").withColumn(
        "cos", _dot("vq", "vc") / (F.col("nq") * F.col("nc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("cos", 6).alias("cos"))
    )


def label_centroids(emb: DataFrame) -> DataFrame:
    """(label, dim, centroid): per-cluster mean vector, relationally —
    posexplode + groupBy, fully JVM-side, scales to any corpus size."""
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid"))
    )
