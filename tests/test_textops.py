"""Training-data operators: dedup recall, simhash, ANN recall, multimodal."""

from __future__ import annotations

from pyspark.sql import functions as F

from guac_spark.textops import dedup, multimodal, similarity
from tests.conftest import SF_SMALL


def test_minhash_equals_relational(spark):
    docs = dedup.staged_documents(dedup.load_documents(spark, SF_SMALL))
    lsh = {
        (r["a"], r["b"]) for r in dedup.minhash_pairs(docs, 0.7).collect()
    }
    exact = {
        (r["a"], r["b"])
        for r in dedup.jaccard_pairs_relational(docs, 0.7, n=2).collect()
    }
    assert lsh == exact
    # the staged near-copies (id+10000) must all be found
    staged = {r["doc_id"] for r in docs.filter("doc_id >= 20000").collect()}
    near = {a for a, b in exact if b >= 10000 and b < 20000} | {
        b - 10000 for a, b in exact if 10000 <= b < 20000
    }
    assert len(near) > 0


def test_vectorized_minhash_matches_scalar_signature():
    import numpy as np

    from guac_spark.textops import minhash as mh

    a, b = mh.hash_family(64)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one",
        "",
        "repeat repeat repeat token",
        "a b c d e f g h i j k l",
    ]
    # scalar contract: per-doc signature over the shingle SET
    want = np.stack([mh.signature(mh.word_bigrams(t), a, b) for t in texts])
    # batch kernel gets the JVM-shaped multiset lists (duplicates kept)
    def bigrams_list(t):
        import re as _re

        w = _re.findall(r"[a-z]+", t)
        if len(w) < 2:
            return w
        return [w[i] + " " + w[i + 1] for i in range(len(w) - 1)]

    got = mh.signatures_batch([bigrams_list(t) for t in texts], a, b)
    assert (want == got).all()


def test_vectorized_simhash_matches_scalar():
    import re

    from guac_spark.textops.dedup import _simhash64, _simhash_batch

    texts = [
        "the quick brown fox", "", "zz " * 500, "one two three two one",
    ]
    toks = [re.findall(r"[a-z]+", t) for t in texts]
    got = _simhash_batch(toks)
    want = [format(_simhash64(t), "016x") for t in texts]
    assert got == want


def test_exact_dedup_finds_staged_copies(spark):
    docs = dedup.load_documents(spark, SF_SMALL)
    staged = dedup.staged_documents(docs)
    out = dedup.exact_dedup(staged)
    dup_groups = out.filter("n_copies > 1").count()
    expected = docs.filter("doc_id % 10 = 0").count()
    assert dup_groups == expected
    # keeper is always the original (min id)
    assert out.filter("n_copies > 1").filter("keeper_doc_id >= 20000").count() == 0


def test_simhash_exact_copy_distance_zero(spark):
    docs = dedup.staged_documents(dedup.load_documents(spark, SF_SMALL))
    pairs = dedup.simhash_near_pairs(docs, max_hamming=3)
    got = {(r["a"], r["b"]) for r in pairs.filter("hamming = 0").collect()}
    exact_copies = {
        (r["doc_id"], r["doc_id"] + 20000)
        for r in dedup.load_documents(spark, SF_SMALL)
        .filter("doc_id % 10 = 0").collect()
    }
    assert exact_copies <= got


def test_ann_lsh_recall_vs_bruteforce(spark):
    emb = similarity.load_embeddings(spark, SF_SMALL)
    qids = [0, 1, 2, 3, 4]
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_topk_bruteforce(emb, qids, 5).collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_topk_lsh(emb, qids, 5, n_bits=4).collect()
    }
    # approximate: require non-trivial recall, exactness not expected
    recall = len(brute & lsh) / len(brute)
    assert recall > 0.1, recall
    # every LSH hit must be a real corpus vector with a valid rank
    assert all(q in qids for q, _ in lsh)


def test_ivf_assignment_is_a_partition(spark):
    """Every corpus vector lands in exactly one inverted list (lists are
    disjoint and total — the property that lets the probe join skip the
    dedup multi-probe LSH needs)."""
    emb = similarity.load_embeddings(spark, SF_SMALL)
    cent = similarity.ivf_centroids(emb)
    assigned = similarity.ivf_assign(emb, cent)
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()
    lists = {r["list_id"] for r in cent.collect()}
    assert {r["list_id"] for r in assigned.collect()} <= lists


def test_ivf_full_probe_equals_bruteforce(spark):
    """nprobe = nlist degrades IVF to an exact scan — output must be
    row-identical to the brute-force baseline (rank ties included)."""
    emb = similarity.load_embeddings(spark, SF_SMALL)
    qids = [0, 1, 2, 3, 4]
    nlist = similarity.ivf_centroids(emb).count()
    brute = sorted(
        map(tuple, similarity.ann_topk_bruteforce(emb, qids, 5).collect())
    )
    ivf = sorted(
        map(
            tuple,
            similarity.ann_topk_ivf(emb, qids, 5, nprobe=nlist).collect(),
        )
    )
    assert ivf == brute


def test_ivf_recall_vs_bruteforce(spark):
    emb = similarity.load_embeddings(spark, SF_SMALL)
    qids = [0, 1, 2, 3, 4]
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_topk_bruteforce(emb, qids, 5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_topk_ivf(emb, qids, 5, nprobe=3).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall > 0.1, recall
    assert all(q in qids for q, _ in ivf)


def test_multimodal_plumbing(spark):
    docs = dedup.load_documents(spark, SF_SMALL)
    media = multimodal.attach_media(docs)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in rows)
    # deterministic: same payload -> same features
    f2 = multimodal.extract_features(media.repartition(7)).collect()
    m1 = {r["media_id"]: tuple(r["features"]) for r in rows}
    m2 = {r["media_id"]: tuple(r["features"]) for r in f2}
    assert m1 == m2

    plan = multimodal.frame_sample_plan(media, every_ms=5000)
    assert plan.count() > 0

    import pytest
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        multimodal.extract_features(media, decode_stub=False).collect()


def test_minhash_banding_recall_vs_independent_exact(spark):
    """ADVICE r3: the DuckDB oracle renders the implementation's own hash
    family into SQL, so a recall bug in hash_family/band_keys would cancel
    out in the driver compare. This test bounds banded recall against an
    INDEPENDENT ground truth — pure-Python set Jaccard over word bigrams —
    on a fixture of high-similarity pairs (J >= 0.9, banding admit
    probability > 0.9999 under the frozen 96/16x6 family, so the
    deterministic run must find every one)."""
    import itertools

    from guac_spark.textops import minhash as mh

    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a stitch in time saves nine and a rolling stone gathers no moss",
        "pack my box with five dozen liquor jugs before the long trip",
        "how vexingly quick daft zebras jump over the sleeping brown cat",
        "she sells sea shells by the sea shore every single summer day",
        "we hold these truths to be self evident that all code has bugs",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i * 2, t))
        rows.append((i * 2 + 1, " ".join(t.split()[:-1])))  # drop last word
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["a"], r["b"]) for r in dedup.minhash_pairs(df, 0.7).collect()}

    sets = {i: mh.word_bigrams(t) for i, t in rows}
    want = set()
    for i, j in itertools.combinations(sorted(sets), 2):
        jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
        if jac >= 0.7:
            want.add((i, j))
    assert len(want) == len(base)  # each base pairs with its variant only
    # recall: nothing the independent exact truth finds is dropped by
    # banding; precision: the exact verify keeps nothing below threshold
    assert got == want


def test_wav_decode_roundtrip_and_features(spark):
    """REAL audio decode (stdlib RIFF walk + numpy PCM): synth fixture
    bytes -> parse roundtrip -> Spark feature stage matches a direct
    numpy computation."""
    import numpy as np

    wav = multimodal.synth_wav(440.0, 8000, rate=8000, amplitude=0.5)
    rate, ch, s = multimodal.parse_wav(wav)
    assert (rate, ch, len(s)) == (8000, 1, 8000)
    # a 440 Hz sine at amplitude 0.5 has rms ~ 0.5/sqrt(2)
    x = s.astype(np.float64) / 32768.0
    assert abs(np.sqrt((x * x).mean()) - 0.5 / np.sqrt(2)) < 0.01

    media = spark.createDataFrame(
        [(1, multimodal.synth_wav(440.0, 8000)),
         (2, multimodal.synth_wav(220.0, 4000, rate=4000, amplitude=0.25))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in
           multimodal.decode_wav_features(media).collect()}
    assert got[1]["duration_ms"] == 1000 and got[1]["sample_rate"] == 8000
    assert got[2]["duration_ms"] == 1000 and got[2]["sample_rate"] == 4000
    assert abs(got[1]["rms"] - 0.3536) < 0.01
    assert abs(got[2]["peak"] - 0.25) < 0.01
    # malformed payloads fail loudly, not silently
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.parse_wav(b"not a wav")


def test_ppm_decode_resize_reencode(spark):
    """REAL image decode (P6 header tokenizer + raster reinterpret),
    nearest-neighbor resize, and re-encode roundtrip."""
    import numpy as np

    ppm = multimodal.synth_ppm(64, 48, seed=3)
    arr = multimodal.parse_ppm(ppm)
    assert arr.shape == (48, 64, 3)
    # header comments are tolerated
    commented = b"P6\n# a comment\n64 48\n255\n" + arr.tobytes()
    assert (multimodal.parse_ppm(commented) == arr).all()

    media = spark.createDataFrame(
        [(7, ppm)], "media_id long, payload binary"
    )
    row = multimodal.decode_ppm_features(
        media, resize_to=(16, 12)
    ).collect()[0]
    assert (row["width"], row["height"]) == (64, 48)
    want_means = arr.reshape(-1, 3).mean(axis=0)
    assert abs(row["mean_r"] - want_means[0]) < 1e-9
    # thumbnail is itself a valid PPM of the requested size, and equals
    # the direct numpy resize
    thumb = multimodal.parse_ppm(bytes(row["thumb"]))
    assert thumb.shape == (12, 16, 3)
    assert (thumb == multimodal.resize_nearest(arr, 16, 12)).all()


def test_ivf_kmeans_full_probe_equals_bruteforce(spark):
    """Search exactness is independent of the quantizer: with the
    k-means-refined centroids and nprobe = nlist, IVF must still
    reproduce the brute-force baseline row-identically."""
    emb = similarity.load_embeddings(spark, SF_SMALL)
    qids = [0, 1, 2, 3, 4]
    kc = similarity.ivf_centroids_kmeans(emb, iters=1)
    nlist = kc.count()
    brute = sorted(
        map(tuple, similarity.ann_topk_bruteforce(emb, qids, 5).collect())
    )
    ivf = sorted(
        map(
            tuple,
            similarity.ann_topk_ivf(
                emb, qids, 5, nprobe=nlist, centroids=kc
            ).collect(),
        )
    )
    assert ivf == brute


def test_ivf_kmeans_assignment_stays_a_partition(spark):
    """One Lloyd step must preserve the disjoint-and-total property of
    the inverted lists (lists may shrink or die, never overlap)."""
    emb = similarity.load_embeddings(spark, SF_SMALL)
    kc = similarity.ivf_centroids_kmeans(emb, iters=1)
    assigned = similarity.ivf_assign(emb, kc)
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()
