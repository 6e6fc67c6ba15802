"""End-to-end KG construction pipeline with checkpointed, resumable stages.

Stage graph (each stage commits a snapshot; a re-run skips committed
stages — the analog of GUAC's ack-after-ingest + blob dedupe):

    transcripts --> mentions_linked --> links(same_as) --> cc_mapping
                                   \\--> triples --> vertices
                                                \\--> edges

Shuffle budget at scale (the plan we would want on 1000 executors):
  * extraction: narrow (mapInPandas over the scan, no shuffle).
  * head linking: broadcast join, no shuffle of the mention stream.
  * tail linking: shuffles only DISTINCT unmatched surfaces (tiny).
  * CC: iterates over the same_as edge set only (≪ corpus), salted min-agg.
  * triples/vertices/edges dedup: one hash-partitioned shuffle each on the
    dedup key — unavoidable and key-uniform (ids are sha2 hashes).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import assemble, cc, corpus, extract, link
from .warehouse import Warehouse

# bucket count for the mentions_linked snapshot — fixed so every
# parallelism level reads the identical layout (scaling runs compare
# byte-identical inputs)
N_BUCKETS = 64

# engine schema version, recorded in the warehouse commit log: resuming a
# warehouse written by a different version is refused instead of producing
# AnalysisExceptions or silently mixing edge_id formulas (ADVICE r4).
# v5: edges carry extraction-time typed attrs {'span'} inside edge_id;
#     triples gained the span column; corpus universe scales with sf.
# v6: the generated-pid universe derives from BOTH corpus-join residue
#     expressions (corpus.gen_pid_sql, ADVICE r5) — on sparse event_id
#     spaces the entity universe (and thus every downstream table)
#     differs from v5.
SCHEMA_VERSION = 6

# CC physical-strategy gates. The driver-side union-find is strictly for
# small equivalence sets: with a corpus-proportional entity universe the
# equivalence graph grows ~linearly with the corpus (the 100 TB regime
# never fits a driver), so the PIPELINE runs the distributed
# frontier/pointer-doubling path from a low threshold — the strategy that
# scales is the one the headline measures (VERDICT r4 missing #1).
CC_DRIVER_THRESHOLD = 100_000
# past this many mapped entities the triples rewrite joins by shuffle
# instead of broadcasting the mapping
MAPPING_BROADCAST_LIMIT = 5_000_000


@dataclass
class PipelineResult:
    tables: dict[str, DataFrame] = field(default_factory=dict)
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    stage_secs: dict[str, float] = field(default_factory=dict)
    wall_sec: float = 0.0
    triples: int = 0
    turns: int = 0
    cc_round_stats: list[dict] = field(default_factory=list)


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    warehouse_root: str,
    engine: str = "auto",
    resume: bool = False,
) -> PipelineResult:
    """Run (or resume) the full construction pipeline.

    With resume=True, stages whose output snapshot is already committed are
    read back instead of recomputed — a killed run restarts exactly from the
    last committed snapshot with no duplicate work.

    engine='auto' picks the pure-JVM 'sql' extraction path at EVERY
    parallelism: isolated measurement on the 25.6M-turn corpus
    (scripts/measure_extract.py, local[4]) put sql at 47.9s vs arrow
    81.5s for the mention scan and 67.3s vs 94.7s fused — the r1 rule
    ('arrow' below 8 cores) was measured before the fused scan and no
    longer holds anywhere. Both engines stay semantically identical and
    parity-tested; 'arrow' remains the north-rule vectorized-UDF
    reference implementation.
    """
    wh = Warehouse(warehouse_root)
    # schema gate (ADVICE r4): a pre-existing warehouse written by another
    # engine version has incompatible edge identity / table schemas — a
    # resume would mix edge_id formulas or throw mid-union. Refuse loudly;
    # fresh runs (resume=False) overwrite and restamp.
    stored_ver = wh.get_meta("schema_version")
    if resume and stored_ver != SCHEMA_VERSION:
        # a warehouse with committed tables but NO schema_version meta
        # predates the versioning (≤v4) and is just as incompatible as an
        # explicit mismatch — requiring stored_ver to be non-None would
        # let resume serve old-formula tables and then stamp them current,
        # hiding the mismatch from every future resume (ADVICE r5)
        if stored_ver is not None or wh.committed_tables():
            raise ValueError(
                f"warehouse at {warehouse_root} was written by engine "
                f"schema v{stored_ver if stored_ver is not None else '<=4'}"
                f", this engine is v{SCHEMA_VERSION}: refusing to resume "
                "across an identity-formula change — rerun with "
                "resume=False (or a fresh warehouse_root) to rebuild"
            )
    wh.set_meta("schema_version", SCHEMA_VERSION)
    res = PipelineResult()
    t0 = time.time()
    if engine == "auto":
        engine = "sql"

    def stage(name: str, build, **write_kw) -> DataFrame:
        if resume and wh.has(name):
            res.stages_skipped.append(name)
            return wh.read(spark, name)
        t = time.time()
        df = build()
        wh.write_snapshot(df, name, stage=name, **write_kw)
        res.stage_secs[name] = round(time.time() - t, 3)
        res.stages_run.append(name)
        return wh.read(spark, name)

    # the linking dictionary is derived engine data now (head literals +
    # the corpus-proportional generated arm) — committed once per run so
    # every downstream broadcast reads the tiny snapshot instead of
    # re-deriving from events. The universe params are stamped into the
    # warehouse meta at derivation time so append_alias_dict (the O(new)
    # incremental maintenance path) can pin them.
    def _build_adict() -> DataFrame:
        df = corpus.alias_dict(spark, sf_dir)
        np_, nt = corpus.universe(corpus._events_rows(sf_dir))
        wh.set_meta("universe", {"np": np_, "nt": nt})
        return df

    # Python-worker pool prewarm (guide §4.5 heavyweight-init-once, moved
    # to where it overlaps JVM work): the first Arrow/pandas stage of a
    # cold process pays ~cores worker spawns + numpy/pandas imports
    # mid-pipeline — in this pipeline that lands on the equivalences
    # stage's banding. A trivial background mapInPandas job spins the
    # pool up while the JVM-only head stages run (workers are reused,
    # spark.python.worker.reuse default). Measured r7, cold
    # pipeline-only at sf1.0/c32, 2x2 interleaved: equivalences
    # 8.4s -> 6.5s, value -1.5..-2.8s net of head-stage contention.
    import threading

    def _prewarm_python_workers() -> None:
        try:
            def gen(batches):
                import numpy  # noqa: F401
                import pandas  # noqa: F401
                yield from batches

            n = spark.sparkContext.defaultParallelism
            (spark.range(n).repartition(n).mapInPandas(gen, "id long")
             .write.format("noop").mode("overwrite").save())
        except Exception:  # noqa: BLE001 — best-effort warmup only
            pass

    threading.Thread(target=_prewarm_python_workers, daemon=True).start()

    # alias_dict and transcripts are independent (both derive from events
    # + the universe views) — submit both write jobs concurrently exactly
    # like the vertices/edges pair below (guide §2.6: overlap independent
    # jobs so one stage's barrier tail back-fills the other's tasks; at
    # the cold start this also overlaps the first stage's JIT warmup).
    # The universe views/cache are registered once BEFORE the threads:
    # the per-stage _prepare_universe calls inside are then idempotent
    # (view replace with an identical definition, CacheManager hit on
    # the same canonical plan).
    corpus._prepare_universe(spark, sf_dir)

    # transcripts are written BUCKETED on conv_id: the derivation window
    # already hash-shuffles on conv_id, so the bucket layout costs no new
    # exchange — and every downstream corpus pass inherits it
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as ex:
        fa = ex.submit(stage, "alias_dict", _build_adict)
        ft = ex.submit(
            stage,
            "transcripts",
            lambda: corpus.transcripts(spark, sf_dir),
            bucket_by=(N_BUCKETS, ["conv_id"]),
        )
        adict = fa.result()
        transcripts = ft.result()

    def build_linked() -> DataFrame:
        # fused extraction: mention rows AND aka equivalence rows from ONE
        # corpus scan — the aka slice rides along as kind='aka' rows so
        # the equivalences stage never re-scans the full text corpus
        mentions = extract.extract_mentions_fused(transcripts, engine=engine)
        # NO repartition before the bucketed write (r3 shuffled the whole
        # mention stream here): the transcripts scan is bucket-partitioned
        # on conv_id, extraction/link preserve row placement (projections,
        # explode, broadcast join), and a bucketBy write routes rows to
        # bucket files per task — so the mention stream reaches its
        # bucketed layout with ZERO exchanges, and the downstream triples
        # dedup (keys ⊇ conv_id) still runs shuffle-free off the catalog
        return link.link_exact(mentions, adict)

    # MEASURED AND REJECTED (r5, VERDICT order #2 / NOTES_r4 #5):
    # partitionBy('kind') on top of the conv_id bucketing. The warehouse
    # supports it and the pruning works (plan-pinned in
    # test_kind_partition_prunes_both_consumers), but the measured delta
    # is NET NEGATIVE: +4.2s write at 6.4M turns (+~14s at 25.6M — 5x
    # open writers, smaller write buffers) vs <0.5s saved across BOTH
    # consumers (the aka slice and the non-aka projection are
    # column-pruned zstd scans, already nearly free; the r4 hypothesis
    # that the equivalences stage was dominated by the full-table read
    # did not survive measurement — LSH dominates it). Numbers in
    # NOTES_r5.md / BENCH.md.
    linked = stage(
        "mentions_linked", build_linked, bucket_by=(N_BUCKETS, ["conv_id"])
    )

    def build_links() -> DataFrame:
        tail = link.link_tail(link.unmatched_surfaces(linked), adict)
        # aka pairs come from the committed mentions_linked snapshot
        # (kind='aka' rows emitted by the fused extraction scan) — the
        # equivalences stage reads back a tiny column-pruned slice
        # instead of re-scanning the full transcript corpus. DISTINCT
        # the raw surface pairs BEFORE resolution: ~10.3M per-turn aka
        # rows collapse to ~771k distinct pairs at 25.6M turns, so the
        # two resolution joins and the final union-distinct run on
        # ~13x fewer (and shorter) rows — measured −4s at c4
        # (BENCH_equiv_r6.json, identical output pinned there)
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

    links = stage("equivalences", build_links)

    mapping = stage(
        "cc_mapping",
        lambda: cc.connected_components(
            links,
            driver_threshold=CC_DRIVER_THRESHOLD,
            round_stats=res.cc_round_stats,
            # the equivalences snapshot was just committed — its row
            # count is free from the commit log (snapshot summary), so
            # the strategy gate costs no count job
            n_edges=wh.committed_rows("equivalences"),
        ),
    )

    # the triples dedup runs bucket-local off the mentions_linked layout
    # and its output keeps that partitioning — writing it bucketed costs
    # no exchange and lets the vertices turn-ref arm dedup shuffle-free.
    # The CC rewrite broadcasts the mapping only while it fits the budget
    # (the committed row count is free from the snapshot summary).
    n_mapped = wh.committed_rows("cc_mapping") or 0
    triples = stage(
        "triples",
        lambda: assemble.triples_final(
            linked, mapping,
            broadcast_mapping=n_mapped <= MAPPING_BROADCAST_LIMIT,
        ),
        bucket_by=(N_BUCKETS, ["conv_id"]),
    )

    # vertices and edges both derive from the committed triples snapshot
    # and from nothing else — submit both write jobs concurrently so the
    # Spark scheduler interleaves their tasks (hides each stage's barrier
    # tail behind the other's work; the commit log is lock-guarded)
    with ThreadPoolExecutor(max_workers=2) as ex:
        fv = ex.submit(stage, "vertices", lambda: assemble.vertices(triples))
        fe = ex.submit(stage, "edges", lambda: assemble.edges(triples))
        verts = fv.result()
        edgs = fe.result()

    res.tables = {
        "alias_dict": adict,
        "transcripts": transcripts,
        "mentions_linked": linked,
        "equivalences": links,
        "cc_mapping": mapping,
        "triples": triples,
        "vertices": verts,
        "edges": edgs,
    }
    # committed row counts from the snapshot summary — no extra count() jobs
    res.triples = wh.committed_rows("triples") or triples.count()
    res.turns = wh.committed_rows("transcripts") or transcripts.count()
    res.wall_sec = time.time() - t0
    return res


def append_alias_dict(
    spark: SparkSession, warehouse_root: str, new_events: DataFrame
) -> int:
    """Incremental dictionary maintenance (VERDICT r5 missing #3): derive
    rows only for entities first seen in `new_events` and commit them as
    an APPEND snapshot — O(new events) regardless of dictionary size, the
    GUAC trie-upsert analog (keyvalue/pkg.go:314-352) on the warehouse's
    Iceberg-append shape. Universe params are pinned from the meta
    stamped at base derivation; a parameter change (corpus growth moving
    np/nt) is a rebuild event, not an append."""
    from . import corpus as _corpus

    wh = Warehouse(warehouse_root)
    u = wh.get_meta("universe")
    if u is None or not wh.has("alias_dict"):
        raise ValueError(
            "no base alias_dict/universe in this warehouse — run the "
            "pipeline once before appending increments"
        )
    existing = wh.read(spark, "alias_dict")
    delta = _corpus.alias_dict_delta(
        spark, new_events, existing, u["np"], u["nt"]
    )
    return wh.append_snapshot(delta, "alias_dict", stage="alias_dict_delta")
