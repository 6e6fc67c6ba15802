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


@dataclass
class PipelineResult:
    tables: dict[str, DataFrame] = field(default_factory=dict)
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    stage_secs: dict[str, float] = field(default_factory=dict)
    wall_sec: float = 0.0
    triples: int = 0


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    warehouse_root: str,
    engine: str = "arrow",
    resume: bool = False,
) -> PipelineResult:
    """Run (or resume) the full construction pipeline.

    With resume=True, stages whose output snapshot is already committed are
    read back instead of recomputed — a killed run restarts exactly from the
    last committed snapshot with no duplicate work.
    """
    wh = Warehouse(warehouse_root)
    res = PipelineResult()
    t0 = time.time()

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

    adict = corpus.alias_dict(spark)

    transcripts = stage(
        "transcripts", lambda: corpus.transcripts(spark, sf_dir)
    )

    def build_linked() -> DataFrame:
        mentions = extract.extract_mentions(transcripts, engine=engine)
        return link.link_exact(mentions, adict)

    linked = stage("mentions_linked", build_linked)

    def build_links() -> DataFrame:
        tail = link.link_tail(link.unmatched_surfaces(linked), adict)
        # aka extraction is a prefiltered regexp_extract_all + zip — always
        # take the pure-JVM engine here (identical semantics, parity
        # tested); a second full-corpus Arrow transfer would double the
        # Python cost for a pattern that appears in a minority of turns
        aka = extract.extract_aka_pairs(transcripts, engine="sql")
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
        "cc_mapping", lambda: cc.connected_components(links)
    )

    triples = stage(
        "triples", lambda: assemble.triples_final(linked, mapping)
    )
    verts = stage("vertices", lambda: assemble.vertices(triples))
    edgs = stage("edges", lambda: assemble.edges(triples))

    res.tables = {
        "transcripts": transcripts,
        "mentions_linked": linked,
        "equivalences": links,
        "cc_mapping": mapping,
        "triples": triples,
        "vertices": verts,
        "edges": edgs,
    }
    res.triples = triples.count()
    res.wall_sec = time.time() - t0
    return res
