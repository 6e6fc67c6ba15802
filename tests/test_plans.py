"""Physical-plan audits: the plan we'd want at 100 TB, asserted.

Catalyst gives predicate pushdown / column pruning / broadcast for free
ONLY if the plan is expressed declaratively — these tests pin that the
engine's operators actually produce those plans (a regression here is a
100× regression at scale even when results stay correct).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from guac_spark import corpus, graph
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_to_parquet_scan(spark):
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    q = ev.filter(F.col("event_type") == "click").select("event_id", "value")
    plan = _plan(q)
    assert "PushedFilters" in plan
    assert "IsNotNull(event_type)" in plan or "EqualTo(event_type,click)" in plan


def test_column_pruning_reads_only_needed_columns(spark):
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    q = ev.select("event_id", "value")
    plan = _plan(q)
    # ReadSchema must not contain the wide props/event_type columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "props" not in read_schema[0]


def test_whole_stage_codegen_covers_aggregation(spark):
    import contextlib
    import io

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    q = ev.groupBy("event_type").agg(F.sum("value"))
    q.collect()  # AQE finalizes the plan on execution
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    # '*' prefix marks operators inside a WholeStageCodegen span
    final = buf.getvalue().split("== Initial Plan ==")[0]
    assert "* HashAggregate" in final and "* ColumnarToRow" in final


def test_neighbors_seed_filter_is_pushed(spark):
    import tempfile
    edges = spark.createDataFrame(
        [("e1", "a", "b", "mentions", "c0", "c0:0")],
        "edge_id string, src string, dst string, pred string, "
        "origin string, document_ref string",
    )
    path = tempfile.mkdtemp() + "/edges"
    edges.write.parquet(path)
    e = spark.read.parquet(path)
    v = spark.createDataFrame(
        [("x", "person", "a")], "vertex_id string, kind string, canonical string"
    )
    plan = _plan(graph.neighbors(e, v, "a"))
    assert "PushedFilters" in plan and "src" in plan


def test_salted_count_is_two_level(spark):
    from guac_spark.skew import salted_count
    df = spark.createDataFrame([("k", 1)] * 10, "k string, v int")
    plan = _plan(salted_count(df, ["k"]))
    # two HashAggregate pairs: (partial+final) x (salted, unsalted)
    assert plan.count("HashAggregate") >= 4


def test_embed_neardup_lsh_has_no_cartesian(spark):
    """The shipped near-dup query must never cross-join the corpus
    (VERDICT r1 wrong #1): candidates come from the bucket equi-join."""
    from guac_spark.textops import similarity

    emb = similarity.load_embeddings(spark, SF_SMALL)
    q = similarity.cosine_near_pairs_lsh(
        similarity.staged_embeddings(emb), 0.99
    )
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_shingling_is_jvm_side(spark):
    """Shingles must be produced by the codegen'd projection, not Python:
    the Arrow exchange receives (id, shingles), never raw text."""
    from guac_spark.textops import dedup, minhash

    docs = dedup.load_documents(spark, SF_SMALL)
    bands = minhash.band_rows_df(docs, "doc_id", "text")
    plan = _plan(bands)
    assert "regexp_extract_all" in plan  # tokenization inside the scan stage
    assert "MapInPandas" in plan


def test_simhash_computed_once_in_pair_plan(spark):
    """simhash_near_pairs must run the simhash mapInPandas exactly once:
    the banded candidates come from ONE bucket groupBy, not four unioned
    self-joins whose dedup depended on exchange reuse (VERDICT r2 #3)."""
    from guac_spark.textops import dedup

    docs = dedup.load_documents(spark, SF_SMALL)
    plan = _plan(dedup.simhash_near_pairs(docs, 8))
    assert plan.count("MapInPandas") == 1
    assert "Join" not in plan  # bucket pair-gen, no self-join at all


def test_bucketed_mentions_linked_dedups_without_shuffle(spark):
    """The triples-stage dedup must reuse the bucketed layout of the
    mentions_linked snapshot: no hashpartitioning Exchange above the scan
    (in-session; a later session falls back to a plain read + shuffle)."""
    import tempfile

    from guac_spark import assemble, pipeline
    from guac_spark.warehouse import Warehouse

    root = tempfile.mkdtemp(prefix="wh_bucketplan_")
    pipeline.run_pipeline(spark, SF_SMALL, root)
    wh = Warehouse(root)
    linked = wh.read(spark, "mentions_linked")
    mapping = wh.read(spark, "cc_mapping")
    plan = _plan(assemble.triples_final(linked, mapping))
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    assert "Exchange hashpartitioning" not in plan


def test_corpus_generation_has_no_sort_merge_join(spark):
    t = corpus.transcripts(spark, SF_SMALL)
    plan = _plan(t)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_mention_stream_reaches_bucketed_write_without_exchange(spark):
    """r4 lever: transcripts are bucketed on conv_id at derivation (the
    window's own shuffle pays for the layout), so the extraction+link
    chain that feeds the mentions_linked bucketed write must contain NO
    Exchange at all — r3 shuffled the whole mention stream here via an
    explicit repartition."""
    import tempfile

    from guac_spark import extract, link, pipeline
    from guac_spark.warehouse import Warehouse

    root = tempfile.mkdtemp(prefix="wh_nozshuffle_")
    pipeline.run_pipeline(spark, SF_SMALL, root)
    wh = Warehouse(root)
    t = wh.read(spark, "transcripts")
    # the dict is read from its committed snapshot exactly as the pipeline
    # does — deriving it inline would drag the derivation's own (tiny,
    # broadcast-side) distinct exchanges into this plan
    adict = wh.read(spark, "alias_dict")
    linked = link.link_exact(
        extract.extract_mentions_fused(t, engine="sql"), adict
    )
    plan = _plan(linked)
    # the dictionary BroadcastExchange is expected; no shuffle exchange
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan


def test_kind_partition_prunes_both_consumers(spark):
    """r5 lever (NOTES_r4 #5), MEASURED AND REJECTED for the shipped
    layout (write cost > read savings — pipeline.py): the capability
    itself is pinned here — partitionBy('kind') composed with conv_id
    bucketing must prune the aka consumer to the kind=aka directory and
    prune the aka directory away for the triples consumer, both while
    keeping the bucketed scan (no hashpartitioning Exchange)."""
    import tempfile

    from guac_spark import assemble, pipeline
    from guac_spark.warehouse import Warehouse

    root = tempfile.mkdtemp(prefix="wh_kindpart_")
    pipeline.run_pipeline(spark, SF_SMALL, root)
    wh = Warehouse(root)
    # write the kind-partitioned variant of the committed mention stream
    wh.write_snapshot(
        wh.read(spark, "mentions_linked"),
        "ml_kind",
        bucket_by=(64, ["conv_id"]),
        partition_by=["kind"],
    )
    linked = wh.read(spark, "ml_kind")

    aka_plan = _plan(linked.filter(F.col("kind") == "aka"))
    aka_scan = [
        ln for ln in aka_plan.splitlines() if "PartitionFilters" in ln
    ]
    assert aka_scan and "kind=aka" in aka_scan[0]
    assert "SelectedBucketsCount" in aka_plan or "Bucketed: true" in aka_plan

    tr_plan = _plan(
        assemble.triples_final(linked, wh.read(spark, "cc_mapping"))
    )
    tr_scan = [
        ln
        for ln in tr_plan.splitlines()
        if "PartitionFilters" in ln and "ml_kind" in ln
    ]
    assert tr_scan and "NOT (kind" in tr_scan[0]
    assert "kind=aka" not in tr_scan[0]
    assert "Exchange hashpartitioning" not in tr_plan


def test_vertices_turn_arm_dedups_without_shuffle(spark):
    """r4 lever: with the triples snapshot bucketed on conv_id, the
    vertices turn-ref dedup (95% of vertices) must run with no
    hash-partitioning Exchange — only the (map-side collapsed) entity
    arm may shuffle."""
    import tempfile

    from pyspark.sql import functions as F

    from guac_spark import pipeline
    from guac_spark.warehouse import Warehouse

    root = tempfile.mkdtemp(prefix="wh_vertplan_")
    pipeline.run_pipeline(spark, SF_SMALL, root)
    wh = Warehouse(root)
    triples = wh.read(spark, "triples")
    is_turn_obj = F.col("obj").startswith("turn:")
    turn_arm = (
        triples.select(
            "conv_id",
            F.explode(
                F.array(F.col("subj"), F.when(is_turn_obj, F.col("obj")))
            ).alias("canonical"),
        )
        .filter(F.col("canonical").isNotNull())
        .dropDuplicates(["conv_id", "canonical"])
    )
    plan = _plan(turn_arm)
    assert "Exchange hashpartitioning" not in plan
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan


def test_ivf_assignment_broadcasts_and_avoids_window(spark):
    """The IVF inverted-list assignment must be corpus x broadcast(nlist
    centroids) with a plain algebraic-max argmax: no Window operator (a
    per-vec_id window would sort-shuffle nlist x the corpus) and exactly
    ONE corpus-keyed hash exchange — the argmax groupBy, whose partial
    aggregation ships one row per vector. (The centroid build upstream
    contributes two more exchanges, but those carry label/dim
    aggregates — nlist x ndim rows after map-side collapse, not corpus
    rows.)"""
    from guac_spark.textops import similarity

    emb = similarity.load_embeddings(spark, SF_SMALL)
    cent = similarity.ivf_centroids(emb)
    assigned = similarity.ivf_assign(emb, cent)
    plan = _plan(assigned)
    assert "Window" not in plan
    assert "Broadcast" in plan  # centroids arrive as a broadcast relation
    corpus_ex = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(vec_id" in ln
    ]
    assert len(corpus_ex) == 1, plan


def test_alias_dict_derivation_is_one_events_scan(spark):
    """The linking-dictionary derivation must read events ONCE: the
    distinct generated pids and distinct topic keys come from a single
    GROUPING SETS pass (Expand + one partial-aggregated shuffle), not
    two separate DISTINCT scans — measured ~20-24% of the stage at
    25.6M rows (NOTES_r5)."""
    q = corpus.alias_dict(spark, SF_SMALL)
    plan = _plan(q)
    assert plan.count("events.parquet") == 1, plan
    assert "Expand" in plan
