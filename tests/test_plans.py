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


def test_corpus_generation_has_no_sort_merge_join(spark):
    t = corpus.transcripts(spark, SF_SMALL)
    plan = _plan(t)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
