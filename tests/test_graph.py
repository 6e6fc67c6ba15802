"""Graph query operators: cycles, paths, pagination, keep-latest, skew."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from guac_spark import graph
from guac_spark.skew import salted_agg, salted_count


def _edges(spark, rows):
    return spark.createDataFrame(
        [(f"e{i}", s, d, p, "c0", "c0:0") for i, (s, d, p) in enumerate(rows)],
        "edge_id string, src string, dst string, pred string, "
        "origin string, document_ref string",
    )


def test_toposort_cycle_raises(spark):
    e = _edges(spark, [("a", "b", "replies_to"), ("b", "c", "replies_to"),
                       ("c", "a", "replies_to")])
    with pytest.raises(ValueError, match="cycle"):
        graph.toposort_levels(e)


def test_toposort_dag_levels(spark):
    e = _edges(spark, [("b", "a", "replies_to"), ("c", "b", "replies_to"),
                       ("d", "b", "replies_to"), ("e", "a", "replies_to")])
    levels = {r["node"]: r["level"] for r in graph.toposort_levels(e).collect()}
    assert levels == {"a": 0, "b": 1, "e": 1, "c": 2, "d": 2}


def test_shortest_path(spark):
    e = _edges(spark, [("a", "b", "x"), ("b", "c", "x"), ("c", "d", "x"),
                       ("a", "z", "y")])
    assert graph.shortest_path_len(e, "a", "d") == 3
    assert graph.shortest_path_len(e, "a", "z") == 1
    assert graph.shortest_path_len(e, "z", "d", max_hops=2) is None
    # pred allowlist (usingOnly analog) blocks the y edge
    assert graph.shortest_path_len(e, "a", "z", using_only=["x"]) is None


def test_bfs_is_min_distance(spark):
    # diamond: two paths of different length to d
    e = _edges(spark, [("a", "b", "x"), ("b", "d", "x"),
                       ("a", "c", "x"), ("c", "e", "x"), ("e", "d", "x")])
    d = {r["node"]: r["dist"]
         for r in graph.bfs_distances(e, "a", max_hops=4).collect()}
    assert d["d"] == 2


def test_pagination_covers_all_exactly_once(spark):
    verts = spark.createDataFrame(
        [(f"{i:03d}", "k", f"c{i}") for i in range(57)],
        "vertex_id string, kind string, canonical string",
    )
    seen = []
    after = None
    while True:
        page = graph.page_vertices(verts, after, first=10).collect()
        if not page:
            break
        seen += [r["vertex_id"] for r in page]
        after = page[-1]["vertex_id"]
    assert seen == sorted(seen)
    assert len(seen) == 57 and len(set(seen)) == 57


def test_toposort_grouped_matches_peel_on_conv_local_chains(spark):
    # conv-local turn chains: auto mode takes the grouped single-pass path;
    # forcing peel must give identical levels
    rows = []
    for conv in ("conv-a", "conv-b"):
        for i in range(1, 6):
            rows.append((f"turn:{conv}:{i}", f"turn:{conv}:{i-1}",
                         "replies_to"))
    # a branch: two replies to the same parent
    rows.append(("turn:conv-a:9", "turn:conv-a:2", "replies_to"))
    e = _edges(spark, rows)
    grouped = {r["node"]: r["level"]
               for r in graph.toposort_levels(e, mode="grouped").collect()}
    peel = {r["node"]: r["level"]
            for r in graph.toposort_levels(e, mode="peel").collect()}
    auto = {r["node"]: r["level"]
            for r in graph.toposort_levels(e).collect()}
    assert grouped == peel == auto
    assert grouped["turn:conv-a:0"] == 0 and grouped["turn:conv-a:5"] == 5
    assert grouped["turn:conv-a:9"] == 3


def test_filter_spec_attrs_subset_and_empty(spark):
    verts = spark.createDataFrame(
        [("1", "person", "ent:person/ada-lovelace"),
         ("2", "topic", "ent:topic/topic_3"),
         ("3", "turn", "turn:c0:0")],
        "vertex_id string, kind string, canonical string",
    )
    got = graph.filter_vertices_spec(
        verts, attrs_subset={"ns": "person", "name": "ada-lovelace"}
    ).select("vertex_id").collect()
    assert [r["vertex_id"] for r in got] == ["1"]
    # subset semantics: a single matching attr suffices
    got2 = graph.filter_vertices_spec(verts, attrs_subset={"ns": "topic"})
    assert [r["vertex_id"] for r in got2.collect()] == ["2"]
    # non-matching value excludes
    assert graph.filter_vertices_spec(
        verts, attrs_subset={"ns": "person", "name": "x"}
    ).count() == 0
    # matchOnlyEmptyQualifiers analog: only the turn vertex (empty map)
    got3 = graph.filter_vertices_spec(verts, match_only_empty_attrs=True)
    assert [r["vertex_id"] for r in got3.collect()] == ["3"]


def test_find_software_indexed_equals_scan(spark):
    verts = spark.createDataFrame(
        [(f"{i}", "person", f"ent:person/name-{i:03d}") for i in range(40)]
        + [("x", "topic", "ent:topic/lovel-ace")],
        "vertex_id string, kind string, canonical string",
    )
    idx = graph.build_substring_index(verts)
    for q in ("lovel", "name-00", "zzz", "e-1"):
        scan = {tuple(r) for r in graph.find_software(verts, q).collect()}
        via_idx = {tuple(r) for r in
                   graph.find_software_indexed(idx, verts, q).collect()}
        assert scan == via_idx, q


def test_neighbors_page_covers_all_exactly_once(spark):
    e = _edges(spark, [("a", f"n{i}", "mentions") for i in range(23)])
    verts = spark.createDataFrame(
        [(f"{i:03d}", "person", f"n{i}") for i in range(23)]
        + [("900", "person", "a")],
        "vertex_id string, kind string, canonical string",
    )
    seen, after = [], None
    while True:
        page = graph.neighbors_page(e, verts, "a", after, first=7).collect()
        if not page:
            break
        seen += [r["vertex_id"] for r in page]
        after = page[-1]["vertex_id"]
    assert seen == sorted(seen) and len(seen) == 23 == len(set(seen))


def test_page_connection_total_and_next(spark):
    verts = spark.createDataFrame(
        [(f"{i:03d}", "k", f"c{i}") for i in range(25)],
        "vertex_id string, kind string, canonical string",
    )
    page = graph.page_vertices_connection(verts, after="004", first=10)
    rows = page.collect()
    assert len(rows) == 10
    assert all(r["total_count"] == 25 for r in rows)
    assert all(r["has_next_page"] for r in rows)
    assert rows[0]["end_cursor"] == max(r["vertex_id"] for r in rows)
    last = graph.page_vertices_connection(verts, after="020", first=10)
    lrows = last.collect()
    assert len(lrows) == 4 and all(not r["has_next_page"] for r in lrows)
    # empty page (cursor past the end): metadata survives as a sentinel
    # row with null vertex columns (ADVICE r2)
    empty = graph.page_vertices_connection(verts, after="999", first=10)
    erows = empty.collect()
    assert len(erows) == 1
    assert erows[0]["vertex_id"] is None
    assert erows[0]["total_count"] == 25
    assert erows[0]["has_next_page"] is False
    assert erows[0]["end_cursor"] is None


def test_keep_latest_deterministic_ties(spark):
    import datetime
    t = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, "a", 10, t), (1, "a", 11, t), (1, "b", 12, t)],
        "user_id int, event_type string, event_id int, ts timestamp",
    )
    out = graph.keep_latest(df, ["user_id", "event_type"], "ts",
                            tiebreak=["event_id"]).collect()
    got = {(r["user_id"], r["event_type"], r["event_id"]) for r in out}
    assert got == {(1, "a", 11), (1, "b", 12)}


def test_salted_aggs_match_plain(spark):
    # heavy skew: one key holds 90% of rows
    rows = [("hot", i % 7) for i in range(9000)] + [
        (f"k{i % 50}", i % 11) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "k string, v int")
    plain_cnt = {r["k"]: r["n"] for r in
                 df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted_cnt = {r["k"]: r["n"] for r in salted_count(df, ["k"]).collect()}
    assert plain_cnt == salted_cnt

    plain = {
        (r["k"]): (r["mn"], r["mx"], r["sm"])
        for r in df.groupBy("k").agg(
            F.min("v").alias("mn"), F.max("v").alias("mx"),
            F.sum("v").alias("sm")).collect()
    }
    sal = {
        r["k"]: (r["min_v"], r["max_v"], r["sum_v"])
        for r in salted_agg(
            df, ["k"], {"v": "min"}).join(
            salted_agg(df, ["k"], {"v": "max"}), on="k").join(
            salted_agg(df, ["k"], {"v": "sum"}), on="k").collect()
    }
    assert plain == sal
