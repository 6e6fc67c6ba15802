"""Canonical scalars, path reconstruction, recursive unpack, P/R gate."""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from guac_spark import canonical, graph, unpack


def test_entity_id_roundtrip(spark):
    df = spark.createDataFrame(
        [("ent:person/ada-lovelace",), ("ent:topic/topic_3",),
         ("turn:conv-00001-2:5",), ("garbage",)],
        "canonical string",
    )
    out = canonical.canonicalize_vertices(df).collect()
    by = {r["canonical"]: r for r in out}
    assert by["ent:person/ada-lovelace"]["parsed"]["kind"] == "person"
    assert by["ent:person/ada-lovelace"]["parsed"]["name"] == "ada-lovelace"
    assert by["turn:conv-00001-2:5"]["parsed"]["scheme"] == "turn"
    assert by["garbage"]["parsed"] is None
    # rebuild inverts parse for ent ids
    rebuilt = (
        df.filter(F.col("canonical").startswith("ent:"))
        .withColumn("p", canonical.parse_entity_id("canonical"))
        .withColumn(
            "again", canonical.build_entity_id(F.col("p.kind"), F.col("p.name"))
        )
    )
    assert all(r["canonical"] == r["again"] for r in rebuilt.collect())


def test_sentinel_and_fallback_and_artifact_key(spark):
    df = spark.createDataFrame([("", "x y/Z!",)], "empty string, messy string")
    row = df.select(
        canonical.build_entity_id(F.lit("person"), F.col("empty")).alias("s"),
        canonical.fallback_entity_id("messy").alias("f"),
        canonical.artifact_key(F.lit("SHA256"), F.lit("ABCDEF")).alias("a"),
    ).first()
    assert row["s"] == f"ent:person/{canonical.EMPTY_SENTINEL}"
    assert row["f"] == "ent:unk/x-y-z-"
    assert row["a"] == "sha256:abcdef"


def test_qualifier_sorting_is_canonical(spark):
    df = spark.createDataFrame(
        [({"b": "2", "a": "1", "c": "3"},), ({"c": "3", "a": "1", "b": "2"},)],
        "q map<string,string>",
    )
    vals = [r[0] for r in df.select(canonical.canonical_qualifiers("q")).collect()]
    assert vals == ["a=1&b=2&c=3", "a=1&b=2&c=3"]


def test_shortest_path_nodes_deterministic(spark):
    rows = [("e%d" % i, s, d, "x", "c", "c:0") for i, (s, d) in enumerate(
        [("a", "b1"), ("a", "b2"), ("b1", "c"), ("b2", "c"), ("c", "d")]
    )]
    e = spark.createDataFrame(
        rows,
        "edge_id string, src string, dst string, pred string, "
        "origin string, document_ref string",
    )
    # two shortest paths a->c; min-parent rule must pick b1 every time
    assert graph.shortest_path_nodes(e, "a", "d") == ["a", "b1", "c", "d"]
    assert graph.shortest_path_nodes(e.repartition(5), "a", "d") == [
        "a", "b1", "c", "d"
    ]
    assert graph.shortest_path_nodes(e, "a", "zzz") is None


def _embed(text: str) -> str:
    return "[[doc:" + base64.b64encode(text.encode()).decode() + "]]"


def test_codec_sniff_decode_bz2_zstd_passthrough(spark):
    import bz2 as _bz2

    import pyarrow as pa

    plain = b"plain text document"
    bz = _bz2.compress(b"bzip2 payload")
    zs = pa.compress(b"zstd payload " * 50, codec="zstd", asbytes=True)
    df = spark.createDataFrame(
        [(1, bytearray(plain)), (2, bytearray(bz)), (3, bytearray(zs))],
        "doc_id int, blob binary",
    )
    out = {r["doc_id"]: r["text"]
           for r in unpack.decode_encoded(df, "blob", "text").collect()}
    assert out[1] == "plain text document"
    assert out[2] == "bzip2 payload"
    assert out[3] == "zstd payload " * 50


def test_zstd_frame_content_size_parse():
    import pyarrow as pa

    for n in (1, 100, 300, 70_000):
        buf = pa.compress(b"a" * n, codec="zstd", asbytes=True)
        assert unpack._zstd_frame_content_size(buf) == n


def test_recursive_unpack(spark):
    leaf = "just a leaf"
    mid = "middle " + _embed(leaf)
    top = "top " + _embed(mid) + " " + _embed("another leaf")
    docs = spark.createDataFrame(
        [(1, top), (2, "no children")], "doc_id long, text string"
    )
    out = unpack.unpack_documents(docs)
    rows = {(r["root_id"], r["depth"], r["text"]) for r in out.collect()}
    assert (1, 1, mid) in rows
    assert (1, 2, leaf) in rows
    assert (1, 1, "another leaf") in rows
    assert (2, 0, "no children") in rows
    assert len(rows) == 5


def test_unpack_cycle_guard(spark):
    # self-embedding document: dedup by content hash terminates the walk
    inner = "repeat me"
    doc = inner + " " + _embed(inner) + " " + _embed(inner)
    docs = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    out = unpack.unpack_documents(docs).collect()
    assert len(out) == 2  # root + one deduped child


def test_triple_pr_gate_vs_oracle(spark, duck_small):
    """The explicit P/R >= 0.95 gate (north rule) — exact at fixture scale."""
    import __spark_entry__ as E
    from tests.conftest import SF_SMALL

    got = {
        tuple(r)
        for r in E.queries()["q_triples"](spark, SF_SMALL).collect()
    }
    want = {
        tuple(r)
        for r in duck_small.execute(E.oracle_sql()["q_triples"]).fetchall()
    }
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0  # exact at fixture scale
