"""Connected-components properties: both physical strategies, determinism."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from guac_spark.cc import _union_find_local, connected_components


def _ref_components(pairs):
    return dict(_union_find_local(pairs))


def test_distributed_equals_unionfind_random(spark):
    rng = random.Random(42)
    nodes = [f"n{i:03d}" for i in range(120)]
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    # force the distributed label-propagation path
    dist = {
        (r["node"], r["component"])
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    ref = set(_ref_components(pairs).items())
    assert dist == ref


def test_long_chain_converges(spark):
    # diameter 14 chain — exercises multi-round propagation
    pairs = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(14)]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    out = connected_components(edges, driver_threshold=0).collect()
    assert all(r["component"] == "c00" for r in out)
    assert len(out) == 15


def test_deterministic_under_repartition(spark):
    pairs = [(f"x{i}", f"x{i + 1}") for i in range(10)] + [
        ("a", "b"), ("b", "c"), ("z", "a")
    ]
    e1 = spark.createDataFrame(pairs, "src string, dst string")
    e2 = e1.repartition(7)
    r1 = sorted(map(tuple, connected_components(e1, driver_threshold=0).collect()))
    r2 = sorted(map(tuple, connected_components(e2, driver_threshold=0).collect()))
    assert r1 == r2


def test_hot_key_star_graph(spark):
    # celebrity star: one hub with 500 spokes (the salted-agg hot case)
    pairs = [("hub", f"s{i:04d}") for i in range(500)]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    out = connected_components(edges, driver_threshold=0, n_salts=8).collect()
    assert len(out) == 501
    assert all(r["component"] == "hub" for r in out)
