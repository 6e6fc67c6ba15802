"""Enrichment loop convergence + graph delete (certifier / delete analogs)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from guac_spark import enrich
from guac_spark.pipeline import run_pipeline
from guac_spark.warehouse import Warehouse
from tests.conftest import SF_SMALL


def test_enrichment_converges_and_is_idempotent(spark):
    root = tempfile.mkdtemp(prefix="wh_enrich_")
    run_pipeline(spark, SF_SMALL, root)
    wh = Warehouse(root)
    e0 = wh.read(spark, "edges").count()

    n1 = enrich.run_enrichment(spark, root)
    assert n1 == 25  # every person entity enriched once
    e1 = wh.read(spark, "edges").count()
    assert e1 == e0 + n1
    preds = {
        r["pred"]
        for r in wh.read(spark, "edges").select("pred").distinct().collect()
    }
    assert enrich.ENRICH_PRED in preds

    # second pass: converged, nothing re-enriched, edges unchanged
    n2 = enrich.run_enrichment(spark, root)
    assert n2 == 0
    assert wh.read(spark, "edges").count() == e1

    # provenance separates enrichment evidence from extraction evidence
    assert (
        wh.read(spark, "edges").filter("origin = 'enricher'").count() == n1
    )


def test_delete_vertex_cascades_edges(spark):
    root = tempfile.mkdtemp(prefix="wh_del_")
    run_pipeline(spark, SF_SMALL, root)
    wh = Warehouse(root)
    target = "ent:person/grace-hopper"
    before_e = wh.read(spark, "edges")
    incident = before_e.filter(
        (F.col("src") == target) | (F.col("dst") == target)
    ).count()
    assert incident > 0
    n_v, n_e = wh.delete_vertices(spark, [target])
    assert (n_v, n_e) == (1, incident)
    after = wh.read(spark, "edges")
    assert after.filter(
        (F.col("src") == target) | (F.col("dst") == target)
    ).count() == 0
    # pre-delete snapshot still on disk (time travel)
    assert wh.committed_snapshot("edges") >= 2
