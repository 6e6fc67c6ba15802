"""Checkpoint/resume: a killed run restarts from the last committed snapshot
with no duplicate work and an identical final graph (north-rule gate;
the analog of GUAC's ack-after-ingest, process/process.go:131-139)."""

from __future__ import annotations

import tempfile

import pytest

from guac_spark.pipeline import run_pipeline
from guac_spark.warehouse import Warehouse
from tests.conftest import SF_SMALL


class _Boom(Exception):
    pass


def test_resume_after_kill(spark):
    full_wh = tempfile.mkdtemp(prefix="wh_full_")
    ref = run_pipeline(spark, SF_SMALL, full_wh)
    ref_triples = sorted(map(tuple, ref.tables["triples"].collect()))

    # simulate a kill mid-run: patch connected_components to explode, so
    # transcripts/mentions_linked/equivalences commit but cc doesn't
    kill_wh = tempfile.mkdtemp(prefix="wh_kill_")
    import guac_spark.pipeline as pl

    orig = pl.cc.connected_components

    def boom(*a, **k):
        raise _Boom()

    pl.cc.connected_components = boom
    try:
        with pytest.raises(_Boom):
            run_pipeline(spark, SF_SMALL, kill_wh)
    finally:
        pl.cc.connected_components = orig

    wh = Warehouse(kill_wh)
    assert wh.has("transcripts") and wh.has("equivalences")
    assert not wh.has("cc_mapping") and not wh.has("triples")

    # resume: committed stages are skipped, the rest run, output identical
    res = run_pipeline(spark, SF_SMALL, kill_wh, resume=True)
    assert "transcripts" in res.stages_skipped
    assert "equivalences" in res.stages_skipped
    assert "cc_mapping" in res.stages_run
    got = sorted(map(tuple, res.tables["triples"].collect()))
    assert got == ref_triples


def test_lineage_metrics_complete(spark):
    wh_root = tempfile.mkdtemp(prefix="wh_lineage_")
    res = run_pipeline(spark, SF_SMALL, wh_root)
    wh = Warehouse(wh_root)
    m = wh.metrics(spark)
    stages = {r["stage"] for r in m.select("stage").distinct().collect()}
    assert stages == set(res.tables.keys())
    # per-partition counters must sum to the committed table row counts
    # (mentions_linked included: bucketed snapshots keep full lineage)
    for t in ["transcripts", "mentions_linked", "triples", "vertices",
              "edges"]:
        total = (
            m.filter(f"table = '{t}'").groupBy().sum("rows").first()[0]
        )
        assert total == wh.read(spark, t).count(), t
        # commit-log row summary (Iceberg snapshot-summary analog) agrees
        assert wh.committed_rows(t) == total, t


def test_rerun_without_resume_recommits(spark):
    wh_root = tempfile.mkdtemp(prefix="wh_rerun_")
    r1 = run_pipeline(spark, SF_SMALL, wh_root)
    r2 = run_pipeline(spark, SF_SMALL, wh_root)  # resume=False: full rerun
    wh = Warehouse(wh_root)
    # snapshot ids advanced, readers see the latest commit
    assert wh.committed_snapshot("triples") == 2
    assert sorted(map(tuple, r1.tables["triples"].collect())) == sorted(
        map(tuple, r2.tables["triples"].collect())
    )


def test_resume_refuses_cross_version_and_legacy_warehouses(spark):
    """Engine schema gate (ADVICE r4 + r5): resume must refuse BOTH an
    explicit version mismatch AND a legacy warehouse with committed
    tables but no schema_version meta at all (every pre-v5 warehouse) —
    requiring stored_ver to be non-None let resume serve old-formula
    tables and then restamp them current, hiding the mismatch forever."""
    from guac_spark import pipeline as pl

    wh_root = tempfile.mkdtemp(prefix="wh_gate_")
    run_pipeline(spark, SF_SMALL, wh_root)
    wh = Warehouse(wh_root)

    # explicit cross-version mismatch
    wh.set_meta("schema_version", pl.SCHEMA_VERSION - 1)
    with pytest.raises(ValueError, match="refusing to resume"):
        run_pipeline(spark, SF_SMALL, wh_root, resume=True)

    # legacy: committed tables, schema_version meta absent entirely
    with wh._locked():
        log = wh._read_log()
        log.get("meta", {}).pop("schema_version", None)
        wh._write_log(log)
    assert wh.get_meta("schema_version") is None
    assert wh.committed_tables()  # it IS a populated warehouse
    with pytest.raises(ValueError, match="refusing to resume"):
        run_pipeline(spark, SF_SMALL, wh_root, resume=True)

    # an EMPTY unversioned warehouse is a fresh start, not legacy
    fresh = tempfile.mkdtemp(prefix="wh_fresh_")
    res = run_pipeline(spark, SF_SMALL, fresh, resume=True)
    assert res.stages_run  # ran, no refusal


def test_reservations_cleared_after_commit(spark):
    """Snapshot reservations must not outlive their commit (ADVICE r5):
    the log would otherwise grow a permanent 'reserved' counter per
    table and crashed reservations would advance ids forever."""
    wh_root = tempfile.mkdtemp(prefix="wh_resv_")
    run_pipeline(spark, SF_SMALL, wh_root)
    wh = Warehouse(wh_root)
    log = wh._read_log()
    assert log.get("reserved", {}) == {}
    # a reservation from a WRITE THAT NEVER COMMITTED survives until the
    # table's next successful commit, and ids never regress below it
    df = wh.read(spark, "alias_dict")
    pend = wh.append_snapshot(df, "alias_dict", defer_commit=True)
    assert wh._read_log()["reserved"]["alias_dict"] == pend["snap"]
    snap2 = wh.write_snapshot(df, "alias_dict")
    assert snap2 > pend["snap"]
    assert wh._read_log().get("reserved", {}) == {}


def _mk_events(spark, n, residue, np_, id_offset=0):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        (F.col("id") * np_ + residue + id_offset).alias("event_id"),
        (F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 3600))
        .alias("ts"),
        (F.col("id") % 100).cast("long").alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ["click", "view", "purchase", "error", "signup"]]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )


def test_alias_dict_incremental_append_is_o_new(spark, tmp_path):
    """VERDICT r5 missing #3: the dictionary is MAINTAINED, not re-derived
    — appending new events derives only the delta (O(new), proven by the
    append snapshot's committed row count) and the maintained table
    equals a from-scratch derivation over the full corpus at the pinned
    universe params."""
    from guac_spark import corpus, pipeline
    from guac_spark.pipeline import append_alias_dict

    np_ = 40
    sf_a = str(tmp_path / "base")
    _mk_events(spark, 2000, 30, np_).coalesce(1).write.parquet(
        f"{sf_a}/events.parquet"
    )
    wh_root = str(tmp_path / "wh")
    run_pipeline(spark, sf_a, wh_root)
    wh = Warehouse(wh_root)
    assert wh.get_meta("universe") == {"np": np_, "nt": 20}
    base_rows = wh.committed_rows("alias_dict")

    # appended slice introduces exactly two unseen residues: 31 and 38
    ev_b = _mk_events(spark, 200, 31, np_, id_offset=np_ * 4000)
    append_alias_dict(spark, wh_root, ev_b)

    # O(new): the append snapshot carried ONLY the delta rows
    log = wh._read_log()["tables"]["alias_dict"]
    assert len(log["paths"]) == 2  # base dir + one append dir
    assert wh.committed_rows("alias_dict") == base_rows + 2

    # maintained table == full derivation over A ∪ B at pinned params
    full_events = spark.read.parquet(f"{sf_a}/events.parquet").unionByName(
        ev_b
    )
    want = sorted(
        map(tuple,
            corpus.alias_dict_from_events(
                spark, full_events, np_, 20).collect())
    )
    got = sorted(map(tuple, wh.read(spark, "alias_dict").collect()))
    assert got == want

    # second append of already-seen residues is an empty delta
    ev_c = _mk_events(spark, 50, 30, np_, id_offset=np_ * 9000)
    append_alias_dict(spark, wh_root, ev_c)
    assert wh.committed_rows("alias_dict") == base_rows + 2

    # no base -> loud refusal
    with pytest.raises(ValueError, match="run the pipeline once"):
        pipeline.append_alias_dict(
            spark, str(tmp_path / "empty_wh"), ev_b
        )
