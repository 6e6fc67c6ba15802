"""Extraction: engine parity (arrow vs sql), negative fixtures, staging dedupe."""

from __future__ import annotations

import datetime
import os

from guac_spark import corpus, extract
from tests.conftest import SF_SMALL


def _multiset(df):
    return sorted(map(tuple, df.collect()))


def test_arrow_and_sql_engines_agree(spark):
    t = corpus.transcripts(spark, SF_SMALL)
    a = _multiset(extract.extract_mentions(t, engine="arrow"))
    s = _multiset(extract.extract_mentions(t, engine="sql"))
    assert a == s
    aa = _multiset(extract.extract_aka_pairs(t, engine="arrow"))
    ss = _multiset(extract.extract_aka_pairs(t, engine="sql"))
    assert aa == ss


def _mini(spark, texts):
    now = datetime.datetime(2024, 1, 1)
    rows = [("c0", i, "user", t, None, now) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_no_mentions_emits_zero_rows_not_nulls(spark):
    t = _mini(spark, ["nothing to see here", "", "   ", "UPPER @Case-Bad"])
    for engine in ("arrow", "sql"):
        m = extract.extract_mentions(t, engine=engine)
        rows = m.collect()
        # '@Case-Bad' starts uppercase -> no match under [a-z][a-z-]*
        assert all(r["surface"] is not None for r in rows)
        person = [r for r in rows if r["kind"] == "person"]
        assert person == [] or all(
            r["surface"] == "ase-bad" for r in person
        )  # lowercase tail after 'C' only if regex engine matched mid-token


def test_mixed_grammar_single_turn(spark):
    t = _mini(
        spark,
        ["ping @ada-lovelace on #topic_3 via tool:tool_purchase >>0 "
         "and @grace-hopper aka @grace-hopperr"],
    )
    for engine in ("arrow", "sql"):
        m = extract.extract_mentions(t, engine=engine)
        kinds = {r["kind"] for r in m.collect()}
        assert kinds == {"person", "topic", "tool", "reply"}
        aka = extract.extract_aka_pairs(t, engine=engine).collect()
        assert [(r["surface_a"], r["surface_b"]) for r in aka] == [
            ("grace-hopper", "grace-hopperr")
        ]


def test_multiple_aka_per_turn_both_engines(spark):
    # two aka patterns in one turn: both engines must emit BOTH pairs
    # (regression: the sql engine used to take only the first match)
    t = _mini(
        spark,
        ["@ada-lovelace aka @ada-l and @grace-hopper aka @grace-h done"],
    )
    want = [("ada-lovelace", "ada-l"), ("grace-hopper", "grace-h")]
    for engine in ("arrow", "sql"):
        aka = extract.extract_aka_pairs(t, engine=engine).collect()
        got = sorted((r["surface_a"], r["surface_b"]) for r in aka)
        assert got == want, engine


def test_staging_dedupe_by_content_hash(spark):
    t = _mini(spark, ["dup text", "other"])
    staged = t.unionByName(t.limit(1))  # duplicate row 0
    assert staged.count() == 3
    deduped = extract.dedupe_staging(staged)
    assert deduped.count() == 2


def test_triples_surface_shape(spark):
    t = _mini(spark, ["@ada-lovelace aka @ada-lovelacee >>0"])
    m = extract.extract_mentions(t)
    a = extract.extract_aka_pairs(t)
    tr = extract.triples_surface(m, a)
    preds = {r["pred"] for r in tr.collect()}
    assert preds == {"mentions", "replies_to", "same_as"}
    reply = [r for r in tr.collect() if r["pred"] == "replies_to"][0]
    assert reply["obj"] == "turn:c0:0"


def test_fused_extraction_matches_separate(spark):
    # the single-scan fused extraction must reproduce extract_mentions
    # (non-aka slice) and extract_aka_pairs (aka slice), per engine, and
    # the engines must agree with each other
    from pyspark.sql import functions as F

    t = corpus.transcripts(spark, SF_SMALL)
    fused = {
        eng: extract.extract_mentions_fused(t, engine=eng)
        for eng in ("arrow", "sql")
    }
    want_m = _multiset(
        extract.extract_mentions(t).select(
            "conv_id", "turn_idx", "kind", "surface", "span"
        )
    )
    want_a = _multiset(
        extract.extract_aka_pairs(t).select(
            "conv_id", "turn_idx", "surface_a", "surface_b"
        )
    )
    for eng, f in fused.items():
        got_m = _multiset(
            f.filter(F.col("kind") != "aka").select(
                "conv_id", "turn_idx", "kind", "surface", "span"
            )
        )
        assert got_m == want_m, eng
        got_a = _multiset(
            f.filter(F.col("kind") == "aka").select(
                "conv_id", "turn_idx", "surface", "surface_b"
            )
        )
        assert got_a == want_a, eng


def test_person_boundary_excludes_tool_version_suffix(spark):
    """ADVICE r3: 'tool:vec_db@v2' must not fabricate a person mention
    'v' — PERSON_RE requires a non-alphanumeric boundary (or start of
    text) before '@', in both engines."""
    t = _mini(
        spark,
        ["run tool:vec_db@v2 now", "@ada-lovelace leads", "see (@alan-turing)"],
    )
    for engine in ("arrow", "sql"):
        m = extract.extract_mentions(t, engine=engine).collect()
        persons = sorted(r["surface"] for r in m if r["kind"] == "person")
        assert persons == ["ada-lovelace", "alan-turing"], (engine, persons)
        tools = [r["surface"] for r in m if r["kind"] == "tool"]
        assert tools == ["vec_db@v2"]


def test_events_rows_matches_count_on_single_and_multi_file(spark, tmp_path):
    """_events_rows (footer-based universe sizing) must equal a real
    count() on both layouts: the driver's single-file events.parquet and
    a multi-file directory table (the replicated scaling corpus)."""
    from guac_spark.corpus import _events_rows, load_events

    assert _events_rows(SF_SMALL) == load_events(spark, SF_SMALL).count()

    multi = str(tmp_path / "sfdir")
    ev = load_events(spark, SF_SMALL)
    ev.repartition(3).write.parquet(f"{multi}/events.parquet")
    assert _events_rows(multi) == ev.count()


def test_sparse_event_ids_drop_no_transcript_rows(spark, tmp_path):
    """ADVICE r5 (medium): the generated-pid universe must cover BOTH
    corpus-join residue expressions. With event_ids ≡ 30 (mod np) the
    pid1 set is {30} but every row's pid2 is 37 — an alias_full derived
    from pid1 residues alone silently drops ALL transcript rows at the
    corpus inner join (and the oracle, running identical SQL, cannot see
    the loss). Both engines must retain every turn and stay in parity."""
    import duckdb as _duckdb
    from pyspark.sql import functions as F

    from guac_spark import corpus

    n, np_ = 2000, 40  # np = max(25, 2000/50) = 40
    sf_dir = str(tmp_path / "sparse")
    ev = spark.range(n).select(
        (F.col("id") * np_ + 30).alias("event_id"),  # ≡ 30 (mod 40)
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
    ev.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    got_np, _nt = corpus.universe(corpus._events_rows(sf_dir))
    assert got_np == np_
    t = corpus.transcripts(spark, sf_dir)
    assert t.count() == n  # every event becomes a turn — nothing dropped

    # pid2-only residue (37) is in the dictionary universe too
    adict = corpus.alias_dict(spark, sf_dir)
    gen_aliases = {
        r["alias"] for r in adict.filter("kind = 'person'").collect()
    } - set(corpus.PERSONS)
    assert len(gen_aliases) == 2  # residues {30, 37}

    # oracle parity on the sparse corpus (shared templates, same counts)
    con = _duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    dn = con.execute(
        corpus.duckdb_prelude() + " SELECT count(*) FROM transcripts"
    ).fetchone()[0]
    assert dn == n


def test_fixed_universe_pins_oracle_params_too():
    """ADVICE r5 (low): GUAC_SPARK_UNIVERSE=fixed must pin BOTH engines —
    the oracle's u_params is rendered as literal head params under the
    env var (read at import, hence the subprocess)."""
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [_sys.executable, "-c",
         "import guac_spark.corpus as c; print(c.U_PARAMS_SQL)"],
        env={**os.environ, "GUAC_SPARK_UNIVERSE": "fixed"},
        capture_output=True, text=True, check=True,
    )
    assert out.stdout.strip() == "SELECT 25 AS np, 20 AS nt"
    out = subprocess.run(
        [_sys.executable, "-c",
         "import guac_spark.corpus as c; print(c.U_PARAMS_SQL)"],
        env={k: v for k, v in os.environ.items()
             if k != "GUAC_SPARK_UNIVERSE"},
        capture_output=True, text=True, check=True,
    )
    assert "count(*)" in out.stdout  # grown formula by default
