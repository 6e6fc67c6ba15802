"""Driver-style correctness gate: every queries() entry vs its DuckDB oracle.

Mirrors what the driver does at sf=0.01 (we run sf=0.001 for speed; the
semantics are scale-free): run the Spark query and the oracle SQL on the
same parquet views, normalize (sort columns by name, stringify, sort rows),
and require identical multisets.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL, normalize_rows

import __spark_entry__ as entry_mod


def _oracle_names():
    return sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, duck_small, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_SMALL)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    cur = duck_small.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    s = normalize_rows(spark_cols, spark_rows)
    d = normalize_rows(duck_cols, duck_rows)
    assert len(s) == len(d), f"{name}: row count {len(s)} vs {len(d)}"
    if s != d:
        diff_s = [r for r in s if r not in set(map(tuple, d))][:5]
        diff_d = [r for r in d if r not in set(map(tuple, s))][:5]
        raise AssertionError(
            f"{name}: value mismatch.\nonly-spark: {diff_s}\nonly-duck: {diff_d}"
        )


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return sane rows."""
    qs = entry_mod.queries()
    oracled = set(entry_mod.oracle_sql())
    for name in sorted(set(qs) - oracled):
        df = qs[name](spark, SF_SMALL)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
