from __future__ import annotations

import os
import shutil
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("GUAC_SPARK_WH", "/tmp/guac_spark_wh_test")
    shutil.rmtree("/tmp/guac_spark_wh_test", ignore_errors=True)
    from guac_spark.session import get_spark

    s = get_spark(app_name="guac_spark_tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


@pytest.fixture(scope="session")
def duck_small():
    return duck_con(SF_SMALL)


def normalize_rows(cols, rows):
    """Driver-style normalization: sort columns by name, stringify cells,
    sort rows — order- and dtype-insensitive multiset comparison."""
    import math

    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return ""
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.9g}"
        if isinstance(v, bool):
            return str(int(v))
        if hasattr(v, "item"):
            return norm(v.item())
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)
