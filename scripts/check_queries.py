"""Driver-style correctness check: run every queries() entry against its
oracle_sql() in DuckDB and compare rows + columns + values (normalized the
same way the driver does). Usage:

    python scripts/check_queries.py [sf_dir] [query ...]

Defaults: sf_dir=/root/testdata/sf0.01, all queries. Exits non-zero on any
mismatch. Queries without an oracle are reported rows-only.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from guac_spark.session import get_spark  # noqa: E402
from tests.conftest import duck_con, normalize_rows  # noqa: E402

import __spark_entry__ as E  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_queries", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    qs = E.queries()
    oracles = E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [c[0] for c in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            failed.append(name)
            continue
        s = normalize_rows(scols, srows)
        d = normalize_rows(dcols, drows)
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_vals = s == d
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
        print(f"{name}: {status} spark={len(srows)} duck={len(drows)} "
              f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'} "
              f"({time.time()-t0:.1f}s)")
        if status != "OK":
            failed.append(name)
            if ok_cols:
                only_s = [r for r in s if r not in d][:3]
                only_d = [r for r in d if r not in s][:3]
                print(f"  spark-only: {only_s}")
                print(f"  duck-only:  {only_d}")
    print(f"\n{'FAILED: ' + ', '.join(failed) if failed else 'all green'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
