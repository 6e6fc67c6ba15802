"""Explicit skew handling: salted repartitioning + two-level aggregation.

Mega-conversations and celebrity entities (e.g. the corpus's hot
@ada-lovelace key, mentioned from every purchase turn) make single-level
groupBy keys hot. For algebraic aggregates (count/sum/min/max) Spark's
partial map-side aggregation already combines before the shuffle, but the
reduce-side key is still a single task when one key dominates a stage's
output. The salted two-level pattern below bounds any single reducer's
share to 1/n_salts of the hot key, at the cost of one extra (tiny) shuffle
over the partially-aggregated rows.

AQE skew-join splitting (enabled in session.py) is the backstop for join
skew; salting here covers aggregation skew, which AQE does not split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _salt_col(n_salts: int) -> Column:
    # Salt = map partition id mod n_salts. Spark's partial (map-side)
    # aggregation already collapses a hot key to ONE partial row per map
    # partition, so the per-partition id is exactly the granularity that
    # needs spreading across reducers; anything finer (row content, RNG)
    # is collapsed again before the shuffle anyway. Deterministic under
    # task retry: a retried task recomputes the same partition and gets
    # the same id. (Content-based salts fail here: the hot key's rows are
    # often byte-identical, so xxhash64(content) sends them all to one
    # reducer; monotonically_increasing_id carries the same
    # partition-layout dependence as this without being more deterministic.)
    return F.pmod(F.spark_partition_id().cast("long"), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-level aggregation: groupBy(keys + salt) partial -> groupBy(keys)
    final. `aggs` maps column -> fn in {'count','sum','min','max'}.
    Exact for these algebraic functions: merge(partial) == total.
    """
    salted = df.withColumn("_salt", _salt_col(n_salts))
    partial_exprs = []
    final_exprs = []
    for col, fn in aggs.items():
        pname = f"_p_{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(pname))
            final_exprs.append(F.sum(pname).alias(f"{fn}_{col}"))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(pname))
            final_exprs.append(F.sum(pname).alias(f"{fn}_{col}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(pname))
            final_exprs.append(F.min(pname).alias(f"{fn}_{col}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(pname))
            final_exprs.append(F.max(pname).alias(f"{fn}_{col}"))
        else:
            raise ValueError(f"non-algebraic agg {fn!r} cannot be salted")
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_count(df: DataFrame, keys: list[str], out: str = "n",
                 n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """count(*) per key via salted two-level aggregation."""
    salted = df.withColumn("_salt", _salt_col(n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(F.count("*").alias("_pc"))
    return partial.groupBy(*keys).agg(F.sum("_pc").cast("long").alias(out))
