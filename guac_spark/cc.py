"""Connected components: hash-partitioned min-label propagation.

Canonicalization merge — the physical realization of GUAC's equivalence
verbs (PkgEqual/HashEqual/VulnEqual, /root/reference/pkg/assembler/backends/
keyvalue/pkgEqual.go), which GUAC keeps as edges and resolves at query time;
the north rule requires merging duplicate subjects/objects *before*
materializing, so we compute components over the same_as/link edge set and
rewrite every triple endpoint to its component's canonical id.

Algorithm: iterative min-label propagation —
    label(v) <- min(label(v), min over neighbors u of label(u))
repeated until fixpoint. Deterministic: the winner is the lexicographically
smallest node id in the component, independent of partition order or
parallelism ('ent:org/...' style canonical ids sort before provisional
'ent:unk/...' ids, so a merged component is always named by its dictionary
entity). Iterations are driver-controlled with localCheckpoint between
rounds to cut lineage (SURVEY.md §4 item 2).

Skew: min() per node uses salted two-level aggregation (skew.py) so a
celebrity node with millions of incident edges never lands on a single
reducer. Convergence is O(component diameter) rounds; transcript same_as
chains are short (<= a few hops), and max_iter guards the pathological case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .skew import salted_agg


def _union_find_local(pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Exact driver-side union-find (min node id wins as component label)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = {n for p in pairs for n in p}
    return [(n, find(n)) for n in sorted(nodes)]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    n_salts: int = 16,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Compute components of the undirected graph given by (src, dst) rows.

    Returns (node string, component string) for every node appearing in
    `edges`; `component` is the min node id of its component. Nodes not in
    any edge are simply absent (callers treat missing as identity).

    Two physical strategies with identical output:
      * edge set fits the driver (<= driver_threshold rows): exact
        union-find locally — the equivalence graph is orders of magnitude
        smaller than the corpus (only same_as/link pairs), so even at
        10^12 turns it is usually driver-sized; collect + solve beats
        O(diameter) distributed rounds.
      * otherwise: salted min-label propagation (below), O(diameter)
        shuffles over the edge set only.
    """
    spark = edges.sparkSession
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        pairs = [
            (r[0], r[1]) for r in edges.select(src, dst).distinct().collect()
        ]
        rows = _union_find_local(pairs)
        if not rows:
            return spark.createDataFrame([], "node string, component string")
        return spark.createDataFrame(rows, "node string, component string")
    # undirected: both directions, plus self rows so isolated endpoints keep
    # a label
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .distinct()
    )
    e = e.repartition("a").localCheckpoint(eager=True)
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate labels flowing across edges: neighbor's current label
        nbr = (
            e.join(labels.withColumnRenamed("node", "b"), on="b")
            .select(F.col("a").alias("node"), "label")
        )
        # salted two-level min — hot nodes spread over n_salts reducers
        new_min = salted_agg(
            nbr.unionByName(labels),
            keys=["node"],
            aggs={"label": "min"},
            n_salts=n_salts,
        ).withColumnRenamed("min_label", "new_label")
        changed_df = (
            new_min.join(labels, on="node")
            .filter(F.col("new_label") != F.col("label"))
        )
        changed = changed_df.limit(1).count()
        labels = (
            new_min.select("node", F.col("new_label").alias("label"))
            .localCheckpoint(eager=True)
        )
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    return labels.select("node", F.col("label").alias("component"))


def apply_mapping(
    df: DataFrame, mapping: DataFrame, cols: list[str]
) -> DataFrame:
    """Rewrite id columns through the component mapping (identity on miss).

    The mapping (distinct entities) is orders of magnitude smaller than the
    triple stream — broadcast it so the rewrite never shuffles the stream.
    """
    out = df
    m = F.broadcast(mapping)
    for c in cols:
        out = (
            out.join(
                m.withColumnRenamed("node", c).withColumnRenamed(
                    "component", f"_cc_{c}"
                ),
                on=c,
                how="left",
            )
            .withColumn(c, F.coalesce(F.col(f"_cc_{c}"), F.col(c)))
            .drop(f"_cc_{c}")
        )
    return out
