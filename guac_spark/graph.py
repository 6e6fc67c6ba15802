"""Graph query surface over the materialized vertex/edge tables.

Re-expresses GUAC's GraphQL backend interface (/root/reference/pkg/
assembler/backends/backends.go:27-185) and client-side analytics
(/root/reference/pkg/guacanalytics/) as declarative Spark plans:

  * point/batch lookup, filtered scans, keyset pagination, substring search
    — single-table filters Catalyst pushes into the parquet/Iceberg scan;
  * neighbor expansion — two hash joins instead of GUAC's per-node
    adjacency backlinks;
  * path/BFS/toposort — set-at-a-time frontier joins instead of GUAC's one
    RPC round-trip per node (patchPlanning.go:131), the scalability
    anti-pattern this engine eliminates;
  * top-dependents / keep-latest — groupBy + window, with salted two-level
    counting for celebrity skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .skew import salted_count


# --- point & filtered lookups (backends.go:29-82) --------------------------

def node(vertices: DataFrame, canonical: str) -> DataFrame:
    """node(id) analog (path.graphql:213-226)."""
    return vertices.filter(F.col("canonical") == canonical)


def nodes(vertices: DataFrame, canonicals: list[str]) -> DataFrame:
    return vertices.filter(F.col("canonical").isin(canonicals))


def filter_vertices(vertices: DataFrame, kind: str | None = None,
                    contains: str | None = None) -> DataFrame:
    """Conjunctive filter-spec scan; null = wildcard (package.graphql:129)."""
    out = vertices
    if kind is not None:
        out = out.filter(F.col("kind") == kind)
    if contains is not None:
        out = out.filter(F.col("canonical").contains(contains))
    return out


def find_software(vertices: DataFrame, text: str) -> DataFrame:
    """findSoftware substring scan (keyvalue/search.go:131-180)."""
    return vertices.filter(F.col("canonical").contains(text)).select(
        "vertex_id", "kind", "canonical"
    )


def page_vertices(vertices: DataFrame, after: str | None, first: int
                  ) -> DataFrame:
    """Keyset pagination (package.graphql:219-239): ORDER BY id beyond the
    cursor — no OFFSET scan, constant cost per page at any depth."""
    out = vertices
    if after is not None:
        out = out.filter(F.col("vertex_id") > after)
    return out.orderBy("vertex_id").limit(first)


# --- neighbor expansion (path.graphql:202-211) ------------------------------

def neighbors(edges: DataFrame, vertices: DataFrame, canonical: str,
              using_only: list[str] | None = None) -> DataFrame:
    """All adjacent vertices of `canonical`, optionally pred-filtered.

    Two directed halves unioned, then one join to vertices. The seed filter
    prunes the edge scan (pushdown); vertices join is a hash join on the
    canonical key.
    """
    e = edges
    if using_only:
        e = e.filter(F.col("pred").isin(using_only))
    fwd = e.filter(F.col("src") == canonical).select(
        F.col("dst").alias("nbr"), "pred"
    )
    rev = e.filter(F.col("dst") == canonical).select(
        F.col("src").alias("nbr"), "pred"
    )
    adj = fwd.unionByName(rev).distinct()
    return (
        adj.join(vertices, adj["nbr"] == vertices["canonical"])
        .select("vertex_id", "kind", "canonical", "pred")
    )


# --- BFS / shortest paths (keyvalue/path.go:83-152) -------------------------

def bfs_distances(edges: DataFrame, seed: str, max_hops: int = 4,
                  using_only: list[str] | None = None,
                  directed: bool = False) -> DataFrame:
    """(node, dist) for every node within max_hops of seed.

    Iterative frontier expansion: per hop, one hash join frontier⋈edges and
    one anti-join against visited. Set-at-a-time — the whole frontier moves
    in one shuffle regardless of node count (vs GUAC's RPC-per-node BFS).
    localCheckpoint per hop cuts lineage for deep traversals.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst", "pred")
    if using_only:
        e = e.filter(F.col("pred").isin(using_only))
    adj = e.select("src", "dst")
    if not directed:
        adj = adj.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    adj = adj.distinct().localCheckpoint(eager=True)

    visited = spark.createDataFrame([(seed, 0)], "node string, dist int")
    frontier = visited
    for hop in range(1, max_hops + 1):
        # frontier/visited are tiny relative to the edge table — broadcast
        # both so each hop is a single scan of adj with zero shuffle
        nxt = (
            adj.join(F.broadcast(frontier), frontier["node"] == adj["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(F.broadcast(visited.select("node")), on="node",
                  how="left_anti")
            .withColumn("dist", F.lit(hop))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def shortest_path_len(edges: DataFrame, a: str, b: str, max_hops: int = 6,
                      using_only: list[str] | None = None) -> int | None:
    """Unweighted shortest path length, None if unreachable in max_hops."""
    d = bfs_distances(edges, a, max_hops, using_only)
    row = d.filter(F.col("node") == b).select(F.min("dist")).first()
    return row[0] if row and row[0] is not None else None


def shortest_path_nodes(edges: DataFrame, a: str, b: str, max_hops: int = 6,
                        using_only: list[str] | None = None
                        ) -> list[str] | None:
    """The actual node path, reconstructed from parent pointers — the
    keyvalue `path` semantics (keyvalue/path.go:83-152). Deterministic:
    each node keeps its lexicographically smallest parent, so among all
    shortest paths the same one is returned at any parallelism.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst", "pred")
    if using_only:
        e = e.filter(F.col("pred").isin(using_only))
    adj = e.select("src", "dst").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    visited = spark.createDataFrame(
        [(a, 0, None)], "node string, dist int, parent string"
    )
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            adj.join(F.broadcast(frontier), frontier["node"] == adj["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("src").alias("parent"))  # deterministic parent
            .join(F.broadcast(visited.select("node")), on="node",
                  how="left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            return None
        visited = visited.unionByName(
            nxt.select("node", "dist", "parent")
        ).localCheckpoint(eager=True)
        if nxt.filter(F.col("node") == b).limit(1).count() > 0:
            break
        frontier = nxt.select("node")
    parents = {r["node"]: r["parent"] for r in visited.collect()}
    if b not in parents:
        return None
    path = [b]
    while path[-1] != a:
        path.append(parents[path[-1]])
    return list(reversed(path))


# --- toposort (guacanalytics/toposort.go:26-61) ------------------------------

def toposort_levels(edges: DataFrame, pred: str = "replies_to") -> DataFrame:
    """Kahn's algorithm levels over the directed `pred` subgraph.

    Edge (src, dst) reads 'src depends on dst' (a reply depends on its
    parent turn), so level(node) = 0 for nodes with no dst-edges, else
    1 + max(level of its parents). Iterative peel: per round, remove
    in-degree-0 nodes; raises on cycles like the reference.
    """
    e = (
        edges.filter(F.col("pred") == pred)
        .select(F.col("src").alias("child"), F.col("dst").alias("parent"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes_df = (
        e.select(F.col("child").alias("node"))
        .unionByName(e.select(F.col("parent").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    out = spark.createDataFrame([], "node string, level int")
    remaining_e = e
    remaining_n = nodes_df
    level = 0
    while remaining_n.limit(1).count() > 0:
        # nodes with no remaining parent edge are free this round; the free
        # set is one peel layer — broadcast it into the anti-joins
        free = remaining_n.join(
            remaining_e.select(F.col("child").alias("node")).distinct(),
            on="node",
            how="left_anti",
        ).localCheckpoint(eager=True)
        if free.limit(1).count() == 0:
            raise ValueError(f"cycle detected in {pred!r} subgraph")
        out = out.unionByName(free.withColumn("level", F.lit(level)))
        remaining_n = remaining_n.join(
            F.broadcast(free), on="node", how="left_anti"
        ).localCheckpoint(eager=True)
        remaining_e = remaining_e.join(
            F.broadcast(free.withColumnRenamed("node", "parent")),
            on="parent", how="left_anti"
        ).localCheckpoint(eager=True)
        level += 1
    return out


# --- analytics (guacrest/openapi.yaml:31-56; keyvalue/search.go) -------------

def top_dependents(edges: DataFrame, pred: str = "mentions", k: int = 10
                   ) -> DataFrame:
    """'Most important dependencies': rank entities by citing-edge count.

    Salted two-level count — the celebrity entity concentrates a large
    fraction of all mention edges, exactly the hot-reducer case.
    """
    cited = edges.filter(F.col("pred") == pred).select(
        F.col("dst").alias("entity")
    )
    counts = salted_count(cited, ["entity"], out="n_mentions")
    return counts.orderBy(F.desc("n_mentions"), "entity").limit(k)


def known(edges: DataFrame, canonical: str) -> DataFrame:
    """'query known' analog: evidence counts per predicate for one noun
    (/root/reference/cmd/guacone/cmd/known.go:87-88)."""
    touching = edges.filter(
        (F.col("src") == canonical) | (F.col("dst") == canonical)
    )
    return touching.groupBy("pred").agg(
        F.count("*").cast("long").alias("n_edges")
    )


def keep_latest(df: DataFrame, keys: list[str], ts_col: str,
                tiebreak: list[str] | None = None) -> DataFrame:
    """Keep-latest-scan dedup (keyvalue/search.go:71-95): one row per key,
    the one with the max timestamp; `tiebreak` columns make the winner
    deterministic when timestamps collide."""
    order = [F.desc(ts_col)] + [F.desc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stale_entities(triples: DataFrame, transcripts: DataFrame,
                   cutoff: str) -> DataFrame:
    """findPackagesThatNeedScanning analog (search.graphql:82-98): entities
    whose latest mention is older than the cutoff — the staleness watermark
    driving GUAC's certifier re-scan loop (root_package.go:53-148)."""
    mention_ts = (
        triples.filter(F.col("pred") == "mentions")
        .join(transcripts.select("conv_id", "turn_idx", "ts"),
              on=["conv_id", "turn_idx"])
        .groupBy(F.col("obj").alias("entity"))
        .agg(F.max("ts").alias("last_seen"))
    )
    return mention_ts.filter(F.col("last_seen") < F.lit(cutoff))


def conversation_rollup(edges: DataFrame) -> DataFrame:
    """HasSBOM inclusion-list analog (hasSBOM.graphql:40-45): per
    conversation, the deduplicated counts of touched vertices and edges."""
    return edges.groupBy(F.col("origin").alias("conv_id")).agg(
        F.count_distinct("edge_id").alias("n_edges"),
        F.count_distinct("dst").alias("n_entities"),
    )
