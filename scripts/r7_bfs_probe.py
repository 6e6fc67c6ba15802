"""Round-7 probe: q_bfs3 (graph.bfs_distances) physical-shape A/B.

The shipped shape pays, per run: one full distinct+localCheckpoint of the
doubled edge set (~2x|E| rows through a shuffle before the first hop) and,
per hop, a distinct on raw expansion rows BEFORE the visited anti-join,
plus a re-checkpoint of the whole growing visited set every hop.

Variants measured (results are a set of (node, dist) — invariant):
  v1 (shipped)  adj distinct+ckpt; hop = join -> distinct -> anti -> ckpt;
                visited re-checkpointed per hop
  v2            no adj distinct/ckpt (scan-per-hop off the bucketed edge
                table); visited = lazy union of checkpointed layers
  v3            v2 + anti-join BEFORE the distinct (map-side broadcast
                anti prunes already-visited rows before the dedup shuffle)

  python scripts/r7_bfs_probe.py [reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from guac_spark import graph, oracle, pipeline  # noqa: E402
from guac_spark.session import get_spark  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"

BLIMIT = graph.BROADCAST_ROW_LIMIT


def _mb(df, n):
    return F.broadcast(df) if n <= BLIMIT else df


def bfs_v2(edges, seed, max_hops=3, anti_first=False):
    spark = edges.sparkSession
    adj = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    visited_parts = [
        spark.createDataFrame([(seed, 0)], "node string, dist int")
    ]
    visited_nodes = visited_parts[0].select("node")
    frontier = visited_parts[0]
    n_frontier, n_visited = 1, 1
    for hop in range(1, max_hops + 1):
        expanded = adj.join(
            _mb(frontier, n_frontier), frontier["node"] == adj["src"]
        ).select(F.col("dst").alias("node"))
        if anti_first:
            nxt = (
                expanded.join(
                    _mb(visited_nodes, n_visited), on="node", how="left_anti"
                )
                .distinct()
                .withColumn("dist", F.lit(hop))
            )
        else:
            nxt = (
                expanded.distinct()
                .join(
                    _mb(visited_nodes, n_visited), on="node", how="left_anti"
                )
                .withColumn("dist", F.lit(hop))
            )
        nxt = nxt.localCheckpoint(eager=True)
        n_frontier = nxt.count()
        if n_frontier == 0:
            break
        visited_parts.append(nxt)
        visited_nodes = visited_nodes.unionByName(nxt.select("node"))
        n_visited += n_frontier
        frontier = nxt
    out = visited_parts[0]
    for p in visited_parts[1:]:
        out = out.unionByName(p)
    return out


def noop(df) -> float:
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t, 3)


def main() -> None:
    import tempfile

    spark = get_spark(app_name="r7_bfs_probe")
    spark.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix="r7bfs_wh_")
    res = pipeline.run_pipeline(spark, SF, warehouse_root=wh)
    edges = res.tables["edges"]
    seed = oracle.SEED_ENTITY

    spark.sparkContext.setJobDescription("parity check")
    a = sorted(map(tuple, graph.bfs_distances(edges, seed, 3).collect()))
    b = sorted(map(tuple, bfs_v2(edges, seed, 3).collect()))
    c = sorted(
        map(tuple, bfs_v2(edges, seed, 3, anti_first=True).collect())
    )
    assert a == b == c, f"MISMATCH {len(a)} {len(b)} {len(c)}"
    print(f"parity ok: {len(a)} nodes identical", file=sys.stderr)

    def timed(fn) -> float:
        # BFS materializes eagerly during construction (checkpoints +
        # counts) — time construction + the bench's .count() action
        t = time.time()
        fn().count()
        return round(time.time() - t, 3)

    out = {"sf": SF, "nodes": len(a), "v1": [], "v2": [], "v3": []}
    for i in range(REPS):
        spark.sparkContext.setJobDescription(f"v1 rep{i}")
        out["v1"].append(timed(lambda: graph.bfs_distances(edges, seed, 3)))
        spark.sparkContext.setJobDescription(f"v2 rep{i}")
        out["v2"].append(timed(lambda: bfs_v2(edges, seed, 3)))
        spark.sparkContext.setJobDescription(f"v3 rep{i}")
        out["v3"].append(
            timed(lambda: bfs_v2(edges, seed, 3, anti_first=True))
        )
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    for k in ("v1", "v2", "v3"):
        out[k + "_median"] = med(out[k])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
