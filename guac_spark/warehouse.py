"""Snapshot-committed parquet warehouse with per-partition lineage.

The sandbox image carries no Iceberg runtime jar, so this module provides
the same *semantics* on plain parquet: each table write lands in a fresh
`snap-<n>` directory and becomes visible only when the commit log
(`_commits.json`) is atomically replaced — readers always see the last
committed snapshot, a killed writer leaves no partial state, and a re-run
resumes from the last committed snapshot exactly (north-rule requirement).
On a real cluster every call here maps 1:1 onto Iceberg:
    write_snapshot  -> df.writeTo(tbl).createOrReplace() / MERGE INTO
    read            -> spark.read.format("iceberg").load(tbl)
    commits log     -> Iceberg snapshot metadata
    metrics table   -> a plain Iceberg append-only table
The GUAC analog of the commit log is blob-store sha256 key dedupe + NATS
ack-after-ingest (/root/reference/pkg/handler/processor/process/
process.go:131-139): work already acknowledged is never redone.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "stage string, table string, snapshot_id int, partition_id int, "
    "rows long, wall_sec double, committed_at double"
)


class Warehouse:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._log_path = os.path.join(root, "_commits.json")

    # --- commit log -------------------------------------------------------
    def _read_log(self) -> dict[str, Any]:
        if not os.path.exists(self._log_path):
            return {"tables": {}}
        with open(self._log_path) as f:
            return json.load(f)

    def _write_log(self, log: dict[str, Any]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json")
        with os.fdopen(fd, "w") as f:
            json.dump(log, f, indent=1, sort_keys=True)
        os.replace(tmp, self._log_path)  # atomic commit point

    def committed_snapshot(self, table: str) -> int | None:
        entry = self._read_log()["tables"].get(table)
        return entry["snapshot_id"] if entry else None

    def table_path(self, table: str, snapshot_id: int) -> str:
        return os.path.join(self.root, table, f"snap-{snapshot_id}")

    # --- write ------------------------------------------------------------
    def write_snapshot(
        self,
        df: DataFrame,
        table: str,
        stage: str | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        """Write df as the next snapshot of `table`; returns snapshot id.

        Collects per-partition row counts (lineage) in the same pass and
        appends them to the metrics table before the commit flips.
        """
        t0 = time.time()
        prev = self.committed_snapshot(table)
        snap = (prev or 0) + 1
        path = self.table_path(table, snap)
        if os.path.exists(path):
            shutil.rmtree(path)  # leftover from a killed run — never committed
        # stamp the writing partition id so lineage is recoverable from a
        # single pruned-column scan of the committed files
        stamped = df.withColumn("_part_id", F.spark_partition_id())
        writer = stamped.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        # per-partition lineage: column-pruned scan of _part_id only
        spark = df.sparkSession
        lineage = (
            spark.read.parquet(path)
            .groupBy(F.col("_part_id").alias("partition_id"))
            .count()
            .collect()
        )
        wall = time.time() - t0
        now = time.time()
        metrics_rows = [
            (stage or table, table, snap, r["partition_id"], r["count"],
             wall, now)
            for r in lineage
        ] or [(stage or table, table, snap, -1, 0, wall, now)]
        self._append_metrics(spark, metrics_rows)
        log = self._read_log()
        log["tables"][table] = {
            "snapshot_id": snap,
            "path": path,
            "committed_at": now,
            "stage": stage or table,
        }
        self._write_log(log)
        return snap

    def _append_metrics(self, spark: SparkSession, rows: list[tuple]) -> None:
        # tiny control-plane append — written with pyarrow directly (no
        # Spark job); stays Spark-readable as a plain parquet directory
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        mpath = os.path.join(self.root, "metrics")
        os.makedirs(mpath, exist_ok=True)
        cols = list(zip(*rows))
        table = pa.table(
            {
                "stage": pa.array(cols[0], pa.string()),
                "table": pa.array(cols[1], pa.string()),
                "snapshot_id": pa.array(cols[2], pa.int32()),
                "partition_id": pa.array(cols[3], pa.int32()),
                "rows": pa.array([int(x) for x in cols[4]], pa.int64()),
                "wall_sec": pa.array(cols[5], pa.float64()),
                "committed_at": pa.array(cols[6], pa.float64()),
            }
        )
        pq.write_table(table, os.path.join(mpath, f"{uuid.uuid4().hex}.parquet"))

    # --- read -------------------------------------------------------------
    def read(self, spark: SparkSession, table: str) -> DataFrame:
        snap = self.committed_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"table {table!r} has no committed snapshot")
        df = spark.read.parquet(self.table_path(table, snap))
        if "_part_id" in df.columns:
            df = df.drop("_part_id")
        return df

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "metrics"))

    def has(self, table: str) -> bool:
        return self.committed_snapshot(table) is not None

    # --- delete (the Iceberg `MERGE ... WHEN MATCHED THEN DELETE` analog;
    #     GUAC: delete.graphql / keyvalue path.go:195-197) ----------------
    def delete_vertices(
        self, spark: SparkSession, canonicals: list[str]
    ) -> tuple[int, int]:
        """Remove vertices and every incident edge; returns (n_vertices,
        n_edges) removed. Copy-on-write new snapshots — time travel to the
        pre-delete snapshot stays possible via the snap-N directories."""
        verts = self.read(spark, "vertices")
        edges = self.read(spark, "edges")
        kill = F.col("canonical").isin(canonicals)
        v_keep = verts.filter(~kill)
        e_keep = edges.filter(
            ~F.col("src").isin(canonicals) & ~F.col("dst").isin(canonicals)
        )
        n_v = verts.count() - v_keep.count()
        n_e = edges.count() - e_keep.count()
        self.write_snapshot(v_keep, "vertices", stage="delete")
        self.write_snapshot(e_keep, "edges", stage="delete")
        return n_v, n_e
