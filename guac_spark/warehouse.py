"""Snapshot-committed parquet warehouse with per-partition lineage.

The sandbox image carries no Iceberg runtime jar, so this module provides
the same *semantics* on plain parquet: each table write lands in a fresh
`snap-<n>` directory and becomes visible only when the commit log
(`_commits.json`) is atomically replaced — readers always see the last
committed snapshot, a killed writer leaves no partial state, and a re-run
resumes from the last committed snapshot exactly (north-rule requirement).
On a real cluster every call here maps 1:1 onto Iceberg:
    write_snapshot  -> df.writeTo(tbl).createOrReplace() / MERGE INTO
    append_snapshot -> df.writeTo(tbl).append()  (O(new rows), snapshot
                       references prior manifests — no table rewrite)
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
        # commit-log read-modify-write guard: independent stages (e.g.
        # vertices + edges) commit concurrently from writer threads
        import threading

        self._log_lock = threading.Lock()

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

    def committed_paths(self, table: str) -> list[str] | None:
        """Data directories of the committed snapshot (an append snapshot
        references prior directories plus the new one, like an Iceberg
        snapshot referencing prior manifests)."""
        entry = self._read_log()["tables"].get(table)
        if entry is None:
            return None
        return entry.get("paths") or [entry["path"]]

    def table_path(self, table: str, snapshot_id: int) -> str:
        return os.path.join(self.root, table, f"snap-{snapshot_id}")

    @staticmethod
    def _file_lineage(path: str) -> list[tuple[int, int]]:
        """(partition_id, rows) per data file from parquet footers only —
        no second Spark job over the written data. The part index in the
        file name is the writing task's partition id."""
        import pyarrow.parquet as pq

        out = []
        for dirpath, _dirs, files in os.walk(path):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                try:
                    pid = int(fn.split("-")[1])
                except (IndexError, ValueError):
                    pid = -1
                meta = pq.read_metadata(os.path.join(dirpath, fn))
                out.append((pid, meta.num_rows))
        return out

    # --- write ------------------------------------------------------------
    def write_snapshot(
        self,
        df: DataFrame,
        table: str,
        stage: str | None = None,
        partition_by: list[str] | None = None,
        bucket_by: tuple[int, list[str]] | None = None,
    ) -> int:
        """Write df as the next snapshot of `table`; returns snapshot id.

        Per-partition lineage comes from the written parquet footers (file
        name part index = writing task partition id) — one metadata read
        per file on the driver, no second Spark job over the data.

        bucket_by=(n, cols) hash-buckets the files and registers the
        snapshot in the session catalog so downstream aggregations on a
        superset of `cols` need NO shuffle (the Iceberg bucket-partition /
        sort-order analog). The bucket metadata lives in the session
        catalog; a later session falls back to a plain parquet read of the
        same files (correct, just re-shuffles) — on a real cluster the
        catalog (Hive/Iceberg) persists it.
        """
        return self._write(df, table, stage, partition_by, append=False,
                           bucket_by=bucket_by)

    def append_snapshot(
        self, df: DataFrame, table: str, stage: str | None = None
    ) -> int:
        """Append-only commit: write ONLY the new rows as a fresh data
        directory; the new snapshot references all prior directories plus
        this one (the Iceberg append-snapshot analog). Cost is O(new rows)
        regardless of table size — the shape a 100 TB enrichment loop
        needs. Readers of older snapshots are unaffected (their directory
        lists are immutable)."""
        return self._write(df, table, stage, None, append=True)

    def _write(
        self,
        df: DataFrame,
        table: str,
        stage: str | None,
        partition_by: list[str] | None,
        append: bool,
        bucket_by: tuple[int, list[str]] | None = None,
    ) -> int:
        t0 = time.time()
        prev = self.committed_snapshot(table)
        snap = (prev or 0) + 1
        path = self.table_path(table, snap)
        if os.path.exists(path):
            shutil.rmtree(path)  # leftover from a killed run — never committed
        catalog_table = None
        if bucket_by:
            import hashlib

            n_buckets, cols = bucket_by
            tag = hashlib.sha256(self.root.encode()).hexdigest()[:8]
            catalog_table = f"wh_{tag}_{table}_snap_{snap}".replace("-", "_")
            df.sparkSession.sql(f"DROP TABLE IF EXISTS {catalog_table}")
            (
                df.write.mode("overwrite").format("parquet")
                .option("path", path)
                .bucketBy(n_buckets, *cols)
                .saveAsTable(catalog_table)
            )
        else:
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(path)
        lineage = self._file_lineage(path)
        wall = time.time() - t0
        now = time.time()
        metrics_rows = [
            (stage or table, table, snap, pid, rows, wall, now)
            for pid, rows in lineage
        ] or [(stage or table, table, snap, -1, 0, wall, now)]
        self._append_metrics(df.sparkSession, metrics_rows)
        new_rows = int(sum(r for _, r in lineage))
        with self._log_lock:
            log = self._read_log()
            paths = [path]
            rows = new_rows
            if append and prev is not None:
                entry = log["tables"].get(table, {})
                paths = (entry.get("paths") or [entry["path"]]) + [path]
                if entry.get("rows") is not None:
                    rows += entry["rows"]
            entry = {
                "snapshot_id": snap,
                "paths": paths,
                "committed_at": now,
                "stage": stage or table,
                # committed row count, already known from the footers —
                # readers need no count() job (Iceberg snapshot-summary
                # total-records analog)
                "rows": rows,
            }
            if catalog_table:
                entry["catalog_table"] = catalog_table
            log["tables"][table] = entry
            self._write_log(log)
        return snap

    def committed_rows(self, table: str) -> int | None:
        """Row count of the committed snapshot from the commit log (the
        Iceberg snapshot-summary total-records analog); None for legacy
        commits that predate the field."""
        entry = self._read_log()["tables"].get(table)
        if entry is None:
            return None
        return entry.get("rows")

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
        entry = self._read_log()["tables"].get(table)
        if entry is None:
            raise FileNotFoundError(f"table {table!r} has no committed snapshot")
        # bucketed snapshot: read through the catalog so the scan reports
        # its hash partitioning and downstream aggs skip the shuffle
        cat = entry.get("catalog_table")
        if cat and spark.catalog.tableExists(cat):
            return spark.table(cat)
        paths = entry.get("paths") or [entry["path"]]
        df = spark.read.parquet(*paths)
        if "_part_id" in df.columns:  # legacy snapshots stamped lineage
            df = df.drop("_part_id")
        return df

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "metrics"))

    def has(self, table: str) -> bool:
        return self.committed_snapshot(table) is not None

    # --- merge-on-read upsert (the Iceberg `MERGE INTO ... WHEN MATCHED
    #     THEN UPDATE` analog with equality deletes: new versions append,
    #     reads resolve latest-wins, compaction folds back) ---------------

    def merge_upsert(
        self, df: DataFrame, table: str, stage: str | None = None
    ) -> int:
        """Upsert rows by key WITHOUT touching the base table: append to
        a companion `<table>__upserts` table stamped with a commit
        sequence. Cost is O(upserted rows) — the merge-on-read half of
        Iceberg's MERGE INTO. Rows within one call must be unique per
        key (the caller's MERGE source contract). Resolve with
        read_merged; fold back with compact_merged."""
        ut = f"{table}__upserts"
        seq = (self.committed_snapshot(ut) or 0) + 1
        return self.append_snapshot(
            df.withColumn("_seq", F.lit(seq)), ut,
            stage or f"upsert_{table}",
        )

    def read_merged(
        self, spark: SparkSession, table: str, key_cols: list[str]
    ) -> DataFrame:
        """Base table with upserts applied, latest commit wins per key —
        the read-side merge. No upserts committed => plain read."""
        from pyspark.sql import Window

        base = self.read(spark, table)
        ut = f"{table}__upserts"
        if not self.has(ut):
            return base
        allr = base.withColumn("_seq", F.lit(0)).unionByName(
            self.read(spark, ut)
        )
        w = Window.partitionBy(*key_cols).orderBy(F.desc("_seq"))
        return (
            allr.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_seq")
        )

    def compact_merged(
        self, spark: SparkSession, table: str, key_cols: list[str]
    ) -> int:
        """Fold upserts into a fresh base snapshot and retire the
        companion table (files stay on disk for time travel) — the
        Iceberg rewrite-data-files compaction analog."""
        merged = self.read_merged(spark, table, key_cols)
        snap = self.write_snapshot(merged, table, stage="compact")
        ut = f"{table}__upserts"
        with self._log_lock:
            log = self._read_log()
            log["tables"].pop(ut, None)
            self._write_log(log)
        return snap

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
        # cascade into appended enrichment evidence too (compacts the
        # evidence directory list back to one dir as a side effect)
        if self.has("edges_evidence"):
            ev = self.read(spark, "edges_evidence")
            ev_keep = ev.filter(
                ~F.col("src").isin(canonicals) & ~F.col("dst").isin(canonicals)
            )
            n_e += ev.count() - ev_keep.count()
            self.write_snapshot(ev_keep, "edges_evidence", stage="delete")
        return n_v, n_e
