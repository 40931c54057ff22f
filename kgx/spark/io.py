"""Table IO abstraction: Iceberg-style tables stood in by partitioned
parquet + a JSON manifest (SURVEY.md §7 hard parts: Iceberg runtime
jars are absent in this sandbox; this layer keeps the pipeline code
backend-agnostic so `spark.read.format('iceberg')` is a drop-in).

A manifest records what Iceberg's snapshot metadata would: inputs
fingerprint, row count, schema, completion marker — which is exactly
what stage-level checkpoint/resume needs (BASELINE north_rule:
"resumable from checkpoint with per-partition lineage + metrics").
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def manifest_path(self, table: str) -> str:
        return os.path.join(self.warehouse, f"{table}.manifest.json")

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        inputs_fingerprint: str | None = None,
        extra: dict | None = None,
        rows: int | None = None,
    ) -> dict:
        """Write parquet + manifest; manifest lands last (commit marker).

        Row count comes from the caller (e.g. an Observation collected
        during the write job) or, failing that, from the parquet
        footers — never from a second full scan of the data.
        """
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        t0 = time.time()
        w.parquet(self.path(table))
        if rows is None:
            rows = sum(r for _, r, _ in self.file_stats(table))
        manifest = {
            "table": table,
            "complete": True,
            "rows": rows,
            "schema": df.schema.jsonValue(),
            "partition_by": partition_by or [],
            "inputs_fingerprint": inputs_fingerprint,
            "wall_s": round(time.time() - t0, 3),
            **(extra or {}),
        }
        with open(self.manifest_path(table), "w") as f:
            json.dump(manifest, f, indent=2)
        return manifest

    def file_stats(self, table: str) -> list[tuple[str, int, int]]:
        """(relpath, rows, bytes) per output parquet file, straight from
        the footers (driver-side metadata read; no data scan). One file
        per write task -> these are the per-partition lineage counters."""
        import pyarrow.parquet as pq

        root = self.path(table)
        out = []
        for dp, _, fns in os.walk(root):
            for fn in sorted(fns):
                if not fn.endswith(".parquet"):
                    continue
                p = os.path.join(dp, fn)
                md = pq.ParquetFile(p).metadata
                out.append(
                    (os.path.relpath(p, root), md.num_rows,
                     os.path.getsize(p))
                )
        return out

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def manifest(self, table: str) -> dict | None:
        p = self.manifest_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self, table: str,
                    inputs_fingerprint: str | None = None) -> bool:
        """Resume check: manifest exists, complete, inputs unchanged."""
        m = self.manifest(table)
        if not m or not m.get("complete"):
            return False
        if inputs_fingerprint is not None and (
            m.get("inputs_fingerprint") != inputs_fingerprint
        ):
            return False
        return True


def fingerprint_paths(*paths: str) -> str:
    """Cheap input fingerprint: path + size + mtime of every file."""
    import hashlib

    h = hashlib.sha256()
    for p in sorted(paths):
        if os.path.isdir(p):
            files = sorted(
                os.path.join(dp, f)
                for dp, _, fs in os.walk(p)
                for f in fs
            )
        else:
            files = [p]
        for f in files:
            st = os.stat(f)
            h.update(f"{f}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]
