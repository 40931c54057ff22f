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
    """Versioned tables (Iceberg-lite): every write creates a new
    immutable snapshot directory `{table}/_v{n}`; the manifest's
    `version` points at the current one and `snapshots` keeps the
    history (run_id, rows, content hash per version). `read(version=k)`
    time-travels; `expire_snapshots` bounds disk. Swapping this layer
    for real Iceberg keeps the pipeline code unchanged."""

    KEEP_SNAPSHOTS = 2

    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def table_dir(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def path(self, table: str, version: int | None = None) -> str:
        """Data dir of a snapshot (default: current). For a table that
        has never been written, returns the would-be v1 dir (useful
        only for fingerprinting of absent inputs)."""
        if version is None:
            m = self.manifest(table)
            version = m["version"] if m and "version" in m else 1
        return os.path.join(self.table_dir(table), f"_v{version}")

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
        defer_manifest: bool = False,
    ) -> dict:
        """Write parquet + manifest; manifest lands last (commit marker).

        Row count comes from the caller (e.g. an Observation collected
        during the write job) or, failing that, from the parquet
        footers — never from a second full scan of the data.

        With defer_manifest=True the data is written but the manifest
        file is NOT: the caller enriches the returned dict (e.g. with
        Observation-collected rows/content_hash) and commits it via
        finalize(). This keeps the commit marker a single atomic dump —
        a crash between two dumps could otherwise leave a `complete`
        manifest missing content_hash, which a resumed run would skip
        and downstream consumers would KeyError on.
        """
        prev = self.manifest(table)
        version = (prev["version"] + 1) if prev and "version" in prev else 1
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        t0 = time.time()
        w.parquet(self.path(table, version))
        if rows is None:
            rows = sum(r for _, r, _ in self.file_stats(table, version))
        snapshots = list(prev.get("snapshots", [])) if prev else []
        snapshots.append({"version": version, "rows": rows,
                          **({"run_id": extra["run_id"]}
                             if extra and "run_id" in extra else {})})
        manifest = {
            "table": table,
            "complete": True,
            "version": version,
            "rows": rows,
            "schema": df.schema.jsonValue(),
            "partition_by": partition_by or [],
            "inputs_fingerprint": inputs_fingerprint,
            "wall_s": round(time.time() - t0, 3),
            "snapshots": snapshots,
            **(extra or {}),
        }
        if defer_manifest:
            return manifest
        return self.finalize(table, manifest)

    def finalize(self, table: str, manifest: dict) -> dict:
        """Atomically commit a manifest (single dump) + expire old
        snapshots — the one place the commit marker is born."""
        with open(self.manifest_path(table), "w") as f:
            json.dump(manifest, f, indent=2)
        self.expire_snapshots(table, keep=self.KEEP_SNAPSHOTS)
        return manifest

    def expire_snapshots(self, table: str, keep: int = 2) -> None:
        """Drop snapshot data dirs older than the newest `keep`
        (manifest history rows are retained)."""
        import shutil

        m = self.manifest(table)
        if not m or "version" not in m:
            return
        cur = m["version"]
        base = self.table_dir(table)
        if not os.path.isdir(base):
            return
        for name in os.listdir(base):
            if name.startswith("_v"):
                try:
                    v = int(name[2:])
                except ValueError:
                    continue
                if v <= cur - keep:
                    shutil.rmtree(os.path.join(base, name),
                                  ignore_errors=True)

    def file_stats(self, table: str,
                   version: int | None = None) -> list[tuple[str, int, int]]:
        """(relpath, rows, bytes) per output parquet file, straight from
        the footers (driver-side metadata read; no data scan). One file
        per write task -> these are the per-partition lineage counters."""
        import pyarrow.parquet as pq

        root = self.path(table, version)
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

    def read(self, spark: SparkSession, table: str,
             version: int | None = None) -> DataFrame:
        """Read the current snapshot, or time-travel to `version`."""
        return spark.read.parquet(self.path(table, version))

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
