"""Checkpoint-resumable pipeline runner (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Each stage writes its output table(s) as parquet + a manifest through
kgx.spark.io.TableIO; the manifest lands only after a successful write
(commit marker) and records an inputs fingerprint. On re-run, a stage
whose manifest is complete AND whose inputs fingerprint is unchanged is
skipped — so a run killed after stage k resumes at k+1 and produces
byte-identical output (tested in tests/test_resume.py).

Per-partition lineage: after each stage commit, a `mapInPandas` pass
over the materialized table emits one row per partition —
(run_id, stage, table, partition_id, rows, bytes, content_hash,
wall_ms) — appended to the `metrics` table. Content hashes are
order-insensitive (sum of per-row sha256-derived ints mod 2^63) so the
table-level hash is invariant under partitioning/parallelism; this is
what the local[8]-vs-local[32] equality assertion in bench uses.

CLI (also the spark-submit entry point; see scripts/submit.sh):

    python -m kgx.spark.run --input fixtures/bench --out /tmp/wh \
        --run-id r1 --stages all [--buckets 32] [--stop-after tag]

`--stop-after` simulates a mid-run failure for resume tests.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgx.spark import stages
from kgx.spark.io import TableIO, fingerprint_paths
from kgx.spark.udfs import make_tagger_udf
from kgx.tagcore import TaggerArtifact

STAGES = ("ingest", "tag", "extract", "link", "canon", "materialize")

METRICS_SCHEMA = (
    "run_id string, stage string, table string, partition_id int, "
    "rows bigint, bytes bigint, content_hash string"
)


def partition_lineage(df: DataFrame, run_id: str, stage: str,
                      table: str) -> DataFrame:
    """One row per partition: rows, approx bytes, order-insensitive
    content hash. Pure mapInPandas (Arrow-batched, no per-row Python
    beyond pandas' own vectorized ops)."""
    cols = df.columns

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        rows = 0
        nbytes = 0
        acc = 0
        for pdf in batches:
            rows += len(pdf)
            nbytes += int(pdf.memory_usage(index=False, deep=True).sum())
            joined = pdf.astype(str).agg("\x1f".join, axis=1)
            for s in joined:
                h = hashlib.sha256(s.encode("utf-8", "replace")).digest()
                acc = (acc + int.from_bytes(h[:8], "big")) % (1 << 63)
        yield pd.DataFrame(
            {
                "run_id": [run_id],
                "stage": [stage],
                "table": [table],
                "partition_id": [pid],
                "rows": [rows],
                "bytes": [nbytes],
                "content_hash": [format(acc, "016x")],
            }
        )

    return df.select(cols).mapInPandas(fn, METRICS_SCHEMA)


def table_content_hash(metrics_rows: list[dict]) -> str:
    """Partitioning-invariant table hash: sum of partition hashes."""
    acc = sum(int(r["content_hash"], 16) for r in metrics_rows) % (1 << 63)
    return format(acc, "016x")


class Runner:
    def __init__(self, spark: SparkSession, input_dir: str, out: str,
                 run_id: str, buckets: int = 32):
        self.spark = spark
        self.input_dir = input_dir
        self.io = TableIO(out)
        self.run_id = run_id
        self.buckets = buckets
        self.artifact_path = os.path.join(input_dir, "tagger_v1.npz")
        self._tagger = None
        self.events: list[dict] = []

    # -- plumbing ------------------------------------------------------

    def tagger(self):
        if self._tagger is None:
            self._tagger = make_tagger_udf(
                self.spark, TaggerArtifact.load(self.artifact_path)
            )
        return self._tagger

    def in_path(self, name: str) -> str:
        return os.path.join(self.input_dir, f"{name}.parquet")

    def _commit(self, stage: str, table: str, df: DataFrame,
                fingerprint: str, partition_by=None) -> None:
        t0 = time.time()
        man = self.io.write(df, table, partition_by=partition_by,
                            inputs_fingerprint=fingerprint,
                            extra={"run_id": self.run_id, "stage": stage})
        back = self.io.read(self.spark, table)
        mrows = [r.asDict() for r in
                 partition_lineage(back, self.run_id, stage, table)
                 .collect()]
        mdf = self.spark.createDataFrame(mrows, METRICS_SCHEMA).withColumn(
            "wall_ms", F.lit(int((time.time() - t0) * 1000))
        )
        mdf.write.mode("append").parquet(self.io.path("metrics"))
        self.events.append(
            {"stage": stage, "table": table, "rows": man["rows"],
             "partitions": len(mrows),
             "content_hash": table_content_hash(mrows),
             "wall_s": round(time.time() - t0, 3), "skipped": False}
        )

    def _stage(self, stage: str, outputs: dict[str, DataFrame],
               input_paths: list[str], partition_by=None) -> None:
        fp = fingerprint_paths(*input_paths) + f"|b{self.buckets}"
        pending = [t for t in outputs
                   if not self.io.is_complete(t, fp)]
        if not pending:
            for t in outputs:
                self.events.append(
                    {"stage": stage, "table": t, "skipped": True,
                     "rows": self.io.manifest(t)["rows"]}
                )
            return
        for t, df in outputs.items():
            self._commit(stage, t, df, fp, partition_by=partition_by)

    def read(self, table: str) -> DataFrame:
        return self.io.read(self.spark, table)

    # -- stages --------------------------------------------------------

    def run(self, upto: str | None = None, only=None) -> list[dict]:
        wanted = list(STAGES if not only else only)
        for stage in wanted:
            getattr(self, f"stage_{stage}")()
            if upto is not None and stage == upto:
                break
        return self.events

    def stage_ingest(self):
        turns = stages.ingest(self.spark, self.in_path("transcripts"),
                              buckets=self.buckets)
        turns = turns.withColumn(
            "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(self.buckets))
        )
        self._stage("ingest", {"turns": turns},
                    [self.in_path("transcripts")], partition_by=["bucket"])

    def stage_tag(self):
        turns = self.read("turns")
        tagged = stages.tag(turns, self.tagger())
        # spans checkpointed; tags themselves are derivable + bulky
        self._stage("tag", {"tagged": tagged.drop("tags")},
                    [self.io.path("turns"), self.artifact_path],
                    partition_by=["bucket"])

    def stage_extract(self):
        tagged = self.read("tagged")
        patterns_rows = [
            r.asDict()
            for r in self.spark.read.parquet(
                self.in_path("patterns")).collect()
        ]
        triples = stages.extract(tagged, patterns_rows)
        mentions = stages.mentions_of(tagged)
        self._stage("extract",
                    {"triples_raw": triples, "mentions": mentions},
                    [self.io.path("tagged"), self.in_path("patterns")])

    def stage_link(self):
        mentions = self.read("mentions")
        dict_df = stages.dict_latest(
            self.spark.read.parquet(self.in_path("alias_dict")))
        links, nodes, lsh_edges = stages.link(mentions, dict_df)
        self._stage("link",
                    {"links": links, "nodes": nodes,
                     "lsh_edges": lsh_edges},
                    [self.io.path("mentions"),
                     self.in_path("alias_dict")])

    def stage_canon(self):
        labels = stages.connected_components(self.read("nodes"),
                                             self.read("lsh_edges"))
        entity_map, cc_vertices = stages.canonicalize(self.read("nodes"),
                                                      labels)
        self._stage("canon",
                    {"entity_map": entity_map,
                     "cc_vertices": cc_vertices},
                    [self.io.path("nodes"), self.io.path("lsh_edges")])

    def stage_materialize(self):
        dict_df = stages.dict_latest(
            self.spark.read.parquet(self.in_path("alias_dict")))
        edges, vertices = stages.materialize(
            self.read("triples_raw"), dict_df,
            self.read("entity_map"), self.read("cc_vertices"))
        self._stage("materialize",
                    {"edges": edges, "vertices": vertices},
                    [self.io.path("triples_raw"),
                     self.io.path("entity_map"),
                     self.io.path("cc_vertices"),
                     self.in_path("alias_dict")])


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", default="r0")
    ap.add_argument("--stages", default="all")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--stop-after", default=None,
                    help="simulate failure after this stage (resume test)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from kgx.spark.session import get_spark

    spark = get_spark("kgx-run", cores=args.cores)
    only = None if args.stages == "all" else args.stages.split(",")
    t0 = time.time()
    runner = Runner(spark, args.input, args.out, args.run_id,
                    buckets=args.buckets)
    events = runner.run(upto=args.stop_after, only=only)
    report = {
        "run_id": args.run_id,
        "wall_s": round(time.time() - t0, 3),
        "stages": events,
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
