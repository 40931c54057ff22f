"""Streaming incremental link/canon: transcript files arriving over
multiple micro-batches must merge into EXACTLY the canonical graph
the batch pipeline (and the sequential oracle) builds on the full
data — the 'KG streamed forward' path."""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from kgx import oracle
from kgx.spark import stages, streaming
from kgx.spark.io import TableIO
from kgx.spark.pipeline import run_fixture_pipeline
from kgx.spark.udfs import make_tagger_spans_udf
from kgx.tagcore import TaggerArtifact


def test_incremental_canon_equals_batch(spark, t1_dir, tmp_path):
    # two arrival files -> two micro-batches (maxFilesPerTrigger=1)
    t = pq.read_table(f"{t1_dir}/transcripts.parquet")
    arrivals = tmp_path / "arrivals"
    os.makedirs(arrivals)
    cut = "c000020"
    pq.write_table(
        t.filter(pc.less(t["conv_id"], cut)), arrivals / "a.parquet"
    )
    pq.write_table(
        t.filter(pc.greater_equal(t["conv_id"], cut)),
        arrivals / "b.parquet",
    )

    udf = make_tagger_spans_udf(
        spark, TaggerArtifact.load(f"{t1_dir}/tagger_v1.npz")
    )
    dict_df = stages.dict_latest(
        spark.read.parquet(f"{t1_dir}/alias_dict.parquet")
    )
    wh = str(tmp_path / "wh")
    streaming.run_incremental_canon(
        spark, str(arrivals), str(tmp_path / "ckpt"), wh, udf, dict_df,
        max_files_per_trigger=1,
    )

    io = TableIO(wh)
    # the state really went through multiple incremental merges
    assert io.manifest("nodes")["version"] >= 2

    got_map = {
        (r["node_id"], r["canonical_id"])
        for r in io.read(spark, "entity_map").collect()
    }
    batch = run_fixture_pipeline(spark, t1_dir, buckets=8)
    want_map = {
        (r["node_id"], r["canonical_id"])
        for r in batch["entity_map"].collect()
    }
    assert got_map == want_map

    # canonical vertices match the sequential oracle's vertex info
    golden = oracle.run(t1_dir)
    got_v = {
        (r["entity_id"], r["canonical_name"], r["etype"],
         tuple(r["aliases"]))
        for r in io.read(spark, "cc_vertices").collect()
    }
    want_v = {
        (v["entity_id"], v["canonical_name"], v["etype"],
         tuple(v["aliases"]))
        for v in golden["vertices"]
        if v["etype"] != "TOOL"  # tool nodes come from materialize
    }
    assert got_v == want_v

    # incremental edge set equals the batch LSH edge set
    got_e = {
        (r["src"], r["dst"])
        for r in io.read(spark, "lsh_edges").collect()
    }
    want_e = {
        (r["src"], r["dst"]) for r in batch["lsh_edges"].collect()
    }
    assert got_e == want_e
