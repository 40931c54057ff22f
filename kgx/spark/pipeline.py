"""End-to-end pipeline assembly (in-memory; checkpointed runner in
kgx.spark.run adds manifests/resume around the same stages)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kgx.spark import stages
from kgx.spark.udfs import make_tagger_udf
from kgx.tagcore import TaggerArtifact


def run_pipeline(
    spark: SparkSession,
    transcripts_path: str,
    alias_dict_path: str,
    patterns_path: str,
    artifact_path: str,
    buckets: int = 32,
) -> dict[str, DataFrame]:
    artifact = TaggerArtifact.load(artifact_path)
    tagger = make_tagger_udf(spark, artifact)

    turns = stages.ingest(spark, transcripts_path, buckets=buckets)
    tagged = stages.tag(turns, tagger)
    mentions = stages.mentions_of(tagged)

    patterns_rows = [
        r.asDict() for r in spark.read.parquet(patterns_path).collect()
    ]
    triples_raw = stages.extract(tagged, patterns_rows)

    dict_df = stages.dict_latest(spark.read.parquet(alias_dict_path))
    links, nodes, lsh_edges = stages.link(mentions, dict_df)

    labels = stages.connected_components(nodes, lsh_edges)
    entity_map, cc_vertices = stages.canonicalize(nodes, labels)

    edges, vertices = stages.materialize(
        triples_raw, dict_df, entity_map, cc_vertices
    )
    return {
        "turns": turns,
        "tagged": tagged,
        "mentions": mentions,
        "triples_raw": triples_raw,
        "links": links,
        "nodes": nodes,
        "lsh_edges": lsh_edges,
        "entity_map": entity_map,
        "edges": edges,
        "vertices": vertices,
    }


def run_fixture_pipeline(
    spark: SparkSession, fixture_dir: str, buckets: int = 32,
    artifact: str = "tagger_v1.npz",
) -> dict[str, DataFrame]:
    return run_pipeline(
        spark,
        f"{fixture_dir}/transcripts.parquet",
        f"{fixture_dir}/alias_dict.parquet",
        f"{fixture_dir}/patterns.parquet",
        f"{fixture_dir}/{artifact}",
        buckets=buckets,
    )
