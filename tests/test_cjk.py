"""CJK tier: the per-character contract (SURVEY A.1 — the reference's
actual target is Chinese NER) proven on multi-byte, no-whitespace
text: Spark pipeline vs oracle parity, char-BIO tagging fidelity, and
span offsets that are CHARACTER (not byte) positions."""

import os

import pytest

from kgx import oracle, synth
from kgx.evalkit import conlleval, triple_prf
from kgx.spark.pipeline import run_fixture_pipeline

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)


@pytest.fixture(scope="module")
def zh_dir() -> str:
    d = os.path.join(FIXDIR, "t1_zh")
    if not os.path.exists(os.path.join(d, "meta.json")):
        synth.generate(d, "t1_zh")
    return d


@pytest.fixture(scope="module")
def zh_out(spark, zh_dir):
    return run_fixture_pipeline(spark, zh_dir, buckets=8)


@pytest.fixture(scope="module")
def zh_golden(zh_dir):
    return oracle.run(zh_dir)


def test_zh_mentions_parity(zh_out, zh_golden):
    cols = ("conv_id", "turn_idx", "begin", "end", "surface", "etype")
    got = {
        tuple(r[c] for c in cols)
        for r in zh_out["mentions"].select(*cols).collect()
    }
    want = {tuple(m[c] for c in cols) for m in zh_golden["mentions"]}
    assert got == want
    # offsets are char positions: every surface must slice back out of
    # a multi-byte text by its (begin, end)
    assert any(len(s[4].encode()) > len(s[4]) for s in got), (
        "expected multi-byte surfaces in the CJK tier"
    )


def test_zh_triple_prf_gate(zh_out, zh_golden):
    ours = {
        (r["subj_id"], r["pred"], r["obj_id"])
        for r in zh_out["edges"].collect()
    }
    m = triple_prf(ours, set(zh_golden["triple_set"]))
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m


def test_zh_edges_parity(zh_out, zh_golden):
    cols = ("subj_id", "pred", "obj_id", "weight")
    got = {
        tuple(r[c] for c in cols)
        for r in zh_out["edges"].select(*cols).collect()
    }
    want = {tuple(e[c] for c in cols) for e in zh_golden["edges"]}
    assert got == want


def test_zh_conlleval_per_char(spark, zh_dir):
    """Tag the Chinese char-BIO eval set with the Spark UDF: one tag
    per CHARACTER, spans exactly reproducing the gold splices."""
    from pyspark.sql import functions as F

    from kgx.spark.udfs import make_tagger_udf
    from kgx.tagcore import TaggerArtifact

    tagger = make_tagger_udf(
        spark, TaggerArtifact.load(f"{zh_dir}/tagger_v1.npz")
    )
    rows = (
        spark.read.parquet(f"{zh_dir}/bio_eval.parquet")
        .withColumn("text", F.concat_ws("", "chars"))
        .withColumn("pred_tags", tagger("text"))
        .collect()
    )
    for r in rows:
        assert len(r["pred_tags"]) == len(r["chars"])  # per-char
    rep = conlleval(
        [list(r["gold_tags"]) for r in rows],
        [list(r["pred_tags"]) for r in rows],
    )
    assert rep["overall"]["f1"] >= 0.95
    assert rep["token_accuracy"] >= 0.99


def test_zh_normalize_and_ids_stable(zh_golden):
    """Content-derived ids must be stable over CJK input (UTF-8
    encoding inside sha16) and normalization must not corrupt CJK."""
    from kgx.contract import normalize, prov_id

    assert normalize("ＫＧ实验室") == "kg实验室"  # NFKC folds full-width
    pid = prov_id("ORG", "华信科技")
    assert pid.startswith("p_") and len(pid) == 18
    assert zh_golden["edges"], "zh pipeline produced no edges"
