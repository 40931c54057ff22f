"""The discriminative eval tier (t2_noisy): gold the frozen lexicon
tagger cannot ace. Pins the three contracts that make the tier
meaningful — F1 is measurably below 1.0 (a graceful tagging regression
now moves the number), the v2 cue-gated slot separates from v1 on
precision (the slots are behaviorally distinct under the SAME gold),
and the Spark tagger's predictions equal the sequential oracle's
sentence-for-sentence (pipeline non-divergence stays the hard gate,
independent of gold quality)."""

import os

import pytest

from kgx import synth
from kgx.evalkit import conlleval
from kgx.tagcore import (
    TAGS,
    LexiconMatcher,
    TaggerArtifact,
    make_emitter,
    viterbi,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "fixtures", "t2_noisy")


@pytest.fixture(scope="module")
def noisy_dir():
    if not os.path.exists(os.path.join(FIXTURE, "meta.json")):
        synth.generate(FIXTURE, "t2_noisy")
    return FIXTURE


def _seq_report(art, chars_col, gold):
    emit = make_emitter(art, LexiconMatcher(art))
    preds = [
        [TAGS[i] for i in viterbi(emit("".join(cs)), art.transitions)]
        for cs in chars_col
    ]
    return conlleval(gold, preds), preds


def test_noisy_gold_is_discriminative_and_slot_separating(noisy_dir):
    ents = synth.build_gazetteer()
    synth._assert_oov_disjoint(ents)
    _, chars_col, gold = synth.bio_eval_rows_noisy(ents, 500)
    v1 = TaggerArtifact.load(f"{noisy_dir}/tagger_v1.npz")
    v2 = TaggerArtifact.load(f"{noisy_dir}/tagger_v2.npz")
    r1, _ = _seq_report(v1, chars_col, gold)
    r2, _ = _seq_report(v2, chars_col, gold)
    f1_v1, f1_v2 = r1["overall"]["f1"], r2["overall"]["f1"]
    # measurably imperfect (discriminative) but far from broken: the
    # planted noise rates put both slots in a mid band, with headroom
    # on both sides so a real regression OR an accidental gold leak
    # (F1 -> 1.0) trips the test
    assert 0.70 <= f1_v1 <= 0.95, f1_v1
    assert 0.70 <= f1_v2 <= 0.95, f1_v2
    # the cue-gated weak-form path must buy v2 real precision on the
    # gold-O mention traps — the slots separate under identical gold
    assert r2["overall"]["precision"] > r1["overall"]["precision"] + 0.02
    assert f1_v2 > f1_v1


def test_spark_tagger_equals_oracle_on_noisy_fixture(spark, noisy_dir):
    """Equality is the hard gate and must hold on text the tagger gets
    WRONG vs gold — divergence hiding behind shared errors would pass
    a gold-only check."""
    from pyspark.sql import functions as F

    from kgx.spark.udfs import make_tagger_udf

    art = TaggerArtifact.load(f"{noisy_dir}/tagger_v1.npz")
    tagger = make_tagger_udf(spark, art)
    rows = (
        spark.read.parquet(f"{noisy_dir}/bio_eval.parquet")
        .withColumn("text", F.concat_ws("", "chars"))
        .withColumn("pred_tags", tagger("text"))
        .select("text", "gold_tags", "pred_tags")
        .collect()
    )
    emit = make_emitter(art, LexiconMatcher(art))
    n_wrong_vs_gold = 0
    for r in rows:
        want = [TAGS[i] for i in viterbi(emit(r["text"]),
                                         art.transitions)]
        assert list(r["pred_tags"]) == want, r["text"]
        if want != list(r["gold_tags"]):
            n_wrong_vs_gold += 1
    # fixture sanity: equality was exercised on imperfect sentences
    assert n_wrong_vs_gold > 50, n_wrong_vs_gold
