"""Acceptance-gate evaluation report (BASELINE.md rows 1-3):

1. Triple-set P/R of the distributed Spark pipeline vs the sequential
   oracle ("the reference", SURVEY §0) — gate >=0.95 — on the t2
   fixture AND the Chinese-script t2_zh fixture (SURVEY A.1: the
   reference contract is per-character Chinese NER; the CJK tier
   proves the per-char path on multi-byte, no-whitespace text).
2. conlleval entity P/R/F1 (per-type + overall) + token accuracy of
   the Spark tagger UDF on each tier's char-BIO eval fixture.
3. Per-table row counts, both engines.

Writes EVAL.md + prints one JSON line per tier.

Usage: python scripts/eval_report.py [--tiers t2,t2_zh]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def evaluate(spark, tier: str,
             artifact: str = "tagger_v1.npz") -> tuple[dict, list[str]]:
    fixture = os.path.join(REPO, "fixtures", tier)
    if not os.path.exists(os.path.join(fixture, "meta.json")):
        from kgx import synth

        synth.generate(fixture, tier)

    from pyspark.sql import functions as F

    from kgx import oracle
    from kgx.evalkit import conlleval, triple_prf
    from kgx.spark.run import Runner

    ref = oracle.run(fixture, artifact)
    ref_triples = set(ref["triple_set"])

    slot = artifact.replace(".npz", "")
    wh = tempfile.mkdtemp(prefix=f"kgx_eval_{tier}_{slot}_wh_")
    try:
        runner = Runner(spark, fixture, wh, f"eval_{tier}_{slot}",
                        buckets=16, artifact=artifact)
        runner.run()
        ours = {
            (r["subj_id"], r["pred"], r["obj_id"])
            for r in runner.read("edges")
            .select("subj_id", "pred", "obj_id")
            .collect()
        }
        counts = {
            t: runner.io.manifest(t)["rows"]
            for t in ("turns", "mentions", "triples_raw", "links",
                      "edges", "vertices")
        }

        from kgx.spark.udfs import make_tagger_udf
        from kgx.tagcore import TaggerArtifact

        tagger = make_tagger_udf(
            spark, TaggerArtifact.load(f"{fixture}/{artifact}"))
        bio = (
            spark.read.parquet(f"{fixture}/bio_eval.parquet")
            .withColumn("text", F.concat_ws("", "chars"))
            .withColumn("pred_tags", tagger("text"))
            .select("sent_id", "gold_tags", "pred_tags")
            .collect()
        )
        gold = [list(r["gold_tags"]) for r in bio]
        pred = [list(r["pred_tags"]) for r in bio]
        rep = conlleval(gold, pred)
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    prf = triple_prf(ours, ref_triples)
    gate = prf["precision"] >= 0.95 and prf["recall"] >= 0.95

    out = {
        "metric": "triple_prf_vs_oracle",
        "precision": round(prf["precision"], 6),
        "recall": round(prf["recall"], 6),
        "pass": bool(gate),
        "tier": tier,
        "artifact": artifact,
        "n_triples_ours": prf["ours"],
        "n_triples_ref": prf["ref"],
        "conlleval_overall_f1": round(rep["overall"]["f1"], 6),
        "token_accuracy": round(rep["token_accuracy"], 6),
        "rows": counts,
    }

    label = ("Chinese-script (per-char, multi-byte, no-whitespace)"
             if tier.endswith("_zh") else "Latin-script")
    md = [
        f"## Tier `{tier}` — {label} — artifact `{artifact}`"
        + (" (context-cue-weighted second model slot)"
           if artifact != "tagger_v1.npz" else ""),
        "",
        "### Triple-set P/R — distributed pipeline vs reference",
        "",
        "| metric | value | gate |",
        "| --- | --- | --- |",
        f"| precision | {prf['precision']:.4f} | ≥ 0.95 → "
        f"{'PASS' if prf['precision'] >= 0.95 else 'FAIL'} |",
        f"| recall | {prf['recall']:.4f} | ≥ 0.95 → "
        f"{'PASS' if prf['recall'] >= 0.95 else 'FAIL'} |",
        f"| distinct (s,p,o) ours / ref | {prf['ours']} / {prf['ref']} "
        "| — |",
        "",
        "### conlleval — entity tagging on the char-BIO eval set",
        "",
        "| type | precision | recall | F1 | gold | guessed |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    for et, m in sorted(rep["per_type"].items()):
        md.append(
            f"| {et} | {m['precision']:.4f} | {m['recall']:.4f} |"
            f" {m['f1']:.4f} | {m['gold']} | {m['guessed']} |"
        )
    o = rep["overall"]
    md += [
        f"| **overall** | {o['precision']:.4f} | {o['recall']:.4f} |"
        f" {o['f1']:.4f} | {o['gold']} | {o['guessed']} |",
        "",
        f"Token accuracy: {rep['token_accuracy']:.4f}",
        "",
        "### Table row counts (Spark pipeline)",
        "",
        "| table | rows |",
        "| --- | --- |",
    ]
    for t, n in counts.items():
        md.append(f"| {t} | {n} |")
    md.append("")
    return out, md


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="t2,t2_zh")
    ap.add_argument("--v2-tier", default="t2",
                    help="tier to additionally evaluate with the "
                    "second tagger artifact (empty to skip)")
    args = ap.parse_args()
    tiers = args.tiers.split(",")

    from kgx.spark.session import get_spark

    spark = get_spark("kgx-eval", cores=8, shuffle_partitions=16)
    md = [
        "# EVAL — acceptance-gate report",
        "",
        "Deterministic fixtures (FIXTURES.md). \"Reference\" = the "
        "pinned sequential oracle (SURVEY.md §0; `/root/reference` was "
        "empty at survey time). The gold BIO tags are synthesized from "
        "the same gazetteer the frozen tagger holds, so F1 ~= 1.0 by "
        "construction — the eval verifies the *pipeline* (distributed "
        "tagger, span decode, bookkeeping) does not diverge from the "
        "contract; see SURVEY.md Appendix A.3.",
        "",
    ]
    outs = []
    try:
        for tier in tiers:
            out, lines = evaluate(spark, tier)
            outs.append(out)
            md.extend(lines)
        # second model slot (SURVEY A.3 / A14-A15): same pipeline, v2
        # artifact plugged in — the P/R gate is pipeline-vs-oracle with
        # BOTH sides running v2; its conlleval vs the gazetteer gold is
        # reported as-is (v2 gates weak forms BY DESIGN, so < 1.0
        # against a v1-gazetteer-derived gold is expected, not a bug)
        if args.v2_tier:
            out, lines = evaluate(spark, args.v2_tier, "tagger_v2.npz")
            outs.append(out)
            md.extend(lines)
    finally:
        spark.stop()

    with open(os.path.join(REPO, "EVAL.md"), "w") as f:
        f.write("\n".join(md))
    for out in outs:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
