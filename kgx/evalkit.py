"""Evaluation kit (SURVEY.md §2 Table B.12, Appendix A.5/A.9).

conlleval twin: entity-level exact-span P/R/F1 per type + overall, plus
token accuracy — same semantics as the conlleval perl script the
reference shells out to (spans from BIO with IOB2 repair).

triple_prf: set-based precision/recall over distinct (subj, pred, obj).
"""

from __future__ import annotations

from collections import defaultdict

from kgx.tagcore import decode_bio


def _f1(p: float, r: float) -> float:
    return 2 * p * r / (p + r) if (p + r) > 0 else 0.0


def conlleval(
    gold_seqs: list[list[str]], pred_seqs: list[list[str]]
) -> dict:
    """Entity-level exact match on (sentence, begin, end, type).

    Returns {"overall": {...}, "per_type": {etype: {...}},
    "token_accuracy": float}; each metric dict has precision / recall /
    f1 / guessed / gold / correct.
    """
    assert len(gold_seqs) == len(pred_seqs)
    guessed = defaultdict(int)
    gold_n = defaultdict(int)
    correct = defaultdict(int)
    tok_total = tok_ok = 0
    for sid, (g, p) in enumerate(zip(gold_seqs, pred_seqs)):
        assert len(g) == len(p), f"length mismatch in sentence {sid}"
        tok_total += len(g)
        tok_ok += sum(1 for a, b in zip(g, p) if a == b)
        text = " " * len(g)  # surfaces unused here
        gspans = {(s["begin"], s["end"], s["etype"])
                  for s in decode_bio(g, text)}
        pspans = {(s["begin"], s["end"], s["etype"])
                  for s in decode_bio(p, text)}
        for _, _, et in pspans:
            guessed[et] += 1
        for _, _, et in gspans:
            gold_n[et] += 1
        for sp in pspans & gspans:
            correct[sp[2]] += 1

    def metrics(et=None):
        if et is None:
            gu, go, co = (sum(guessed.values()), sum(gold_n.values()),
                          sum(correct.values()))
        else:
            gu, go, co = guessed[et], gold_n[et], correct[et]
        p = co / gu if gu else 0.0
        r = co / go if go else 0.0
        return {"precision": p, "recall": r, "f1": _f1(p, r),
                "guessed": gu, "gold": go, "correct": co}

    types = sorted(set(guessed) | set(gold_n))
    return {
        "overall": metrics(),
        "per_type": {et: metrics(et) for et in types},
        "token_accuracy": tok_ok / tok_total if tok_total else 1.0,
    }


def triple_prf(ours: set[tuple], ref: set[tuple]) -> dict:
    """P = |ours∩ref|/|ours|, R = |ours∩ref|/|ref| (A.9 set semantics)."""
    inter = ours & ref
    p = len(inter) / len(ours) if ours else 0.0
    r = len(inter) / len(ref) if ref else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": _f1(p, r),
        "ours": len(ours),
        "ref": len(ref),
        "correct": len(inter),
        "false_pos": sorted(ours - ref)[:20],
        "false_neg": sorted(ref - ours)[:20],
    }
