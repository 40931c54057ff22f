"""Demo inference — the graft of the reference's EP3
(`main.py --mode=demo`, SURVEY.md §3.1 / Table A13): a sentence in,
PER/LOC/ORG surface lists out, via the same frozen tagger artifact the
batch pipeline ships to executors.

    $ python -m kgx.demo "Ana Okonkwo visited Fort Kandford with Davor Park ."
    {"PER": ["Ana Okonkwo", "Davor Park"], "LOC": ["Fort Kandford"], "ORG": []}

No Spark involved — this is the single-sentence contract path
(tokenize per char -> emissions -> CRF Viterbi -> BIO -> spans),
identical to what the iterator pandas UDF runs per Arrow batch.
"""

from __future__ import annotations

import json
import os
import sys

from kgx.contract import ETYPES
from kgx.tagcore import (
    TAGS,
    LexiconMatcher,
    TaggerArtifact,
    decode_bio,
    make_emitter,
    viterbi,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEFAULT_ARTIFACT = os.path.join(_REPO, "fixtures", "t1", "tagger_v1.npz")


def _default_artifact() -> str:
    if not os.path.exists(_DEFAULT_ARTIFACT):
        from kgx import synth

        synth.generate(os.path.dirname(_DEFAULT_ARTIFACT), "t1")
    return _DEFAULT_ARTIFACT


def demo_one(text: str, artifact_path: str | None = None) -> dict:
    """text -> {"PER": [...], "LOC": [...], "ORG": [...]} (EP3 shape:
    get_PER/LOC/ORG_entity of the reference's utils.get_entity)."""
    art = TaggerArtifact.load(artifact_path or _default_artifact())
    matcher = LexiconMatcher(art)
    emit = make_emitter(art, matcher)  # model slot: v1 or v2 by path
    tags = [TAGS[i] for i in viterbi(emit(text), art.transitions)]
    spans = decode_bio(tags, text)
    out: dict[str, list[str]] = {et: [] for et in ETYPES}
    for s in spans:
        out[s["etype"]].append(s["surface"])
    return out


def main(argv=None) -> None:
    args = list(sys.argv[1:] if argv is None else argv)
    artifact = None
    if args and args[0] == "--artifact":
        artifact = args[1]
        args = args[2:]
    if args:
        print(json.dumps(demo_one(" ".join(args), artifact)))
        return
    for line in sys.stdin:  # reference UX: read sentences from stdin
        line = line.rstrip("\n")
        if line:
            print(json.dumps(demo_one(line, artifact)))


if __name__ == "__main__":
    main()
