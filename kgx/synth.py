"""Deterministic synthetic fixtures (FIXTURES.md).

Generates `transcripts`, `alias_dict`, `patterns`, `bio_eval` and the
frozen tagger artifact — seeded (seed=42), no wall-clock, no external
data; byte-identical output on every run. Pure pyarrow writes (no Spark
needed, so the sequential oracle and unit tests stay Spark-free).

Tiers (FIXTURES.md §6): t1 (40 convs, smoke), t2 (400, parity/P-R),
bench (20,000, throughput at local[8] vs local[32]).
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from kgx.contract import entity_id, normalize
from kgx.tagcore import TaggerArtifact, build_transitions

SEED = 42
BASE_TS_US = 1767225600_000000  # 2026-01-01T00:00:00Z in epoch micros
DICT_TS_US = (1764547200_000000, 1768435200_000000)  # 2025-12-01, 2026-01-15

TIERS = {"t1": 40, "t2": 400, "bench": 20000}

TOOLS = ("search", "calc", "browse", "db")

# (pred, regex, subj_etype, obj_etype) — regexes valid in both Python re
# and Java (Spark regexp_like); matched against inter-mention text (A.6).
PATTERNS = (
    ("works_at", r"\bworks (?:at|for)\b", "PER", "ORG"),
    ("located_in", r"\bin\b", "ORG", "LOC"),
    ("visited", r"\bvisited\b", "PER", "LOC"),
    ("met", r"\bmet\b", "PER", "PER"),
    ("founded", r"\bfounded\b", "PER", "ORG"),
    ("part_of", r"\bis part of\b", "ORG", "ORG"),
    ("member_of", r"\bmember of\b", "PER", "ORG"),
    ("uses", r"\buses\b", "PER", "ORG"),
)

# entity-bearing templates; slots are etype names
ENTITY_TEMPLATES = (
    ("{PER} works at {ORG} in {LOC} .", ("PER", "ORG", "LOC")),
    ("{PER} visited {LOC} last week .", ("PER", "LOC")),
    ("{PER} met {PER} at {LOC} .", ("PER", "PER", "LOC")),
    ("{PER} founded {ORG} .", ("PER", "ORG")),
    ("{ORG} is part of {ORG} .", ("ORG", "ORG")),
    ("{PER} is a member of {ORG} .", ("PER", "ORG")),
    ("{PER} uses {ORG} tools daily .", ("PER", "ORG")),
    ("{ORG} opened an office in {LOC} .", ("ORG", "LOC")),
)

FILLER_TEMPLATES = (
    "the weather report for today looks calm .",
    "please summarize the quarterly budget figures .",
    "let me check that for you now .",
    "the meeting moved to next week .",
    "here is the requested breakdown of results .",
    "nothing further on that thread .",
)

PER_FIRST = (
    "Ana", "Boris", "Carmen", "Davor", "Elif", "Farid", "Greta", "Hiro",
    "Ines", "Jonas", "Katya", "Lionel", "Marta", "Nadia", "Otto", "Priya",
    "Quentin", "Rosa", "Stefan", "Talia",
)
PER_LAST = (
    "Park", "Velich", "Okonkwo", "Sandoval", "Merrit", "Zhukova",
    "Farnley", "Ibarra", "Kostov", "Lindqvist",
)
LOC_STEM = (
    "Vir", "Kand", "Solm", "Tren", "Bex", "Quill", "Marn", "Osk", "Pell",
    "Rud",
)
LOC_SUFFIX = ("el", "ford", "holm", "mark", "ton", "via", "stad", "mere")
LOC_PREFIX = ("Lake", "Port", "Mount", "Fort")
ORG_STEM = (
    "Nova", "Quanta", "Hexa", "Astra", "Veri", "Omni", "Zephy", "Cryo",
    "Lumi", "Tessel",
)
ORG_MID = ("graph", "dyne", "core", "flux", "metric", "logic", "scape",
           "forge")
ORG_TAIL = ("Inc", "Labs", "Group", "Systems", "Corp")


@dataclass
class Entity:
    etype: str
    canonical: str
    aliases: list[str] = field(default_factory=list)  # excl. canonical
    misspells: list[str] = field(default_factory=list)
    hot: bool = False

    @property
    def eid(self) -> str:
        return entity_id(self.etype, normalize(self.canonical))

    def dict_surfaces(self) -> list[str]:
        return [self.canonical, *self.aliases]

    def all_forms(self) -> list[str]:
        return [self.canonical, *self.aliases, *self.misspells]


def _misspell(form: str) -> str | None:
    """Drop one mid char (never a space); only for long-enough forms so
    the char-bigram Jaccard vs the canonical stays >= JACCARD_TAU."""
    if len(form) < 12:
        return None
    pos = len(form) // 2
    while pos < len(form) and form[pos] == " ":
        pos += 1
    if pos >= len(form) - 1:
        return None
    return form[:pos] + form[pos + 1 :]


def build_gazetteer() -> list[Entity]:
    rng = random.Random(SEED)
    used: set[str] = set()
    ents: list[Entity] = []

    def claim(surface: str) -> bool:
        n = normalize(surface)
        if n in used:
            return False
        used.add(n)
        return True

    # PER: 40 unique "First Last"
    pairs = [(f, l) for f in PER_FIRST for l in PER_LAST]
    rng.shuffle(pairs)
    for f, l in pairs:
        if len([e for e in ents if e.etype == "PER"]) >= 40:
            break
        canonical = f"{f} {l}"
        if not claim(canonical):
            continue
        e = Entity("PER", canonical)
        # abbreviation keeps the (distinctive) first name: "Davor P." —
        # "D. Park"-style forms put same-surname people above JACCARD_TAU
        # and over-merge components (seen on t2)
        for v in (f"{f} {l[0]}.", canonical.lower()):
            if claim(v):
                e.aliases.append(v)
        ents.append(e)

    # LOC: 40
    loc_names = [s + x for s in LOC_STEM for x in LOC_SUFFIX]
    rng.shuffle(loc_names)
    n_loc = 0
    for i, name in enumerate(loc_names):
        if n_loc >= 40:
            break
        canonical = f"{LOC_PREFIX[i % len(LOC_PREFIX)]} {name}"
        if not claim(canonical):
            continue
        e = Entity("LOC", canonical)
        for v in (name, canonical.lower()):
            if claim(v):
                e.aliases.append(v)
        ents.append(e)
        n_loc += 1

    # ORG: 40
    org_names = [s + m for s in ORG_STEM for m in ORG_MID]
    rng.shuffle(org_names)
    n_org = 0
    for i, name in enumerate(org_names):
        if n_org >= 40:
            break
        canonical = f"{name} {ORG_TAIL[i % len(ORG_TAIL)]}"
        if not claim(canonical):
            continue
        e = Entity("ORG", canonical)
        for v in (name, canonical.lower()):
            if claim(v):
                e.aliases.append(v)
        ents.append(e)
        n_org += 1

    # misspell variants (not in alias_dict; in artifact lexicon + splice pool)
    for e in ents:
        m = _misspell(e.canonical)
        if m and claim(m):
            e.misspells.append(m)

    # 5 hot entities (skew for salted join/agg)
    flat = sorted(ents, key=lambda e: (e.etype, e.canonical))
    for e in rng.sample(flat, 5):
        e.hot = True
    return ents


def build_artifact(ents: list[Entity]) -> TaggerArtifact:
    forms: list[str] = []
    etypes: list[str] = []
    for e in sorted(ents, key=lambda x: (x.etype, x.canonical)):
        for f in e.all_forms():
            forms.append(f)
            etypes.append(e.etype)
    return TaggerArtifact(
        forms=tuple(forms), etypes=tuple(etypes),
        transitions=build_transitions(),
    )


def _pick_entity(rng: random.Random, pool: list[Entity]) -> Entity:
    """Weighted pick: hot entities are 50x more likely (FIXTURES §1)."""
    weights = [50 if e.hot else 1 for e in pool]
    return rng.choices(pool, weights=weights, k=1)[0]


def _pick_surface(rng: random.Random, e: Entity) -> str:
    """~5% misspelled (when available), else canonical/alias mix."""
    if e.misspells and rng.random() < 0.05:
        return rng.choice(e.misspells)
    if e.aliases and rng.random() < 0.25:
        return rng.choice(e.aliases)
    return e.canonical


def render_sentence(
    rng: random.Random, ents: list[Entity]
) -> tuple[str, list[tuple[int, int, str]]]:
    """Render one template; returns (text, [(begin, end, etype)])."""
    if rng.random() < 0.30:
        return rng.choice(FILLER_TEMPLATES), []
    tpl, slots = ENTITY_TEMPLATES[rng.randrange(len(ENTITY_TEMPLATES))]
    by_type = {t: [e for e in ents if e.etype == t] for t in
               ("PER", "LOC", "ORG")}
    parts = tpl.split("{")
    text = parts[0]
    spans: list[tuple[int, int, str]] = []
    for chunk in parts[1:]:
        etype, rest = chunk.split("}", 1)
        surface = _pick_surface(rng, _pick_entity(rng, by_type[etype]))
        spans.append((len(text), len(text) + len(surface), etype))
        text += surface + rest
    return text, spans


def generate_transcripts(ents: list[Entity], n_convs: int):
    """Rows for the transcripts table (schema per BASELINE.json input_hint)."""
    rng = random.Random(SEED + 1)
    rows = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool",
                            "ts")}
    for c in range(n_convs):
        conv_id = f"c{c:06d}"
        n_turns = 200 if (c % 100 == 99) else rng.randint(2, 16)
        for t in range(n_turns):
            if t == 0:
                role = "user"
            else:
                role = rng.choices(("user", "assistant", "tool"),
                                   weights=(45, 45, 10), k=1)[0]
            text, _ = render_sentence(rng, ents)
            rows["conv_id"].append(conv_id)
            rows["turn_idx"].append(t)
            rows["role"].append(role)
            rows["text"].append(text)
            rows["tool"].append(rng.choice(TOOLS) if role == "tool" else None)
            rows["ts"].append(BASE_TS_US + c * 3600_000000 + t * 7_000000)
    return rows


def transcripts_table(rows: dict) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "tool": pa.array(rows["tool"], pa.string()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
        }
    )


def alias_dict_table(ents: list[Entity]) -> pa.Table:
    cols = {k: [] for k in ("alias", "entity_id", "etype", "canonical_name",
                            "dict_ts")}
    for e in sorted(ents, key=lambda x: (x.etype, x.canonical)):
        for s in e.dict_surfaces():
            for ts in DICT_TS_US:
                cols["alias"].append(normalize(s))
                cols["entity_id"].append(e.eid)
                cols["etype"].append(e.etype)
                cols["canonical_name"].append(e.canonical)
                cols["dict_ts"].append(ts)
    return pa.table(
        {
            "alias": pa.array(cols["alias"], pa.string()),
            "entity_id": pa.array(cols["entity_id"], pa.string()),
            "etype": pa.array(cols["etype"], pa.string()),
            "canonical_name": pa.array(cols["canonical_name"], pa.string()),
            "dict_ts": pa.array(cols["dict_ts"], pa.timestamp("us")),
        }
    )


def patterns_table() -> pa.Table:
    return pa.table(
        {
            "pred": pa.array([p[0] for p in PATTERNS], pa.string()),
            "regex": pa.array([p[1] for p in PATTERNS], pa.string()),
            "subj_etype": pa.array([p[2] for p in PATTERNS], pa.string()),
            "obj_etype": pa.array([p[3] for p in PATTERNS], pa.string()),
        }
    )


def bio_eval_rows(ents: list[Entity], n_sentences: int = 500):
    """MSRA-style char-BIO corpus; gold tags from splice positions."""
    rng = random.Random(SEED + 2)
    sent_ids, chars_col, tags_col = [], [], []
    for sid in range(n_sentences):
        text, spans = render_sentence(rng, ents)
        tags = ["O"] * len(text)
        for begin, end, etype in spans:
            tags[begin] = f"B-{etype}"
            for i in range(begin + 1, end):
                tags[i] = f"I-{etype}"
        sent_ids.append(sid)
        chars_col.append(list(text))
        tags_col.append(tags)
    return sent_ids, chars_col, tags_col


def bio_eval_table(sent_ids, chars_col, tags_col) -> pa.Table:
    return pa.table(
        {
            "sent_id": pa.array(sent_ids, pa.int64()),
            "chars": pa.array(chars_col, pa.list_(pa.string())),
            "gold_tags": pa.array(tags_col, pa.list_(pa.string())),
        }
    )


def write_bio_text(path: str, chars_col, tags_col) -> None:
    """Tab-separated char<TAB>tag lines, blank line between sentences
    (tab, not space, because ASCII text contains space characters)."""
    with open(path, "w", encoding="utf-8") as f:
        for chars, tags in zip(chars_col, tags_col):
            for ch, tg in zip(chars, tags):
                f.write(f"{ch}\t{tg}\n")
            f.write("\n")


def generate(outdir: str, tier: str = "t2") -> dict[str, str]:
    """Materialize all fixtures for a tier; idempotent + deterministic."""
    os.makedirs(outdir, exist_ok=True)
    ents = build_gazetteer()
    paths = {
        "transcripts": os.path.join(outdir, "transcripts.parquet"),
        "alias_dict": os.path.join(outdir, "alias_dict.parquet"),
        "patterns": os.path.join(outdir, "patterns.parquet"),
        "bio_eval": os.path.join(outdir, "bio_eval.parquet"),
        "bio_eval_txt": os.path.join(outdir, "bio_eval.txt"),
        "artifact": os.path.join(outdir, "tagger_v1.npz"),
        "meta": os.path.join(outdir, "meta.json"),
    }
    rows = generate_transcripts(ents, TIERS[tier])
    pq.write_table(transcripts_table(rows), paths["transcripts"])
    pq.write_table(alias_dict_table(ents), paths["alias_dict"])
    pq.write_table(patterns_table(), paths["patterns"])
    sent_ids, chars_col, tags_col = bio_eval_rows(
        ents, 500 if tier != "t1" else 100
    )
    pq.write_table(bio_eval_table(sent_ids, chars_col, tags_col),
                   paths["bio_eval"])
    write_bio_text(paths["bio_eval_txt"], chars_col, tags_col)
    build_artifact(ents).save(paths["artifact"])
    with open(paths["meta"], "w") as f:
        json.dump(
            {"tier": tier, "n_convs": TIERS[tier],
             "n_turns": len(rows["conv_id"]), "n_entities": len(ents),
             "seed": SEED},
            f, indent=2,
        )
    return paths


if __name__ == "__main__":
    import sys

    tier = sys.argv[1] if len(sys.argv) > 1 else "t2"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/fixtures/{tier}"
    print(json.dumps(generate(out, tier), indent=2))
