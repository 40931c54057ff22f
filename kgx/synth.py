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

TIERS = {"t1": 40, "t2": 400, "bench": 20000,
         # CJK tiers: same sizes, Chinese-script assets (A.1: the
         # reference contract is per-character Chinese NER)
         "t1_zh": 40, "t2_zh": 400,
         # discriminative tier: same transcripts/dims as t2, but the
         # char-BIO gold carries controlled noise the frozen lexicon
         # tagger can NOT ace (OOV surfaces, boundary-extended spans,
         # gold-O mention traps) — conlleval F1 < 1.0 there measures
         # tagging quality; oracle==pipeline equality stays the gate
         "t2_noisy": 400}

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


# --- CJK (Chinese-script) assets -------------------------------------------
# Per-char BIO over Chinese text is the reference's actual target
# domain (MSRA/People's-Daily-style). Sentences have NO spaces; spans
# are char offsets; relation cues are distinct multi-char markers so
# each consecutive (subj_etype, obj_etype, inter-text) is unambiguous.

PATTERNS_ZH = (
    ("works_at", "就职于", "PER", "ORG"),
    ("located_in", "位于", "ORG", "LOC"),
    ("visited", "访问了", "PER", "LOC"),
    ("met", "会见了", "PER", "PER"),
    ("founded", "创办了", "PER", "ORG"),
    ("part_of", "隶属于", "ORG", "ORG"),
    ("member_of", "加入了", "PER", "ORG"),
    ("uses", "使用了", "PER", "ORG"),
)

ENTITY_TEMPLATES_ZH = (
    ("{PER}就职于{ORG}。", ("PER", "ORG")),
    ("{ORG}位于{LOC}。", ("ORG", "LOC")),
    ("{PER}上周访问了{LOC}。", ("PER", "LOC")),
    ("{PER}昨天会见了{PER}。", ("PER", "PER")),
    ("{PER}多年前创办了{ORG}。", ("PER", "ORG")),
    ("{ORG}隶属于{ORG}。", ("ORG", "ORG")),
    ("{PER}去年加入了{ORG}。", ("PER", "ORG")),
    ("{PER}使用了{ORG}的产品。", ("PER", "ORG")),
)

FILLER_TEMPLATES_ZH = (
    "今天的天气看起来很平静。",
    "请汇总本季度的预算数据。",
    "我现在帮你查一下。",
    "会议改到下周举行。",
    "这是你要的结果明细。",
    "这个话题没有更多内容了。",
)

ZH_SURNAME = ("王", "李", "张", "刘", "陈", "杨", "黄", "赵", "周", "吴",
              "徐", "孙", "马", "朱", "胡")
ZH_GIVEN = ("伟国", "芳华", "敏杰", "静怡", "丽娟", "强生", "磊鑫",
            "军平", "海洋", "文杰", "雨涛", "明轩")
ZH_LOC_PREFIX = ("北", "南", "东", "西", "中", "新")
ZH_LOC_STEM = ("华", "海", "安", "宁", "龙", "凤", "江", "山")
ZH_LOC_SUFFIX = ("市", "州", "城", "县")
ZH_ORG_STEM = ("华信", "中科", "联创", "天宇", "晨光", "瑞达", "宏远",
               "金桥", "星河", "博雅")
ZH_ORG_MID = ("科技", "网络", "数据", "智能", "能源", "传媒")
ZH_ORG_TAIL = ("公司", "集团", "有限公司")


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


def build_gazetteer_zh() -> list[Entity]:
    """Chinese-script gazetteer (t*_zh tiers). Same shape as the Latin
    one: 40 PER / 40 LOC / 40 ORG with aliases and 5 hot entities.
    No misspell variants: _misspell requires >=12 chars and Chinese
    surfaces are 2-8 chars (dropping a char would also push char-bigram
    Jaccard under JACCARD_TAU) — the fuzzy-LSH path is exercised by the
    Latin tiers; linking here is exact-dict + provisional."""
    rng = random.Random(SEED)
    used: set[str] = set()
    ents: list[Entity] = []

    def claim(surface: str) -> bool:
        n = normalize(surface)
        if n in used:
            return False
        used.add(n)
        return True

    pairs = [(s, g) for s in ZH_SURNAME for g in ZH_GIVEN]
    rng.shuffle(pairs)
    n_per = 0
    for s, g in pairs:
        if n_per >= 40:
            break
        canonical = s + g
        if not claim(canonical):
            continue
        e = Entity("PER", canonical)
        for v in (g, canonical + "博士"):
            if claim(v):
                e.aliases.append(v)
        ents.append(e)
        n_per += 1

    loc_names = [p + st for p in ZH_LOC_PREFIX for st in ZH_LOC_STEM]
    rng.shuffle(loc_names)
    n_loc = 0
    for i, name in enumerate(loc_names):
        if n_loc >= 40:
            break
        canonical = name + ZH_LOC_SUFFIX[i % len(ZH_LOC_SUFFIX)]
        if not claim(canonical):
            continue
        e = Entity("LOC", canonical)
        for v in (name, canonical + "地区"):
            if claim(v):
                e.aliases.append(v)
        ents.append(e)
        n_loc += 1

    org_names = [s + m for s in ZH_ORG_STEM for m in ZH_ORG_MID]
    rng.shuffle(org_names)
    n_org = 0
    for i, name in enumerate(org_names):
        if n_org >= 40:
            break
        canonical = name + ZH_ORG_TAIL[i % len(ZH_ORG_TAIL)]
        if not claim(canonical):
            continue
        e = Entity("ORG", canonical)
        for v in (name, name[:2]):
            if claim(v):
                e.aliases.append(v)
        ents.append(e)
        n_org += 1

    flat = sorted(ents, key=lambda e: (e.etype, e.canonical))
    for e in rng.sample(flat, 5):
        e.hot = True
    return ents


# context cues for the v2 (lexicon_ctx_crf) artifact: a cue string
# ending immediately before a mention boosts that etype's B-score;
# weak forms (misspells) require cue support to emit at all.
CUES_EN = (("at ", "ORG", 2.0), ("in ", "LOC", 2.0),
           ("visited ", "LOC", 2.0), ("of ", "ORG", 2.0),
           ("founded ", "ORG", 2.0), ("met ", "PER", 2.0))
CUES_ZH = (("就职于", "ORG", 2.0), ("位于", "LOC", 2.0),
           ("访问了", "LOC", 2.0), ("会见了", "PER", 2.0),
           ("创办了", "ORG", 2.0), ("隶属于", "ORG", 2.0),
           ("加入了", "ORG", 2.0), ("使用了", "ORG", 2.0))


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


def build_artifact_v2(ents: list[Entity], cues) -> TaggerArtifact:
    """Second checkpoint for the same tagger slot (SURVEY A.3):
    context-cue-weighted emissions with weak-form gating. Selected
    purely by artifact path — no pipeline code changes."""
    forms: list[str] = []
    etypes: list[str] = []
    weak: list[int] = []
    for e in sorted(ents, key=lambda x: (x.etype, x.canonical)):
        for f in e.dict_surfaces():
            forms.append(f)
            etypes.append(e.etype)
            weak.append(0)
        for f in e.misspells:
            forms.append(f)
            etypes.append(e.etype)
            weak.append(1)
    return TaggerArtifact(
        forms=tuple(forms), etypes=tuple(etypes),
        transitions=build_transitions(),
        kind="lexicon_ctx_crf", cues=tuple(cues), weak=tuple(weak),
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
    rng: random.Random, ents: list[Entity],
    entity_templates=ENTITY_TEMPLATES,
    filler_templates=FILLER_TEMPLATES,
) -> tuple[str, list[tuple[int, int, str]]]:
    """Render one template; returns (text, [(begin, end, etype)])."""
    if rng.random() < 0.30:
        return rng.choice(filler_templates), []
    tpl, slots = entity_templates[rng.randrange(len(entity_templates))]
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


def generate_transcripts(ents: list[Entity], n_convs: int,
                         entity_templates=ENTITY_TEMPLATES,
                         filler_templates=FILLER_TEMPLATES):
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
            text, _ = render_sentence(rng, ents, entity_templates,
                                      filler_templates)
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


def patterns_table(patterns=PATTERNS) -> pa.Table:
    return pa.table(
        {
            "pred": pa.array([p[0] for p in patterns], pa.string()),
            "regex": pa.array([p[1] for p in patterns], pa.string()),
            "subj_etype": pa.array([p[2] for p in patterns], pa.string()),
            "obj_etype": pa.array([p[3] for p in patterns], pa.string()),
        }
    )


def bio_eval_rows(ents: list[Entity], n_sentences: int = 500,
                  entity_templates=ENTITY_TEMPLATES,
                  filler_templates=FILLER_TEMPLATES):
    """MSRA-style char-BIO corpus; gold tags from splice positions."""
    rng = random.Random(SEED + 2)
    sent_ids, chars_col, tags_col = [], [], []
    for sid in range(n_sentences):
        text, spans = render_sentence(rng, ents, entity_templates,
                                      filler_templates)
        tags = ["O"] * len(text)
        for begin, end, etype in spans:
            tags[begin] = f"B-{etype}"
            for i in range(begin + 1, end):
                tags[i] = f"I-{etype}"
        sent_ids.append(sid)
        chars_col.append(list(text))
        tags_col.append(tags)
    return sent_ids, chars_col, tags_col


# --- discriminative (noisy-gold) eval assets ------------------------------
# Surfaces guaranteed OUT of the gazetteer/artifact lexicon (asserted
# at generation): invented stems sharing no form with PER_FIRST/LAST,
# LOC_*, ORG_* pools. A frozen lexicon tagger cannot recall these.
OOV_PER = ("Yorvik Dunmore", "Casimir Blent", "Odalys Trevane",
           "Ewart Pimlico", "Sibyl Harrowgate", "Teodric Vasse")
OOV_LOC = ("Gorse Hollow", "Brindle Coast", "Tarn Wickley",
           "Dunmow Vale", "Eastholt Ridge", "Wrenfield Downs")
OOV_ORG = ("Brindlewood Consortium", "Kestrel Atelier",
           "Windrow Collective", "Halcyon Foundry",
           "Marrowgate Partners", "Thistledown Works")

# gold spans in these sentences EXTEND the dictionary surface (title
# included in the gold entity, MSRA-style annotation ambiguity); the
# lexicon tagger emits only the dictionary span -> boundary error
NOISY_TITLES = ("Dr. ", "Prof. ", "Mr. ", "Ms. ")

# gold-O mention traps: the surface appears verbatim but is NOT an
# entity mention (metalinguistic use). A lexicon tagger fires anyway;
# only context could suppress it.
NOISY_O_TEMPLATES = (
    'please spell the string "{}" exactly as written .',
    'the label "{}" is used here as a codename only .',
    'type the phrase "{}" into the search box .',
    'the token "{}" appears verbatim in the log file .',
)

NOISY_RATES = {"trap_o": 0.15, "filler": 0.15,
               "oov": 0.15, "boundary": 0.12}


def bio_eval_rows_noisy(ents: list[Entity], n_sentences: int = 500):
    """Discriminative char-BIO gold: unlike bio_eval_rows (gold derived
    from the tagger's own gazetteer -> F1 == 1.0 by construction), this
    corpus plants, at controlled seeded rates:
      * OOV entity surfaces (gold = entity, lexicon tagger -> O):
        recall errors for BOTH artifact slots;
      * boundary-extended gold spans (title + dictionary surface):
        span-boundary errors for both slots;
      * gold-O mention traps (lexicon surface in metalinguistic
        context): precision errors — weak forms are used when the
        entity has them, so the v2 slot's cue-gated weak-form path
        recovers SOME of these and scores measurably above v1.
    conlleval F1 here measures tagging quality against annotation the
    tagger does not control; oracle==Spark prediction equality remains
    the separate hard gate (scripts/eval_report.py)."""
    rng = random.Random(SEED + 7)
    oov_by_type = {"PER": OOV_PER, "LOC": OOV_LOC, "ORG": OOV_ORG}
    by_type = {t: [e for e in ents if e.etype == t]
               for t in ("PER", "LOC", "ORG")}
    weak_pool = [e for e in ents if e.misspells]
    sent_ids, chars_col, tags_col = [], [], []
    r = NOISY_RATES
    for sid in range(n_sentences):
        roll = rng.random()
        spans: list[tuple[int, int, str]] = []
        if roll < r["trap_o"]:
            e = (rng.choice(weak_pool)
                 if weak_pool and rng.random() < 0.6
                 else rng.choice(ents))
            surface = (rng.choice(e.misspells)
                       if e.misspells and rng.random() < 0.75
                       else e.canonical)
            text = rng.choice(NOISY_O_TEMPLATES).format(surface)
        elif roll < r["trap_o"] + r["filler"]:
            text = rng.choice(FILLER_TEMPLATES)
        else:
            tpl, _ = ENTITY_TEMPLATES[rng.randrange(
                len(ENTITY_TEMPLATES))]
            parts = tpl.split("{")
            text = parts[0]
            for chunk in parts[1:]:
                etype, rest = chunk.split("}", 1)
                slot_roll = rng.random()
                if slot_roll < r["oov"]:
                    surface = rng.choice(oov_by_type[etype])
                elif etype == "PER" and slot_roll < r["oov"] + r[
                        "boundary"]:
                    surface = (rng.choice(NOISY_TITLES)
                               + _pick_entity(rng,
                                              by_type[etype]).canonical)
                else:
                    surface = _pick_surface(
                        rng, _pick_entity(rng, by_type[etype]))
                spans.append((len(text), len(text) + len(surface),
                              etype))
                text += surface + rest
        tags = ["O"] * len(text)
        for begin, end, etype in spans:
            tags[begin] = f"B-{etype}"
            for i in range(begin + 1, end):
                tags[i] = f"I-{etype}"
        sent_ids.append(sid)
        chars_col.append(list(text))
        tags_col.append(tags)
    return sent_ids, chars_col, tags_col


def _assert_oov_disjoint(ents: list[Entity]) -> None:
    """Generation-time guarantee behind the OOV recall contract: no
    lexicon form may appear inside an OOV surface (or vice versa), or
    the 'tagger cannot know it' premise silently breaks. Raises (not
    `assert` — this must survive python -O) so a future gazetteer
    edit cannot quietly invalidate the tier."""
    forms = [f for e in ents for f in e.all_forms()]
    for pool in (OOV_PER, OOV_LOC, OOV_ORG):
        for s in pool:
            for f in forms:
                if f in s or s in f:
                    raise ValueError(
                        f"OOV surface {s!r} overlaps lexicon form "
                        f"{f!r} — t2_noisy recall contract broken")


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
    """Materialize all fixtures for a tier; idempotent + deterministic.
    Tiers ending in `_zh` use the Chinese-script gazetteer, templates
    and relation patterns (per-char BIO over no-space text)."""
    os.makedirs(outdir, exist_ok=True)
    zh = tier.endswith("_zh")
    ents = build_gazetteer_zh() if zh else build_gazetteer()
    ent_tpl = ENTITY_TEMPLATES_ZH if zh else ENTITY_TEMPLATES
    fil_tpl = FILLER_TEMPLATES_ZH if zh else FILLER_TEMPLATES
    pats = PATTERNS_ZH if zh else PATTERNS
    paths = {
        "transcripts": os.path.join(outdir, "transcripts.parquet"),
        "alias_dict": os.path.join(outdir, "alias_dict.parquet"),
        "patterns": os.path.join(outdir, "patterns.parquet"),
        "bio_eval": os.path.join(outdir, "bio_eval.parquet"),
        "bio_eval_txt": os.path.join(outdir, "bio_eval.txt"),
        "artifact": os.path.join(outdir, "tagger_v1.npz"),
        "artifact_v2": os.path.join(outdir, "tagger_v2.npz"),
        "meta": os.path.join(outdir, "meta.json"),
    }
    rows = generate_transcripts(ents, TIERS[tier], ent_tpl, fil_tpl)
    pq.write_table(transcripts_table(rows), paths["transcripts"])
    pq.write_table(alias_dict_table(ents), paths["alias_dict"])
    pq.write_table(patterns_table(pats), paths["patterns"])
    if tier.endswith("_noisy"):
        _assert_oov_disjoint(ents)
        sent_ids, chars_col, tags_col = bio_eval_rows_noisy(ents, 500)
    else:
        sent_ids, chars_col, tags_col = bio_eval_rows(
            ents, 100 if tier.startswith("t1") else 500, ent_tpl,
            fil_tpl
        )
    pq.write_table(bio_eval_table(sent_ids, chars_col, tags_col),
                   paths["bio_eval"])
    write_bio_text(paths["bio_eval_txt"], chars_col, tags_col)
    build_artifact(ents).save(paths["artifact"])
    build_artifact_v2(ents, CUES_ZH if zh else CUES_EN).save(
        paths["artifact_v2"])
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
