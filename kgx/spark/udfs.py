"""Arrow-vectorized pandas UDFs — the only Python on the executor hot
path (SURVEY.md §2 Table B.10).

`make_tagger_udf` is the iterator-of-series pattern: the frozen model
is materialized once per Python worker (from a broadcast), then every
Arrow batch runs ONE numpy DP over the whole batch (batched CRF Viterbi
— north star). Everything else is vectorized pandas/numpy.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgx.contract import (
    LSH_BANDS,
    LSH_ROWS,
    TAGS,
    char_bigrams,
    jaccard,
    minhash_signature,
)
from kgx.tagcore import (
    LexiconMatcher,
    TaggerArtifact,
    decode_bio,
    make_emitter,
    viterbi_batch_sorted,
)

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("begin", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("surface", T.StringType()),
            T.StructField("etype", T.StringType()),
        ]
    )
)

VITERBI_CHUNK = 512  # bounds the padded DP tensor (512*512*7*8B ~ 15MB)


def make_tagger_udf(spark: SparkSession, artifact: TaggerArtifact):
    """text -> array<string> BIO tags; model loaded once per worker."""
    bc = spark.sparkContext.broadcast(artifact.as_dict())

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tag_turns(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        art = TaggerArtifact.from_dict(bc.value)
        matcher = LexiconMatcher(art)
        emit = make_emitter(art, matcher)
        a = art.transitions
        for texts in batches:
            vals = texts.fillna("").tolist()
            ems = [emit(t) for t in vals]
            paths = viterbi_batch_sorted(ems, a, chunk=VITERBI_CHUNK)
            yield pd.Series([[TAGS[j] for j in p] for p in paths])

    return tag_turns


def make_tagger_spans_udf(spark: SparkSession, artifact: TaggerArtifact):
    """text -> entity spans in ONE Python pass (Viterbi + BIO decode
    inside the same worker call). Tagging and decode as separate UDFs
    would ship text across the Arrow boundary twice and tags once —
    measured ~20% of the tag stage at 19.7M turns."""
    bc = spark.sparkContext.broadcast(artifact.as_dict())

    @F.pandas_udf(SPAN_TYPE)
    def tag_spans(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        art = TaggerArtifact.from_dict(bc.value)
        matcher = LexiconMatcher(art)
        emit = make_emitter(art, matcher)
        a = art.transitions
        for texts in batches:
            vals = texts.fillna("").tolist()
            ems = [emit(t) for t in vals]
            paths = viterbi_batch_sorted(ems, a, chunk=VITERBI_CHUNK)
            yield pd.Series(
                [decode_bio([TAGS[j] for j in p], t)
                 for p, t in zip(paths, vals)]
            )

    return tag_spans


OFFSETS_TYPE = T.StructType(
    [
        T.StructField("begins", T.ArrayType(T.IntegerType())),
        T.StructField("ends", T.ArrayType(T.IntegerType())),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ]
)

ETYPE_CODES = ("PER", "LOC", "ORG")


def make_tagger_offsets_udf(spark: SparkSession, artifact: TaggerArtifact):
    """text -> span OFFSETS as three primitive int arrays; surfaces and
    the span structs are assembled JVM-side (stages.tag_spans_jvm).

    Crossing the Arrow boundary with list-of-struct spans (strings per
    span) measured ~2x the tagger's actual compute at 19.7M turns;
    primitive int arrays serialize near-zero-copy and the substring /
    struct building is whole-stage-codegen JVM work."""
    bc = spark.sparkContext.broadcast(artifact.as_dict())
    code_of = {e: i for i, e in enumerate(ETYPE_CODES)}

    @F.pandas_udf(OFFSETS_TYPE)
    def tag_offsets(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        art = TaggerArtifact.from_dict(bc.value)
        matcher = LexiconMatcher(art)
        emit = make_emitter(art, matcher)
        a = art.transitions
        for texts in batches:
            vals = texts.fillna("").tolist()
            ems = [emit(t) for t in vals]
            paths = viterbi_batch_sorted(ems, a, chunk=VITERBI_CHUNK)
            begins, ends, codes = [], [], []
            for p, t in zip(paths, vals):
                spans = decode_bio([TAGS[j] for j in p], t)
                begins.append([s["begin"] for s in spans])
                ends.append([s["end"] for s in spans])
                codes.append([code_of[s["etype"]] for s in spans])
            yield pd.DataFrame(
                {"begins": begins, "ends": ends, "codes": codes}
            )

    return tag_offsets


# JVM-side span assembly from offsets (SQL expr; codegen-friendly).
# sequence(1, 0) DESCENDS in Spark, so the empty case is guarded.
SPANS_FROM_OFFSETS = """
CASE WHEN size(off.begins) = 0 THEN
  CAST(array() AS
       array<struct<begin:int,end:int,surface:string,etype:string>>)
ELSE
  transform(sequence(1, size(off.begins)), i -> struct(
      off.begins[i-1] AS begin,
      off.ends[i-1] AS end,
      substring(text, off.begins[i-1] + 1,
                off.ends[i-1] - off.begins[i-1]) AS surface,
      element_at(array('PER','LOC','ORG'), off.codes[i-1] + 1) AS etype))
END
"""


@F.pandas_udf(SPAN_TYPE)
def decode_spans(texts: pd.Series, tags: pd.Series) -> pd.Series:
    """(text, tags) -> array<struct> entity spans (A.4 IOB2 repair)."""
    out = []
    for text, tg in zip(texts.fillna(""), tags):
        out.append(decode_bio(list(tg) if tg is not None else [], text))
    return pd.Series(out)


@F.pandas_udf(T.StringType())
def normalize_surface(s: pd.Series) -> pd.Series:
    """A.7 normalize: NFKC -> casefold -> strip (vectorized pandas str)."""
    return s.fillna("").str.normalize("NFKC").str.casefold().str.strip()


@F.pandas_udf(T.ArrayType(T.LongType()))
def minhash_sig(norms: pd.Series) -> pd.Series:
    """norm -> 64-perm MinHash signature (values < 2^31, safe as long)."""
    return pd.Series(
        [minhash_signature(n).astype(np.int64).tolist()
         for n in norms.fillna("")]
    )


@F.pandas_udf(T.DoubleType())
def jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact char-bigram Jaccard (verify step after LSH blocking)."""
    return pd.Series(
        [jaccard(x, y) for x, y in zip(a.fillna(""), b.fillna(""))]
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def bigrams_udf(norms: pd.Series) -> pd.Series:
    """Distinct char bigrams (used by the dedup/text harness ops)."""
    return pd.Series([char_bigrams(n) for n in norms.fillna("")])


@F.pandas_udf(T.ArrayType(T.LongType()))
def shingle_minhash_sig(texts: pd.Series) -> pd.Series:
    """Document text -> 64-perm MinHash over 3-word shingles (the
    document-scale dedup granularity; char bigrams degenerate there)."""
    from kgx.contract import shingle_minhash

    return pd.Series(
        [shingle_minhash(t).astype(np.int64).tolist()
         for t in texts.fillna("")]
    )


@F.pandas_udf(T.DoubleType())
def shingle_jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact 3-word-shingle Jaccard (verify step for document dedup)."""
    from kgx.contract import shingle_jaccard

    return pd.Series(
        [shingle_jaccard(x, y) for x, y in zip(a.fillna(""), b.fillna(""))]
    )


def simhash64_np(texts: pd.Series) -> np.ndarray:
    """Vectorized 64-bit SimHash over whitespace tokens — no per-token
    Python. Token hashing is a numpy pipeline: tokens (doc-deduped via
    pandas explode/drop_duplicates/factorize, all C-level) are viewed
    as fixed-width UCS4 code matrices (truncated to 16 chars — a
    documented feature-hash approximation), folded with an FNV-style
    uint64 polynomial (natural wraparound), finalized murmur-style,
    and spread to ±1 bit matrices; per-doc accumulation is one
    np.add.at. Returns int64[n] (signed view of the uint64 simhash)."""
    s = texts.fillna("").reset_index(drop=True)
    n = len(s)
    out = np.zeros(n, dtype=np.uint64)
    tk = s.str.split().explode().dropna()
    if len(tk):
        df = pd.DataFrame(
            {"doc": tk.index.to_numpy(np.int64), "tok": tk.to_numpy()}
        ).drop_duplicates()
        codes, uniq = pd.factorize(df["tok"])
        u = np.asarray(uniq, dtype="U16")
        m = u.view(np.uint32).reshape(len(uniq), 16).astype(np.uint64)
        h = np.zeros(len(uniq), dtype=np.uint64)
        base = np.uint64(1099511628211)  # FNV-1a prime
        for i in range(16):
            h = h * base + m[:, i]
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        pm1 = 2 * bits - 1  # [n_uniq, 64] of ±1
        acc = np.zeros((n, 64), dtype=np.int64)
        np.add.at(acc, df["doc"].to_numpy(), pm1[codes])
        sign = (acc > 0).astype(np.uint64)
        out = (sign << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return out.view(np.int64)


@F.pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    return pd.Series(simhash64_np(texts))


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def hp_band_keys(embs: pd.Series) -> pd.Series:
    """Embedding -> HP_BANDS hyperplane-LSH band keys (sign-projection
    sketch over integer-quantized vectors; contract.hp_band_keys_np).
    One numpy matmul per Arrow batch — no per-row Python."""
    from kgx.contract import hp_band_keys_np

    if embs.empty:
        return pd.Series([], dtype=object)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in embs.tolist()])
    keys = hp_band_keys_np(mat)
    return pd.Series([row.tolist() for row in keys])


def band_key_cols():
    """SQL expression producing the 16 LSH band-bucket keys from a
    64-element `sig` array column — JVM-side, no Python."""
    keys = []
    for band in range(LSH_BANDS):
        lo = band * LSH_ROWS
        parts = [F.col("sig")[i].cast("string") for i in range(lo, lo + LSH_ROWS)]
        keys.append(F.concat(F.lit(f"{band}:"), F.concat_ws("-", *parts)))
    return F.array(*keys)
