"""Dedup operators: simhash multi-band recall guarantees, the
oversized-bucket star-link guard (a >cap cluster of near-identical
documents must stay connected, not vanish), and the vectorized
fingerprint against a straightforward per-char reference."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    return find


def test_simhash_multiband_recall(spark):
    """8 bands x 8 bits guarantee every hamming<=7 pair shares a band
    exactly (pigeonhole) — single-band blocking could not. The
    operator's precise contract under the bucket-size guard:
      * precision: every emitted pair really has hamming <= 6;
      * recall: every hamming<=6 pair that shares at least one band
        bucket of size <= cap IS emitted (pairs confined to oversized
        buckets go through the star-link path instead — connectivity
        covered by the planted-cluster test below).
    Verified against a numpy brute force over all pairs."""
    from kgx.harness import MAX_LSH_BUCKET, dedup_simhash
    from kgx.spark.udfs import simhash64_np

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    sh = simhash64_np(pd.Series([r["text"] for r in docs])).astype(
        np.uint64
    )
    ids = [r["doc_id"] for r in docs]
    pos = {d: i for i, d in enumerate(ids)}
    want = set()
    for i in range(len(ids)):
        x = sh[i] ^ sh[i + 1 :]
        ham = np.array([bin(int(v)).count("1") for v in x])
        for j in np.nonzero(ham <= 6)[0]:
            a, b = ids[i], ids[i + 1 + int(j)]
            want.add((min(a, b), max(a, b)))

    bands = np.stack(
        [(sh >> np.uint64(8 * g)) & np.uint64(255) for g in range(8)], 1
    )
    oversized = set()
    for g in range(8):
        vals, counts = np.unique(bands[:, g], return_counts=True)
        for v, c in zip(vals, counts):
            if c > MAX_LSH_BUCKET:
                oversized.add((g, int(v)))

    def shares_small_bucket(a, b):
        i, j = pos[a], pos[b]
        return any(
            bands[i, g] == bands[j, g]
            and (g, int(bands[i, g])) not in oversized
            for g in range(8)
        )

    got = {
        (r["id_a"], r["id_b"])
        for r in dedup_simhash(spark, SF).collect()
    }
    assert got, "no pairs found"
    assert got <= want  # precision: every emitted pair is ham<=6
    guaranteed = {p for p in want if shares_small_bucket(*p)}
    assert guaranteed, "test data produced no small-bucket pairs"
    missing = guaranteed - got
    assert not missing, f"{len(missing)} guaranteed pairs missing"


def test_minhash_star_guard_keeps_giant_cluster(spark, tmp_path):
    """A cluster of near-identical documents larger than the bucket
    cap saturates every band bucket; the old guard dropped those
    buckets and emitted ZERO pairs for exactly the most duplicated
    content. Star-linking must keep the whole cluster connected."""
    from kgx.harness import MAX_LSH_BUCKET, dedup_minhash_lsh

    big = MAX_LSH_BUCKET + 40
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text) for i in range(big)]
    rows += [
        (1000 + i, f"completely unrelated document number {i} "
                   f"with its own distinct words entirely")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    pairs = [
        (r["id_a"], r["id_b"])
        for r in dedup_minhash_lsh(spark, d).collect()
    ]
    assert pairs, "giant duplicate cluster produced no pairs"
    find = _components(pairs)
    roots = {find(i) for i in range(big)}
    assert len(roots) == 1, "duplicate cluster not fully connected"


def test_simhash_star_guard_keeps_giant_cluster(spark, tmp_path):
    from kgx.harness import MAX_LSH_BUCKET, dedup_simhash

    big = MAX_LSH_BUCKET + 16
    rows = [(i, "identical duplicated payload text here") for i in
            range(big)]
    rows += [
        (5000 + i, f"noise text {i} zebra umbrella {i * 7}")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    pairs = [
        (r["id_a"], r["id_b"])
        for r in dedup_simhash(spark, d).collect()
    ]
    find = _components(pairs)
    assert len({find(i) for i in range(big)}) == 1


def test_fingerprint_matches_scalar_reference(spark):
    """The chunked/length-sorted vectorized Horner fold must equal the
    obvious one-char-at-a-time uint64 reference."""
    from kgx.harness import text_fingerprint

    got = {
        r["doc_id"]: r["fp"]
        for r in text_fingerprint(spark, SF).collect()
    }
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    base = 1099511628211
    mask = (1 << 64) - 1
    for r in docs:
        h = 0
        for ch in r["text"] or "":
            h = (h * base + ord(ch)) & mask
        if h >= 1 << 63:
            h -= 1 << 64
        assert got[r["doc_id"]] == h, r["doc_id"]
