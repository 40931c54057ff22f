"""Dedup operators: simhash multi-band recall guarantees, the
oversized-bucket star-link guard (a >cap cluster of near-identical
documents must stay connected, not vanish), and the vectorized
fingerprint against a straightforward per-char reference."""

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
    Verified against the pure-Python engine-portable twin
    (contract.doc_simhash) brute-forced over all pairs."""
    from kgx.contract import doc_simhash
    from kgx.harness import MAX_LSH_BUCKET, dedup_simhash

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    sh = [doc_simhash(r["text"]) for r in docs]
    ids = [r["doc_id"] for r in docs]
    pos = {d: i for i, d in enumerate(ids)}

    def ham(i, j):
        return bin(sh[i][0] ^ sh[j][0]).count("1") + bin(
            sh[i][1] ^ sh[j][1]
        ).count("1")

    want = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if ham(i, j) <= 6
    }

    def band(i, g):
        half = sh[i][0] if g < 4 else sh[i][1]
        return (half >> (8 * (g % 4))) & 255

    from collections import Counter

    sizes = Counter((g, band(i, g)) for i in range(len(ids))
                    for g in range(8))
    oversized = {k for k, c in sizes.items() if c > MAX_LSH_BUCKET}

    def shares_small_bucket(a, b):
        i, j = pos[a], pos[b]
        return any(
            band(i, g) == band(j, g) and (g, band(i, g)) not in oversized
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


def test_doc_hash_twins_match_spark(spark):
    """The pure-Python twins (contract.doc_minhash_sig / doc_simhash)
    must be bit-identical to the JVM md5/conv pipelines the operators
    run — the twins are what the brute-force recall gates above trust,
    and the DuckDB oracles are a third implementation checked by the
    driver."""
    from pyspark.sql import functions as F

    from kgx.contract import DOC_A, DOC_B, DOC_PRIME, doc_minhash_sig
    from kgx.harness import _SHINGLE_SPARK

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one two",
        "",
        "a  b   c d e f g",  # consecutive spaces -> empty tokens
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    ws = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " ")
    d = df.select("doc_id", ws.alias("ws")).withColumn(
        "shs",
        F.when(F.size("ws") >= 3,
               F.array_distinct(F.expr(_SHINGLE_SPARK)))
        .otherwise(F.array(F.concat_ws(" ", F.col("ws")))),
    ).withColumn(
        "tk",
        F.transform("shs", lambda s: F.conv(
            F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")),
    )
    sig = F.array(*[
        F.array_min(F.transform(
            "tk",
            lambda x: (F.lit(DOC_A[i]) * x + F.lit(DOC_B[i]))
            % F.lit(DOC_PRIME),
        ))
        for i in range(64)
    ])
    got = {r["doc_id"]: r["sig"]
           for r in d.withColumn("sig", sig).collect()}
    for i, t in enumerate(texts):
        assert got[i] == doc_minhash_sig(t), f"doc {i}"


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
    obvious one-char-at-a-time modular reference (the same value the
    DuckDB oracle computes via the powers-table sum form)."""
    from kgx.contract import DOC_PRIME
    from kgx.harness import FP_BASE, text_fingerprint

    got = {
        r["doc_id"]: r["fp"]
        for r in text_fingerprint(spark, SF).collect()
    }
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    for r in docs:
        h = 0
        for ch in r["text"] or "":
            h = (h * FP_BASE + ord(ch)) % DOC_PRIME
        assert got[r["doc_id"]] == h, r["doc_id"]


def test_cluster_keep_resolves_planted_near_dup_groups(spark):
    """dedup_cluster_keep must resolve the verified pair graph into
    min-id-keyed components: every pair's endpoints share a cluster,
    each cluster keeps its min doc_id, and members = nodes of its
    component (cross-checked with a Python union-find over the same
    oracle-checked pair set)."""
    from kgx.harness import dedup_cluster_keep, dedup_minhash_lsh

    sf = "/root/testdata/sf0.001"
    pairs = [(r["id_a"], r["id_b"])
             for r in dedup_minhash_lsh(spark, sf).collect()]
    assert pairs, "fixture assumption: near-dup pairs exist"
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), set()).add(n)
    want = {(min(ms), len(ms), max(ms)) for ms in comp.values()}
    got = {(r["keep_id"], r["n_members"], r["max_member"])
           for r in dedup_cluster_keep(spark, sf).collect()}
    assert got == want


def test_cluster_keep_generalizes_across_pair_families(spark):
    """The shared `_cluster_keep` resolution must produce min-id-keyed
    components for EVERY instantiating pair family (simhash hamming
    pairs, embedding cosine pairs) — cross-checked with a Python
    union-find over each family's own verified pair set, and the
    registered DuckDB oracle (pulled from OPS, never hand-copied)
    must agree row-for-row at sf0.001."""
    import duckdb

    from kgx.harness import (
        OPS,
        dedup_embedding_cluster_keep,
        dedup_embedding_cosine,
        dedup_ngram_cluster_keep,
        dedup_ngram_jaccard,
        dedup_simhash,
        dedup_simhash_cluster_keep,
    )

    families = [
        (dedup_simhash, dedup_simhash_cluster_keep,
         "dedup_simhash_cluster_keep"),
        (dedup_embedding_cosine, dedup_embedding_cluster_keep,
         "dedup_embedding_cluster_keep"),
        (dedup_ngram_jaccard, dedup_ngram_cluster_keep,
         "dedup_ngram_cluster_keep"),
    ]
    con = duckdb.connect()
    for tbl in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{SF}/{tbl}.parquet')"
        )
    for pair_op, cluster_op, name in families:
        pairs = [(r["id_a"], r["id_b"])
                 for r in pair_op(spark, SF).collect()]
        assert pairs, f"fixture assumption: {name} pairs exist"
        comp = {}
        find = _components(pairs)
        for a, b in pairs:
            for n in (a, b):
                comp.setdefault(find(n), set()).add(n)
        want = {(min(ms), len(ms), max(ms)) for ms in comp.values()}
        got = {(r["keep_id"], r["n_members"], r["max_member"])
               for r in cluster_op(spark, SF).collect()}
        assert got == want, name
        oracle = {tuple(r) for r in con.execute(OPS[name][1]).fetchall()}
        assert oracle == want, f"{name} DuckDB oracle disagrees"
