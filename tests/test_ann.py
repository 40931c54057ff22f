"""ANN operators: algorithmic correctness of the IVF scale path and
the brute-force baseline over the driver embeddings table."""

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_ivf_topk_is_exact_within_probed_cells(spark):
    """IVF results must equal the brute-force cosine top-10 restricted
    to the probed cells (no approximation error beyond cell pruning),
    with the query vector itself at rank 1."""
    from kgx.harness import ann_ivf_topk

    got = ann_ivf_topk(spark, SF).collect()
    assert got[0]["vec_id"] == 0 and abs(got[0]["cos"] - 1.0) < 1e-9

    # brute force ground truth, numpy
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).collect()
    vecs = {r["vec_id"]: np.array(r["v"]) for r in rows}
    q = vecs[0]
    probed_ids = {r["vec_id"] for r in got} | {
        r["vec_id"] for r in got
    }
    cells = {r["vec_id"]: r["cell"] for r in got}
    probe_cells = set(cells.values())
    # recompute each returned cos exactly
    for r in got:
        v = vecs[r["vec_id"]]
        cos = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        assert abs(cos - r["cos"]) < 1e-5, r
    # results sorted by cos desc
    coss = [r["cos"] for r in got]
    assert coss == sorted(coss, reverse=True)
    assert len(got) == 10 and len(probed_ids) == 10
    assert len(probe_cells) <= 2  # nprobe=2


def _brute_pairs(vecs: dict, tau: float) -> set:
    ids = sorted(vecs)
    out = set()
    for i, a in enumerate(ids):
        va = vecs[a]
        for b in ids[i + 1 :]:
            vb = vecs[b]
            cos = float(
                va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
            )
            if cos >= tau:
                out.add((a, b))
    return out


def test_embedding_dedup_blocked_precision_and_plan(spark):
    """Every emitted pair must be a true >=tau pair (the cosine verify
    guarantees precision 1.0; LSH blocking only affects recall), and
    the plan must contain NO all-pairs join — blocking is the point."""
    import io
    from contextlib import redirect_stdout

    from kgx.contract import COSINE_TAU
    from kgx.harness import dedup_embedding_cosine

    df = dedup_embedding_cosine(spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    got = {(r["id_a"], r["id_b"]): r["cos"] for r in df.collect()}
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).collect()
    vecs = {r["vec_id"]: np.array(r["v"]) for r in rows}
    truth = _brute_pairs(vecs, COSINE_TAU)
    assert got, "blocked dedup found no pairs at all"
    assert set(got) <= truth  # precision 1.0
    for (a, b), cos in got.items():
        va, vb = vecs[a], vecs[b]
        want = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert abs(cos - want) < 1e-5


def test_embedding_dedup_recall_on_planted_clusters(spark, tmp_path):
    """Near-identical duplicates (the actual dedup target) share their
    whole sketch, so every planted cluster must come out connected —
    including one larger than MAX_LSH_BUCKET, which exercises the
    star-link guard (linear, not quadratic, in bucket size)."""
    from kgx.harness import MAX_LSH_BUCKET, dedup_embedding_cosine

    rng = np.random.RandomState(11)
    rows = []
    vid = 0
    clusters = []
    # 5 small clusters + 1 oversized (forces the star guard in every
    # band its bucket lands in)
    for size in (4, 4, 6, 3, 5, MAX_LSH_BUCKET + 36):
        base = rng.randn(64)
        members = []
        for _ in range(size):
            rows.append((vid, [float(x) for x in base], 0))
            members.append(vid)
            vid += 1
        clusters.append(members)
    # noise vectors
    for _ in range(50):
        rows.append((vid, [float(x) for x in rng.randn(64)], 1))
        vid += 1
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    d = str(tmp_path / "planted")
    df.coalesce(1).write.parquet(f"{d}/embeddings.parquet")

    pairs = [
        (r["id_a"], r["id_b"])
        for r in dedup_embedding_cosine(spark, d).collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    for members in clusters:
        roots = {find(m) for m in members}
        assert len(roots) == 1, f"cluster split: {members[:3]}..."


def test_brute_force_matches_numpy(spark):
    from kgx.harness import ann_cosine_topk

    got = {r["vec_id"]: r["cos"] for r in ann_cosine_topk(spark, SF).collect()}
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).collect()
    vecs = {r["vec_id"]: np.array(r["v"]) for r in rows}
    q = vecs[0]
    want = {}
    for vid, v in vecs.items():
        cos = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        if cos >= 0.25:
            want[vid] = cos
    assert set(got) == set(want)
    for vid in got:
        assert abs(got[vid] - want[vid]) < 1e-5


def test_ivf_assign_udf_path_matches_literal_path(spark):
    """The broadcast-UDF assignment (large k) must agree with the
    codegen-literal assignment (small k) on the same centroids —
    strategy switch, not a semantics switch."""
    from kgx.harness import ivf_assign, t

    e = t(spark, SF, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    cents = {
        j: list(r["v"])
        for j, r in enumerate(e.orderBy("vec_id").limit(20).collect())
    }
    lit = {r["vec_id"]: r["cell"]
           for r in ivf_assign(e, cents, k_max_literal=100).collect()}
    udf = {r["vec_id"]: r["cell"]
           for r in ivf_assign(e, cents, k_max_literal=1).collect()}
    assert lit == udf


def test_ivf_large_k_plan_and_exactness(spark):
    """Past IVF_LITERAL_K_MAX the assignment plan must carry NO
    per-centroid literal expressions (broadcast pandas UDF instead),
    and the top-k results stay exact within the probed cells."""
    from test_plans import plan_of

    from kgx.harness import IVF_LITERAL_K_MAX, ivf_topk_run

    k = 64
    assert k > IVF_LITERAL_K_MAX
    df = ivf_topk_run(spark, SF, k=k, iters=2)
    plan = plan_of(df)
    assert "ArrowEvalPython" in plan  # broadcast-UDF assignment
    assert "array_min" not in plan    # no k-literal min-of-structs

    got = df.collect()
    assert got[0]["vec_id"] == 0 and abs(got[0]["cos"] - 1.0) < 1e-9
    assert len(got) == 10
    assert len({r["cell"] for r in got}) <= 2  # nprobe=2
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).collect()
    vecs = {r["vec_id"]: np.array(r["v"]) for r in rows}
    q = vecs[0]
    for r in got:
        v = vecs[r["vec_id"]]
        cos = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        assert abs(cos - r["cos"]) < 1e-5, r
    coss = [r["cos"] for r in got]
    assert coss == sorted(coss, reverse=True)
