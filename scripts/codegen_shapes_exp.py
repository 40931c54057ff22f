"""Cold-codegen A/B for the 64-agg minhash signature stage.
Run in a FRESH process per variant: python scripts/codegen_shapes_exp.py A|B|D [sf_dir]
Times the full dedup_minhash_lsh-equivalent op (count action)."""
import sys, time
sys.path.insert(0, "/root/repo")
variant = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

from kgx.spark.session import get_spark
from pyspark.sql import functions as F
from kgx.contract import DOC_A, DOC_B, DOC_PRIME
from kgx.spark.udfs import band_key_cols
from kgx.harness import _SHINGLE_SPARK, _lsh_candidate_pairs, JACCARD_TAU

spark = get_spark("exp", cores=32, shuffle_partitions=32)
t0 = time.time()
ws = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " ")
d = (
    spark.read.parquet(f"{sf}/documents.parquet")
    .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    .select("doc_id", ws.alias("ws"))
    .withColumn("shs", F.when(F.size("ws") >= 3,
                F.array_distinct(F.expr(_SHINGLE_SPARK)))
                .otherwise(F.array(F.concat_ws(" ", F.col("ws")))))
    .drop("ws").localCheckpoint()
)
toks = d.select("doc_id", F.explode("shs").alias("s")).select(
    "doc_id",
    F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("bigint").alias("tok"),
)
if variant == "A":
    sig_aggs = [F.min((F.lit(DOC_A[i]) * F.col("tok") + F.lit(DOC_B[i])) % F.lit(DOC_PRIME)).alias(f"s{i}") for i in range(64)]
    grouped = toks.groupBy("doc_id").agg(*sig_aggs)
    sig = grouped.withColumn("sig", F.array(*[F.col(f"s{i}") for i in range(64)]))
elif variant == "B":
    ab = F.array(*[F.struct(F.lit(DOC_A[i]).alias("a"), F.lit(DOC_B[i]).alias("b")) for i in range(64)])
    toks2 = toks.withColumn("hs", F.transform(ab, lambda p: (p["a"] * F.col("tok") + p["b"]) % F.lit(DOC_PRIME)))
    sig_aggs = [F.min(F.col("hs")[i]).alias(f"s{i}") for i in range(64)]
    grouped = toks2.groupBy("doc_id").agg(*sig_aggs)
    sig = grouped.withColumn("sig", F.array(*[F.col(f"s{i}") for i in range(64)]))
elif variant == "D":
    ab = F.array(*[F.struct(F.lit(i).alias("i"), F.lit(DOC_A[i]).alias("a"), F.lit(DOC_B[i]).alias("b")) for i in range(64)])
    perrow = toks.select("doc_id", F.explode(F.transform(ab, lambda p: F.struct(p["i"].alias("i"), ((p["a"] * F.col("tok") + p["b"]) % F.lit(DOC_PRIME)).alias("h")))).alias("ih"))
    mins = perrow.groupBy("doc_id", F.col("ih.i").alias("i")).agg(F.min("ih.h").alias("h"))
    sig = mins.groupBy("doc_id").agg(F.transform(F.array_sort(F.collect_list(F.struct("i", "h"))), lambda s: s["h"]).alias("sig"))
banded = sig.select("doc_id", F.explode(band_key_cols()).alias("bk"))
pairs = _lsh_candidate_pairs(banded, id_col="doc_id")
sa = d.select(F.col("doc_id").alias("id_a"), F.col("shs").alias("sa"))
sb = d.select(F.col("doc_id").alias("id_b"), F.col("shs").alias("sb"))
inter = F.size(F.array_intersect("sa", "sb"))
den = F.size("sa") + F.size("sb") - inter
res = (pairs.join(sa, "id_a").join(sb, "id_b")
       .withColumn("sim", inter / den).where(F.col("sim") >= JACCARD_TAU)
       .select("id_a", "id_b", F.round("sim", 4).alias("sim")))
rows = res.collect()
cold = time.time() - t0
t1 = time.time(); res.collect(); warm = time.time() - t1
import hashlib
h = hashlib.md5(str(sorted((r["id_a"], r["id_b"], r["sim"]) for r in rows)).encode()).hexdigest()[:10]
print(f"variant={variant} cold={cold:.2f}s warm={warm:.2f}s rows={len(rows)} hash={h}")
spark.stop()
