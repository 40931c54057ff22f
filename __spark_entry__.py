"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship multi-operator query over sf0.001.
queries()       — one entry per implemented operator (SURVEY.md §2
                  Table B + training-data ops), from kgx.harness.
oracle_sql()    — matching ANSI SQL for DuckDB; omitted for ops whose
                  outputs are engine-specific or fixture-based (driver
                  records rows-only; pytest covers their semantics).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue pyramid per nation/month with broadcast dims,
    window ranking and decimal-exact aggregation over sf0.001.

    (The KG-construction pipeline itself — the system's real flagship —
    runs on the synthetic transcripts fixtures; it is exercised by the
    pipe_* queries() entries and the pytest parity/P-R gates.)
    """
    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    o = spark.read.parquet(f"{SF0001}/orders.parquet")
    c = spark.read.parquet(f"{SF0001}/customer.parquet")
    n = spark.read.parquet(f"{SF0001}/nation.parquet")

    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,4)")
            ).alias("revenue"),
        )
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), "month")
    return (
        rev.withColumn("rank_in_nation", F.row_number().over(w))
        .where(F.col("rank_in_nation") <= 3)
        .orderBy("n_name", "rank_in_nation")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgx.harness import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from kgx.harness import oracle_sql as _o

    return _o()
