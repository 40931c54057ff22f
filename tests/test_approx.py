"""agg_approx_distinct: the HLL estimate must stay within tolerance
of the exact distinct count (the op is rows-only under the driver
because sketch values are engine-specific; this is its value gate)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_tolerance(spark):
    from kgx.harness import agg_approx_distinct

    got = {
        r["event_type"]: r["approx_users"]
        for r in agg_approx_distinct(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in (
            spark.read.parquet(f"{SF}/events.parquet")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        )
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        # rsd=0.02 -> allow 3 sigma + slack for tiny groups
        tol = max(3, 0.06 * n)
        assert abs(got[k] - n) <= tol, (k, got[k], n)
