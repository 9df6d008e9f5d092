"""Co-located join via bucketed tables: bucketBy on the join key lets
the sort-merge join run with NO Exchange on either side — the on-disk
layout IS the shuffle, paid once at write time. This is the 100 TB
strategy for repeatedly-joined fact tables (PLANS.md)."""

from __future__ import annotations

import contextlib
import io


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sf = "/root/testdata/sf0.01"
        orders = spark.read.parquet(f"{sf}/orders.parquet")
        customer = spark.read.parquet(f"{sf}/customer.parquet")

        (orders.write.mode("overwrite")
         .bucketBy(8, "o_custkey").sortBy("o_custkey")
         .saveAsTable("orders_b"))
        (customer.write.mode("overwrite")
         .bucketBy(8, "c_custkey").sortBy("c_custkey")
         .saveAsTable("customer_b"))

        ob = spark.table("orders_b")
        cb = spark.table("customer_b")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        plan = _plan_of(joined)
        assert "SortMergeJoin" in plan
        # co-located: neither side shuffles
        assert "Exchange" not in plan

        # and the result matches the plain (shuffled) join
        plain = orders.join(customer,
                            orders.o_custkey == customer.c_custkey)
        assert joined.count() == plain.count()
        a = joined.agg(F.sum(F.round(F.col("o_totalprice") * 100)
                             .cast("long"))).head()[0]
        b = plain.agg(F.sum(F.round(F.col("o_totalprice") * 100)
                            .cast("long"))).head()[0]
        assert a == b
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
