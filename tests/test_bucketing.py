"""Bucketed co-located join: pre-bucketing both sides on the join key lets
Catalyst plan a SortMergeJoin with NO shuffle exchange — the storage-level
answer to repeated large joins on the same key (SURVEY §4 O12 family)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse_tables(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o = spark.createDataFrame(
        [(i, f"c{i % 7}") for i in range(200)], "o_orderkey long, cust string")
    li = spark.createDataFrame(
        [(i % 150, i, float(i)) for i in range(600)],
        "l_orderkey long, l_id long, qty double")
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
       .sortBy("o_orderkey").option("path", str(tmp_path / "b_orders"))
       .saveAsTable("b_orders"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey").option("path", str(tmp_path / "b_lineitem"))
       .saveAsTable("b_lineitem"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestBucketedJoin:
    def test_join_has_no_shuffle(self, spark, warehouse_tables):
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            o = spark.table("b_orders")
            li = spark.table("b_lineitem")
            joined = li.join(o, li.l_orderkey == o.o_orderkey)
            plan = joined._sc._jvm.PythonSQLUtils.explainString(
                joined._jdf.queryExecution(), "formatted")
            assert "SortMergeJoin" in plan
            # co-located buckets: no Exchange anywhere in the join plan
            assert "Exchange (" not in plan and "+- Exchange" not in plan
            # correctness unchanged
            n = joined.count()
            plain = li.join(
                spark.createDataFrame(
                    [(i, f"c{i % 7}") for i in range(200)],
                    "o_orderkey long, cust string"),
                li.l_orderkey == F.col("o_orderkey")).count()
            assert n == plain
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
