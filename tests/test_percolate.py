"""Percolator (reverse search): semantics + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_opensearch_spark import plans
from kafka_connect_opensearch_spark.operators import percolate as perc


def test_percolate_and_or_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta"), (3, "epsilon"),
         (4, "beta BETA beta!")],
        "doc_id long, text string",
    )
    qs = perc.stored_queries(spark, [
        (10, "alpha beta", "and"),
        (11, "alpha beta", "or"),
        (12, "", "or"),                  # analyzer-empty → inert
        (13, "beta", "and"),
    ])
    got = sorted(
        (r["query_id"], r["doc_id"])
        for r in perc.percolate(docs, qs).collect()
    )
    assert got == sorted([
        (10, 1),                          # both terms
        (11, 1), (11, 2), (11, 4),        # any term
        (13, 1), (13, 4),                 # dup/case-folded tokens count once
    ])


def test_percolate_plan_broadcast_no_cartesian(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha tok"), F.col("id").cast("string"))
        .alias("text"),
    )
    qs = perc.stored_queries(spark, [(1, "alpha", "or"), (2, "tok5", "and")])
    q = perc.percolate(docs, qs)
    plan = plans.executed_plan(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plans.has_broadcast_join(q)
    assert plan.count("HashAggregate") >= 2    # partial + final count
