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


def test_percolate_streaming_equals_batch(spark, tmp_path):
    """The percolator is stateless row-wise logic + a broadcast join, so
    it composes directly with Structured Streaming (the alerting shape:
    readStream -> percolate -> alert sink); availableNow over the same
    rows must emit exactly the batch pairs."""
    docs = spark.createDataFrame(
        [(i, f"alpha tok{i % 7} beta") for i in range(60)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)

    rows = [(1, "alpha beta", "and"), (2, "tok3", "or"),
            (3, "beta tok5", "and")]
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        perc.percolate_stateless(stream, rows)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["query_id"], r["doc_id"])
        for r in spark.read.parquet(out_dir).collect()
    )
    qs = perc.stored_queries(spark, rows)
    want = sorted(
        (r["query_id"], r["doc_id"])
        for r in perc.percolate(docs, qs).collect()
    )
    # stateless literal evaluation == broadcast-join percolate == stream
    batch_stateless = sorted(
        (r["query_id"], r["doc_id"])
        for r in perc.percolate_stateless(docs, rows).collect()
    )
    assert got == want == batch_stateless and got
