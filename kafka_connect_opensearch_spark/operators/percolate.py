"""Percolator: stored queries run in REVERSE — for each incoming
document, which saved queries match it (OpenSearch's ``percolate``
query: the alerting / saved-search primitive; the connector's users pair
it with the sink to trigger on matching records as they index).

Spark-first shape, built for the streaming-ingest scale case (every
micro-batch percolated against thousands of stored queries):

- the stored-query table is SMALL (queries, not documents) — its
  exploded (query_id, term) form broadcasts;
- each doc contributes its DISTINCT tokens once (``array_distinct``
  before the explode bounds the blow-up at distinct-terms-per-doc, not
  positions);
- one broadcast equi-join on term + one partial-aggregated count per
  (doc, query) decides AND (all terms matched) vs OR (any term) — no
  per-query scan, no corpus × queries cartesian anywhere.

Lucene's percolator builds a memory index per doc and runs every query;
the relational dual here is equivalent for term queries (the stored
shape this module supports) and is embarrassingly parallel over docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kafka_connect_opensearch_spark.functions.analysis import tokenize

PERC_QUERY_SCHEMA = "query_id long, terms array<string>, mode string"


def stored_queries(spark, rows: list[tuple[int, str, str]],
                   analyzer=None) -> DataFrame:
    """Build the stored-query table from (query_id, query_text, mode)
    rows — query text goes through the SAME analyzer as documents (the
    percolator's re-analyze contract), with duplicate terms collapsed."""
    from kafka_connect_opensearch_spark.functions.analysis import tokenize_py

    data = [
        (qid, sorted(set(tokenize_py(text))), mode)
        for qid, text, mode in rows
    ]
    return spark.createDataFrame(data, PERC_QUERY_SCHEMA)


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id) pairs where the stored query matches the doc:
    ``and`` = every query term occurs in the doc, ``or`` = at least one
    (empty-term queries match nothing — analyzer-empty saved queries are
    inert, matching OpenSearch's rewrite of an empty bool)."""
    qt = queries.filter(F.size("terms") > 0).select(
        "query_id",
        "mode",
        F.size("terms").alias("n_terms"),
        F.explode("terms").alias("term"),
    )
    dt = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term"),
    )
    hits = (
        dt.join(F.broadcast(qt), "term")
        .groupBy("doc_id", "query_id", "mode", "n_terms")
        .agg(F.count("*").alias("matched"))
    )
    return hits.filter(
        (F.col("mode") == "or") | (F.col("matched") == F.col("n_terms"))
    ).select("query_id", "doc_id")


def percolate_stateless(
    docs: DataFrame,
    query_rows: list[tuple[int, str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stateless percolate — the STREAMING alerting shape: the stored
    queries ship as a literal array in the plan and every doc row
    evaluates them with array intersections (exactly Lucene's
    per-document query evaluation, O(queries) per doc), so there is NO
    aggregation and no shuffle: works in append-mode streams without a
    watermark and never holds state. Prefer :func:`percolate` for batch
    backfills over very large stored-query sets (its broadcast term join
    skips queries sharing no term with the doc)."""
    from kafka_connect_opensearch_spark.functions.analysis import tokenize_py

    analyzed = [
        (qid, sorted(set(tokenize_py(text))), mode)
        for qid, text, mode in query_rows
    ]
    qlit = F.array(*[
        F.struct(
            F.lit(qid).cast("long").alias("query_id"),
            F.array(*[F.lit(t) for t in terms]).alias("terms"),
            F.lit(mode).alias("mode"),
        )
        for qid, terms, mode in analyzed
        if terms
    ])
    toks = F.array_distinct(tokenize(F.col(text_col)))
    matched = F.filter(
        qlit,
        lambda q: F.when(
            q["mode"] == "or",
            F.size(F.array_intersect(toks, q["terms"])) > 0,
        ).otherwise(
            F.size(F.array_intersect(toks, q["terms"]))
            == F.size(q["terms"])
        ),
    )
    return docs.select(
        F.explode(matched).alias("q"), F.col(id_col).alias("doc_id")
    ).select(F.col("q.query_id").alias("query_id"), "doc_id")
