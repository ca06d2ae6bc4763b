"""Multi-field indexing via term prefixes (Lucene per-field terms).

OpenSearch indexes each mapped field's terms separately and scopes queries
with ``field:term``. Re-cast Spark-first: a document's searchable body is
composed by prefixing every field's tokens with ``<field>__`` (both sides
of the separator stay inside the analyzer's ``[a-z0-9_]+`` token class, so
the prefixed term is ONE token and the analyzer/codec/BM25 stack is
unchanged — the single "catch-all" field trick with field-qualified
terms). Field-scoped queries are then plain term queries on prefixed
terms; cross-field bool/AND semantics compose exactly like multi-term
queries.

The prefixing runs as one JVM ``regexp_replace`` per field (whole-stage
codegen), not a per-token higher-order function (CodegenFallback).

Reference parity: the connector ships whole JSON documents and OpenSearch
maps each property as its own field (Mapping.java:69-118); this module is
the index-side realization of that per-field searchability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_opensearch_spark.config import TOKEN_PATTERN
from kafka_connect_opensearch_spark.functions.analysis import tokenize_py

FIELD_SEP = "__"


def fielded_text(field_cols: dict[str, str]) -> Column:
    """Searchable multi-field body: every token of column
    ``field_cols[field]`` becomes ``<field>__<token>``; fields join with
    spaces. Fields compose in sorted name order (deterministic)."""
    parts = [
        F.regexp_replace(
            F.lower(F.col(col).cast("string")),
            f"({TOKEN_PATTERN})",
            f"{field}{FIELD_SEP}$1",
        )
        for field, col in sorted(field_cols.items())
    ]
    return F.concat_ws(" ", *parts)


def with_fielded_text(
    df: DataFrame, field_cols: dict[str, str], out: str = "fielded_text"
) -> DataFrame:
    return df.withColumn(out, fielded_text(field_cols))


def field_query(field: str, text: str) -> str:
    """Analyze ``text`` and qualify each token with ``field`` — feed the
    result to any IndexReader query (search / match_count / bool)."""
    return " ".join(f"{field}{FIELD_SEP}{t}" for t in tokenize_py(text))


def fielded_query(parts: dict[str, str]) -> str:
    """Multi-field query string: ``{"title": "spark join", "lang": "py"}``
    → qualified terms across all fields (sorted for determinism)."""
    return " ".join(
        field_query(f, text) for f, text in sorted(parts.items())
    )


def multi_match_best_fields(
    reader,
    text: str,
    fields: list[str],
    k: int = 10,
    tie_breaker: float = 0.0,
) -> DataFrame:
    """OpenSearch ``multi_match`` with ``type: best_fields`` (the
    default): the query text runs as ONE match query per field and a doc
    scores its best field's score + ``tie_breaker`` · the others — which
    is exactly ``dis_max`` over per-field match queries, and OpenSearch
    defines it that way. Re-cast here: each per-field query is the
    field-qualified token string over the multi-field index, composed
    through the unchanged BM25 stack (``search_dis_max``).

    Divergence note: field statistics (dl, avgdl, df) are those of the
    combined fielded body, not per-Lucene-field — the single-catch-all-
    field design documented in this module; the SQL oracle mirrors the
    same statistics, so verification is exact."""
    return reader.search_dis_max(
        [field_query(f, text) for f in sorted(fields)],
        k=k,
        tie_breaker=tie_breaker,
    )


def field_exists_count(reader, field: str, max_values: int = 10_000) -> int:
    """OpenSearch ``exists`` query (D7 count form): docs with ANY
    indexed term under ``field`` — a prefix expansion over the term
    dictionary (``<field>__*``) counted as an OR match, the same
    dictionary-rewrite envelope as prefix/wildcard queries. Bounded by
    the field's distinct-token vocabulary, not the corpus."""
    terms = reader.expand_prefix(f"{field}{FIELD_SEP}", max_values)
    return reader.match_count(" ".join(terms), mode="or") if terms else 0
