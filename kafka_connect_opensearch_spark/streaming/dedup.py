"""Streaming deduplication — the training-data-pipeline op on a live feed.

The batch dedup family (``operators/dedup.py``) assumes a bounded corpus;
an ingest stream needs the same exact-dedup guarantee with BOUNDED state.
Spark-native: key each record by its content digest (the identical
``sha256`` the batch ``exact_dedup`` uses, so stream and batch agree), and
drop duplicates with ``dropDuplicatesWithinWatermark`` — the state store
holds one entry per distinct digest only within the watermark horizon, so
state is O(distinct docs per watermark window), not O(stream length).

Semantics: the FIRST record per digest within a watermark horizon
survives (the connector's first-wins CREATE-op analog); a duplicate
arriving later than the watermark delay after the retained copy may be
re-emitted (the documented trade-off of bounded state — Lucene-side
latest-wins at the index merge still collapses those).

Works on batch frames too (exact global dedup via the same digest), so
tests can pin stream ⊆/⊇ batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_digest(
    df: DataFrame, text_col: str, digest_col: str = "digest"
) -> DataFrame:
    """Content digest column — identical to batch ``exact_dedup``'s key."""
    return df.withColumn(digest_col, F.sha2(F.col(text_col), 256))


def dedup_stream(
    df: DataFrame,
    text_col: str,
    ts_col: str,
    watermark_delay: str = "10 minutes",
    digest_col: str = "digest",
) -> DataFrame:
    """First-wins exact dedup keyed on the content digest.

    Streaming frames use ``dropDuplicatesWithinWatermark`` (state bounded
    by the watermark horizon); batch frames use plain ``dropDuplicates``
    on the digest (global, deterministic given the input order produced
    by an ``orderBy`` upstream — tests pin set-semantics, not row
    identity)."""
    out = with_digest(df, text_col, digest_col)
    if out.isStreaming:
        return out.withWatermark(ts_col, watermark_delay) \
            .dropDuplicatesWithinWatermark([digest_col])
    return out.dropDuplicates([digest_col])


def run_dedup_stream(
    spark,
    source_dir: str,
    schema: str,
    checkpoint_dir: str,
    out_dir: str,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
):
    """File-source streaming variant: append-mode deduped records."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    deduped = dedup_stream(stream, text_col, ts_col, watermark_delay)
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
