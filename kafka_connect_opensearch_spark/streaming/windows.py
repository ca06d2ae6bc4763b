"""Event-time windowed aggregation with watermarks (late-data handling).

The reference forwards a record timestamp (`@timestamp`, P5) but performs
no event-time processing itself (SURVEY.md §2.8). A streaming ingest
pipeline still needs windowed rollups — e.g. docs/sec indexed per minute,
error rates per window — so this module provides them the Spark-native
way: ``withWatermark`` bounds state for late data, tumbling/sliding
windows via ``F.window``, counts/aggregates per (window, key).

State notes at scale: the watermark delay bounds the state store per key
cardinality × window span; late rows beyond the watermark drop (at-least-
once semantics match the connector's delivery model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 minute",
    slide: str | None = None,
    watermark_delay: str = "2 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling (or sliding) event-time counts with a watermark.

    Works on both streaming and batch frames (batch ignores the
    watermark — useful for oracle comparisons). ``value_col`` names the
    summed column; pass ``None`` (or a frame without it) for counts only."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    sum_value = value_col is not None and value_col in df.columns
    aggs = [F.count("*").alias("n")]
    if sum_value:
        aggs.append(F.sum(value_col).alias("total_value"))
    out_cols = [
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        key_col,
        "n",
    ]
    if sum_value:
        out_cols.append(F.round("total_value", 4).alias("total_value"))
    return df.groupBy(win.alias("win"), F.col(key_col)).agg(*aggs).select(*out_cols)


def run_windowed_stream(
    spark,
    source_dir: str,
    schema: str,
    checkpoint_dir: str,
    out_dir: str,
    **window_kwargs,
):
    """File-source streaming variant writing append-mode window results
    once the watermark closes each window."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_counts(stream, **window_kwargs)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
