"""Full ingest pipeline: the connector's put-path end-to-end (SURVEY.md §3.1).

``ingest`` chains the pieces the way ``OpenSearchSinkTask.put`` does:
record policies + conversion (P1-P9) → latest-wins identity (W1/W4) →
micro-batched segment build (D2-D4, B1) → DLQ table append (E3) →
tombstone deletes applied via merge (W3). One call ingests a source table
into a searchable index directory with quarantine and delete semantics.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from kafka_connect_opensearch_spark.config import EngineConfig
from kafka_connect_opensearch_spark.operators.convert import convert_records
from kafka_connect_opensearch_spark.operators.indexer import build_index
from kafka_connect_opensearch_spark.operators.merge import merge_segments
from kafka_connect_opensearch_spark.operators.segments import BuildMetrics


@dataclass
class IngestResult:
    metrics: BuildMetrics
    dlq_rows: int
    deletes_applied: int


def ingest(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    config: EngineConfig | None = None,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    content_col: str = "content",
    version_col: str | None = None,
    dlq_dir: str | None = None,
    resume: bool = True,
    payload_cols: list[str] | None = None,
    mapping_fields: tuple[str, ...] | None = None,
) -> IngestResult:
    """Convert → index → quarantine → delete, with resumable segments.

    When ``payload_cols`` is given, the schema'd payload runs the full
    DataConverter path (DataConverter.java:116-200): §1.2b preprocessing
    (Decimal→double, MAP→kv-structs) → JSON serialization → that JSON
    becomes the indexed document body (``content_col`` is replaced)."""
    from kafka_connect_opensearch_spark.operators.convert import (
        preprocess_payload,
        to_json_payload,
    )

    config = config or EngineConfig()
    payload_col = None
    if payload_cols is not None:
        source = preprocess_payload(
            source, payload_cols, config.compact_map_entries
        )
        source = to_json_payload(source, payload_cols, out=content_col)
        # the serialized JSON body is the payload the malformed classifier
        # grades (mapper_parsing / strict_dynamic_mapping checks) — without
        # this, schema'd-payload ingest silently skipped those two classes
        payload_col = content_col
    batch = convert_records(
        source, id_cols, content_col, version_col, config,
        payload_col=payload_col, mapping_fields=mapping_fields,
    )

    dlq_rows = 0
    if dlq_dir is None:
        dlq_dir = os.path.join(index_dir, "dlq")
    dlq = batch.dlq
    if dlq.isEmpty() is False:
        dlq.write.mode("append").parquet(dlq_dir)
        dlq_rows = spark.read.parquet(dlq_dir).count()

    metrics = build_index(
        spark,
        batch.documents,
        index_dir,
        config,
        id_cols=id_cols,
        content_col=content_col,
        resume=resume,
    )

    deletes_applied = 0
    n_deletes = batch.deletes.count()
    if n_deletes:
        # apply tombstones by rewriting the affected segments (merge-time
        # delete, W3); doc_key of a delete record joins the index identity
        merge_segments(spark, index_dir, config, delete_doc_keys=batch.deletes)
        deletes_applied = n_deletes
    if config.auto_merge:
        # tiered compaction keeps segment count bounded across repeated
        # incremental ingests (the reference's automatic flush cadence)
        from kafka_connect_opensearch_spark.operators.merge import auto_merge

        auto_merge(spark, index_dir, config)
    return IngestResult(metrics=metrics, dlq_rows=dlq_rows,
                        deletes_applied=deletes_applied)
