"""Record→document conversion semantics (SURVEY.md P1-P9, W1-W4, E1-E3).

Re-expresses ``DataConverter.java`` + the task's record policies as pure
DataFrame transformations:

- identity: key-based or synthesized ``doc_key`` (DataConverter.java:87-114,
  156-158);
- tombstones (null content): IGNORE drops, DELETE routes to a delete set,
  FAIL raises (DataConverter.java:117-154);
- malformed records: IGNORE/WARN drop (WARN logs), FAIL raises; dropped rows
  are quarantined to a DLQ frame with the error reason
  (OpenSearchSinkTask.java:289-313, OpenSearchClient.java:91-98);
- latest-wins external versioning: replays/duplicates collapse via
  ``max_by(struct, version)`` — the idempotent-replay equivalence of
  VersionType.EXTERNAL (DataConverter.java:225-235,
  OpenSearchClient.java:505-516);
- value preprocessing (§1.2b): Decimal→double, MAP→kv-struct-array,
  recursive — provided for schema'd payload columns.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_opensearch_spark.config import (
    DOC_KEY_SEP,
    BehaviorOnMalformedDoc,
    BehaviorOnNullValues,
    EngineConfig,
)


@dataclass
class ConvertedBatch:
    """Outcome of record conversion: documents to index, deletes to apply,
    and the dead-letter quarantine (E3)."""

    documents: DataFrame
    deletes: DataFrame
    dlq: DataFrame


def synthesize_doc_key(
    df: DataFrame, id_cols: tuple[str, ...], out: str = "doc_key"
) -> DataFrame:
    """key.ignore=true identity: "{topic}+{partition}+{offset}" →
    separator-joined id columns (DataConverter.java:156-158)."""
    return df.withColumn(out, F.concat_ws(DOC_KEY_SEP, *[F.col(c) for c in id_cols]))


# Reference MALFORMED_DOC_ERRORS (OpenSearchClient.java:91-98): the four
# response-error classes routed through behavior_on_malformed_docs. In a
# Spark-native engine the same defects are detectable at conversion time,
# so each class becomes a record-shape predicate.
MAX_DOC_ID_BYTES = 512  # OpenSearch hard limit; longer ids raise
                        # illegal_argument_exception at the bulk API


def classify_malformed(
    df: DataFrame,
    id_cols: tuple[str, ...],
    content_col: str,
    payload_col: str | None = None,
    mapping_fields: tuple[str, ...] | None = None,
    key_col: str = "doc_key",
    max_id_bytes: int = MAX_DOC_ID_BYTES,
) -> Column:
    """E1 classifier: per-record error class (null when well-formed),
    mirroring the reference's MALFORMED_DOC_ERRORS set
    (OpenSearchClient.java:91-98, 534-561):

    - ``action_request_validation_exception`` — null id column (the bulk
      API rejects requests without an id when deletes/versioning need one);
    - ``illegal_argument_exception`` — doc id longer than 512 bytes;
    - ``mapper_parsing_exception`` — payload is not parseable JSON;
    - ``strict_dynamic_mapping_exception`` — payload contains fields
      outside the declared mapping (strict dynamic mapping).

    Tombstones (null ``content_col``) are exempt: the null-VALUE policy
    handles them first (DataConverter.java:116-160). Evaluation order is a
    single CASE chain — per-row lazy, all JVM built-ins."""
    null_key = F.lit(False)
    for c in id_cols:
        null_key = null_key | F.col(c).isNull()
    tombstone = F.col(content_col).isNull()

    chain = F.when(tombstone, F.lit(None).cast("string")).when(
        null_key, F.lit("action_request_validation_exception: null id column")
    ).when(
        F.octet_length(F.col(key_col)) > max_id_bytes,
        F.lit(
            f"illegal_argument_exception: doc id exceeds {max_id_bytes} bytes"
        ),
    )
    if payload_col is not None:
        chain = chain.when(
            F.try_parse_json(F.col(payload_col)).isNull(),
            F.lit("mapper_parsing_exception: unparseable JSON payload"),
        )
        if mapping_fields is not None:
            unmapped = F.array_except(
                F.json_object_keys(F.col(payload_col)),
                F.array(*[F.lit(f) for f in mapping_fields]),
            )
            chain = chain.when(
                F.size(unmapped) > 0,
                F.lit("strict_dynamic_mapping_exception: unmapped fields"),
            )
    return chain.otherwise(F.lit(None).cast("string"))


def convert_records(
    df: DataFrame,
    id_cols: tuple[str, ...],
    content_col: str,
    version_col: str | None = None,
    config: EngineConfig | None = None,
    payload_col: str | None = None,
    mapping_fields: tuple[str, ...] | None = None,
) -> ConvertedBatch:
    """Apply the connector's record policies as a single declarative plan.

    A record is *malformed* when any id column is null (the reference's
    "key is null" DataException, DataConverter.java:89-92) — routed by
    ``behavior_on_malformed_docs``. A record is a *tombstone* when
    ``content`` is null — routed by ``behavior_on_null_values``.
    """
    config = config or EngineConfig()
    df = synthesize_doc_key(df, id_cols)

    null_key_cond = F.lit(False)
    for c in id_cols:
        null_key_cond = null_key_cond | F.col(c).isNull()
    tombstone_cond = F.col(content_col).isNull()
    # Reference precedence (DataConverter.convertRecord,
    # DataConverter.java:116-160): the null-VALUE branch runs first — a
    # tombstone with a null key is silently ignored (nothing to delete,
    # DataConverter.java:123-135), NOT a malformed record. The classifier
    # exempts tombstones and grades everything else into the reference's
    # four MALFORMED_DOC_ERRORS classes.
    reason = classify_malformed(
        df, id_cols, content_col, payload_col, mapping_fields
    )
    malformed_cond = reason.isNotNull()

    # FAIL policies are checked eagerly (one small agg action on the batch):
    # the reference throws at put() time, and a lazily-embedded raise_error
    # is not reliable — Catalyst legally reorders filters around it and the
    # raising rows can be pruned before evaluation.
    if (
        config.behavior_on_malformed_docs == BehaviorOnMalformedDoc.FAIL
        or config.behavior_on_null_values == BehaviorOnNullValues.FAIL
    ):
        counts = df.agg(
            F.sum(malformed_cond.cast("long")).alias("malformed"),
            F.sum(tombstone_cond.cast("long")).alias("tombstones"),
        ).collect()[0]
        if (
            config.behavior_on_null_values == BehaviorOnNullValues.FAIL
            and (counts["tombstones"] or 0) > 0
        ):
            raise ValueError(
                f"null value for {counts['tombstones']} records with "
                "behavior_on_null_values=fail"
            )
        if (
            config.behavior_on_malformed_docs == BehaviorOnMalformedDoc.FAIL
            and (counts["malformed"] or 0) > 0
        ):
            raise ValueError(
                f"malformed records in batch ({counts['malformed']}) with "
                "behavior_on_malformed_docs=fail"
            )

    tagged = df.withColumn("_error", reason)

    dlq = tagged.filter(F.col("_error").isNotNull())
    ok = tagged.filter(F.col("_error").isNull()).drop("_error")

    # deletable tombstones need a key (null-key tombstones drop silently)
    deletes = ok.filter(tombstone_cond & ~null_key_cond).select("doc_key") if (
        config.behavior_on_null_values == BehaviorOnNullValues.DELETE
    ) else ok.filter(F.lit(False)).select("doc_key")
    docs = ok.filter(~tombstone_cond)

    if config.is_data_stream:
        # data streams: @timestamp injection (DataConverter.java:202-223)
        docs = add_timestamp(docs, config.data_stream_timestamp_field)
    if version_col is not None:
        if config.is_data_stream:
            # Data streams write with op CREATE and NO external versioning
            # (DataConverter.java:175-180,225-235): a replayed id hits a
            # version conflict, which the error policy ignores (E2) — the
            # FIRST write wins, not the latest.
            docs = first_wins(docs, "doc_key", version_col)
        else:
            # W4: latest-wins per doc_key — replays are no-ops (idempotence)
            docs = latest_wins(docs, "doc_key", version_col)
    return ConvertedBatch(documents=docs, deletes=deletes, dlq=dlq)


def route_records(
    df: DataFrame,
    id_cols: tuple[str, ...],
    content_col: str,
    config: EngineConfig | None = None,
) -> DataFrame:
    """Single-pass route tag per record: ``dlq`` (malformed), ``delete``
    (tombstone under DELETE policy), ``drop`` (tombstone under IGNORE), or
    ``index``. Same conditions as :func:`convert_records`, but one frame —
    route counts become ONE aggregation job instead of three ``count()``
    actions recomputing the source scan."""
    config = config or EngineConfig()
    null_key_cond = F.lit(False)
    for c in id_cols:
        null_key_cond = null_key_cond | F.col(c).isNull()
    tombstone_cond = F.col(content_col).isNull()
    delete_policy = config.behavior_on_null_values == BehaviorOnNullValues.DELETE
    # tombstones take precedence over malformed (DataConverter.java:116-160);
    # a null-key tombstone drops silently even under DELETE
    tombstone_route = F.when(
        F.lit(delete_policy) & ~null_key_cond, F.lit("delete")
    ).otherwise(F.lit("drop"))
    return df.withColumn(
        "route",
        F.when(tombstone_cond, tombstone_route)
        .when(null_key_cond, F.lit("dlq"))
        .otherwise(F.lit("index")),
    )


def latest_wins(df: DataFrame, key_col: str, version_col: str) -> DataFrame:
    """max_by(all columns, version) per key — external-versioning semantics
    (W1/W4). One shuffle on the key; ties broken by highest version only
    (the reference ignores equal-version conflicts as success)."""
    others = [c for c in df.columns if c != key_col]
    packed = df.groupBy(key_col).agg(
        F.max_by(F.struct(*[F.col(c) for c in others]), F.col(version_col)).alias(
            "_row"
        )
    )
    return packed.select(key_col, *[F.col(f"_row.{c}").alias(c) for c in others])


def first_wins(df: DataFrame, key_col: str, version_col: str) -> DataFrame:
    """min_by per key — data-stream CREATE-op semantics: the first write of
    an id succeeds, replays raise version conflicts the error policy
    ignores (DataConverter.java:175-180, OpenSearchClient.java:91-98)."""
    others = [c for c in df.columns if c != key_col]
    packed = df.groupBy(key_col).agg(
        F.min_by(F.struct(*[F.col(c) for c in others]), F.col(version_col)).alias(
            "_row"
        )
    )
    return packed.select(key_col, *[F.col(f"_row.{c}").alias(c) for c in others])


def write_action_columns(df: DataFrame, config: EngineConfig) -> DataFrame:
    """Attach the write-request shape the reference derives per record
    (DataConverter.java:168-185, 225-235): ``op_type`` (create for data
    streams, else index/update by write method) and
    ``use_external_versioning`` (disabled for data streams and ignored
    keys)."""
    from kafka_connect_opensearch_spark.config import WriteMethod

    if config.write_method == WriteMethod.UPSERT:
        op = "update"
    elif config.is_data_stream:
        op = "create"
    else:
        op = "index"
    versioned = (
        config.write_method == WriteMethod.INSERT
        and not config.is_data_stream
        and not config.key_ignore
    )
    return df.withColumn("op_type", F.lit(op)).withColumn(
        "use_external_versioning", F.lit(versioned)
    )


def apply_deletes(index_docs: DataFrame, deletes: DataFrame, key: str) -> DataFrame:
    """W3: tombstone deletes as a broadcast-able left anti-join."""
    return index_docs.join(F.broadcast(deletes.select(key).distinct()), key, "left_anti")


def upsert_documents(
    existing: DataFrame, updates: DataFrame, key: str
) -> DataFrame:
    """W2: partial-update upsert — fields present (non-null) in the update
    replace existing fields; absent docs are created. Full-outer join +
    per-field coalesce(new, old) (SURVEY.md W2; Iceberg MERGE at scale)."""
    cols = [c for c in existing.columns if c != key]
    e = existing.select(key, *[F.col(c).alias(f"_old_{c}") for c in cols])
    u = updates.select(key, *[F.col(c).alias(f"_new_{c}") for c in cols])
    j = e.join(u, key, "full_outer")
    return j.select(
        key,
        *[
            F.coalesce(F.col(f"_new_{c}"), F.col(f"_old_{c}")).alias(c)
            for c in cols
        ],
    )


def add_timestamp(
    df: DataFrame,
    ts_field_candidates: tuple[str, ...] = (),
    batch_ts: Column | None = None,
    out: str = "@timestamp",
) -> DataFrame:
    """P5: data-stream timestamp injection (DataConverter.maybeAddTimestamp,
    DataConverter.java:202-223): take the first non-null configured
    timestamp field, else the record/batch timestamp."""
    candidates = [F.col(c) for c in ts_field_candidates if c in df.columns]
    if batch_ts is not None:
        candidates.append(batch_ts)
    if not candidates:
        candidates = [F.current_timestamp()]
    return df.withColumn(out, F.coalesce(*candidates))


# --- §1.2b value preprocessing for schema'd payloads -----------------------


def preprocess_value(col: Column, dtype: T.DataType) -> Column:
    """Recursive preprocessing, mirroring DataConverter.preProcessValue
    (DataConverter.java:243-421): Decimal→double; MAP→array<struct<key,
    value>> (non-compact path); ARRAY/STRUCT recurse; everything else
    passes through."""
    if isinstance(dtype, T.DecimalType):
        return col.cast("double")
    if isinstance(dtype, T.ArrayType):
        return F.transform(col, lambda x: preprocess_value(x, dtype.elementType))
    if isinstance(dtype, T.MapType):
        return F.transform(
            F.map_entries(col),
            lambda e: F.struct(
                preprocess_value(e["key"], dtype.keyType).alias("key"),
                preprocess_value(e["value"], dtype.valueType).alias("value"),
            ),
        )
    if isinstance(dtype, T.StructType):
        return F.struct(
            *[
                preprocess_value(col[f.name], f.dataType).alias(f.name)
                for f in dtype.fields
            ]
        )
    return col


def preprocess_payload(
    df: DataFrame, cols: list[str] | None = None, compact_string_maps: bool = True
) -> DataFrame:
    """Apply §1.2b preprocessing to each payload column. String-keyed maps
    stay maps when ``compact_string_maps`` (compact.map.entries=true default,
    OpenSearchSinkConnectorConfig.java:191-202) — they serialize to JSON
    objects naturally; other maps become kv-struct arrays."""
    out = df
    for fld in df.schema.fields:
        if cols is not None and fld.name not in cols:
            continue
        dt = fld.dataType
        if (
            compact_string_maps
            and isinstance(dt, T.MapType)
            and isinstance(dt.keyType, T.StringType)
        ):
            continue
        if isinstance(dt, (T.DecimalType, T.ArrayType, T.MapType, T.StructType)):
            out = out.withColumn(fld.name, preprocess_value(F.col(fld.name), dt))
    return out


def to_json_payload(
    df: DataFrame, payload_cols: list[str], out: str = "payload"
) -> DataFrame:
    """P4: document JSON serialization (DataConverter.java:186-200)."""
    return df.withColumn(out, F.to_json(F.struct(*[F.col(c) for c in payload_cols])))
