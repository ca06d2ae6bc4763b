"""Ingestion-semantics parity tests (reference: DataConverterTest.java,
OpenSearchSinkTaskTest.java — SURVEY.md §5.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401

from kafka_connect_opensearch_spark.config import (
    BehaviorOnMalformedDoc,
    BehaviorOnNullValues,
    EngineConfig,
)
from kafka_connect_opensearch_spark.functions.text import (
    convert_topic_to_data_stream_name,
    convert_topic_to_index_name,
)
from kafka_connect_opensearch_spark.operators.convert import (
    apply_deletes,
    convert_records,
    latest_wins,
    preprocess_payload,
    upsert_documents,
)


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        ("t1", 0, 0, "doc a", 1),
        ("t1", 0, 1, "doc b", 2),
        ("t1", 0, 2, None, 3),        # tombstone
        (None, 0, 3, "doc c", 4),     # malformed (null id col)
        ("t1", 0, 1, "doc b v2", 5),  # replay of (t1,0,1) with higher version
    ]
    return spark.createDataFrame(
        rows, "topic string, part int, offset long, content string, version long"
    )


def _cfg(null_policy, malformed_policy):
    return EngineConfig(
        behavior_on_null_values=null_policy,
        behavior_on_malformed_docs=malformed_policy,
    )


def test_ignore_policies_route_to_dlq(spark, records):
    batch = convert_records(
        records, ("topic", "part", "offset"), "content", version_col="version",
        config=_cfg(BehaviorOnNullValues.IGNORE, BehaviorOnMalformedDoc.IGNORE),
    )
    # a + b (v2 wins over replay); tombstone ignored; malformed → DLQ
    assert batch.documents.count() == 2
    assert batch.deletes.count() == 0
    dlq = batch.dlq.collect()
    assert len(dlq) == 1
    assert "action_request_validation" in dlq[0]["_error"]  # null id class


def test_delete_policy_routes_tombstones(spark, records):
    batch = convert_records(
        records, ("topic", "part", "offset"), "content", version_col="version",
        config=_cfg(BehaviorOnNullValues.DELETE, BehaviorOnMalformedDoc.IGNORE),
    )
    deletes = [r["doc_key"] for r in batch.deletes.collect()]
    assert len(deletes) == 1 and deletes[0].endswith("2")


def test_fail_policy_raises(spark, records):
    # FAIL is checked eagerly at conversion time (the reference throws in
    # put(); a lazy raise_error is legally pruned by Catalyst)
    with pytest.raises(ValueError, match="null value"):
        convert_records(
            records, ("topic", "part", "offset"), "content",
            version_col="version",
            config=_cfg(BehaviorOnNullValues.FAIL, BehaviorOnMalformedDoc.IGNORE),
        )
    with pytest.raises(ValueError, match="malformed"):
        convert_records(
            records, ("topic", "part", "offset"), "content",
            version_col="version",
            config=_cfg(BehaviorOnNullValues.IGNORE, BehaviorOnMalformedDoc.FAIL),
        )


def test_latest_wins_idempotent_replay(spark, records):
    ok = records.filter(F.col("topic").isNotNull() & F.col("content").isNotNull())
    from kafka_connect_opensearch_spark.operators.convert import synthesize_doc_key

    keyed = synthesize_doc_key(ok, ("topic", "part", "offset"))
    deduped = latest_wins(keyed, "doc_key", "version")
    rows = {r["doc_key"]: r["content"] for r in deduped.collect()}
    assert len(rows) == 2
    assert any(v == "doc b v2" for v in rows.values())  # replay won
    # replaying the same batch again changes nothing (exactly-once effect)
    again = latest_wins(keyed.union(keyed), "doc_key", "version")
    assert {r["doc_key"]: r["content"] for r in again.collect()} == rows


def test_apply_deletes_anti_join(spark):
    idx = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "k string, v int")
    dels = spark.createDataFrame([("b",)], "k string")
    left = sorted(r["k"] for r in apply_deletes(idx, dels, "k").collect())
    assert left == ["a", "c"]


def test_upsert_field_level_merge(spark):
    existing = spark.createDataFrame(
        [("k1", "old1", 10), ("k2", "old2", 20)], "k string, name string, qty int"
    )
    updates = spark.createDataFrame(
        [("k2", None, 99), ("k3", "new3", 30)], "k string, name string, qty int"
    )
    out = {r["k"]: (r["name"], r["qty"]) for r in
           upsert_documents(existing, updates, "k").collect()}
    assert out == {
        "k1": ("old1", 10),       # untouched
        "k2": ("old2", 99),       # partial update: null field keeps old value
        "k3": ("new3", 30),       # created
    }


def _ds_cfg(**kw):
    from kafka_connect_opensearch_spark.config import DataStreamType

    return EngineConfig(
        data_stream_type=DataStreamType.LOGS, data_stream_dataset="ds",
        behavior_on_null_values=BehaviorOnNullValues.IGNORE,
        behavior_on_malformed_docs=BehaviorOnMalformedDoc.IGNORE,
        **kw,
    )


def test_data_stream_disables_external_versioning(spark):
    """DataConverterTest.java:480-491: data streams never use external
    versioning, even with key.ignore=false; op type is CREATE."""
    from kafka_connect_opensearch_spark.operators.convert import (
        write_action_columns,
    )

    df = spark.createDataFrame([("a",)], "doc_key string")
    ds = write_action_columns(df, _ds_cfg(key_ignore=False)).collect()[0]
    assert ds["op_type"] == "create"
    assert ds["use_external_versioning"] is False
    plain = write_action_columns(df, EngineConfig(key_ignore=False)).collect()[0]
    assert plain["op_type"] == "index"
    assert plain["use_external_versioning"] is True
    ignored = write_action_columns(df, EngineConfig(key_ignore=True)).collect()[0]
    assert ignored["use_external_versioning"] is False


def test_data_stream_first_wins_on_replay(spark, records):
    """CREATE op + ignored version conflicts ⇒ the FIRST write of an id
    sticks; a replayed higher-version record is a no-op
    (DataConverter.java:175-180, OpenSearchClient.java:91-98)."""
    batch = convert_records(
        records, ("topic", "part", "offset"), "content", version_col="version",
        config=_ds_cfg(),
    )
    docs = {r["doc_key"]: r["content"] for r in batch.documents.collect()}
    assert len(docs) == 2
    assert any(v == "doc b" for v in docs.values())      # first write won
    assert not any(v == "doc b v2" for v in docs.values())
    # data streams inject @timestamp (P5)
    assert "@timestamp" in batch.documents.columns


def test_null_key_tombstone_is_ignored_not_malformed(spark):
    """DataConverter.java:123-135: a tombstone with a null key is silently
    dropped (nothing to delete) — not DLQ'd, not deleted — even under
    DELETE policy."""
    rows = [(None, None), ("k1", None), ("k2", "body")]
    df = spark.createDataFrame(rows, "id string, content string")
    batch = convert_records(
        df, ("id",), "content",
        config=_cfg(BehaviorOnNullValues.DELETE, BehaviorOnMalformedDoc.IGNORE),
    )
    assert batch.dlq.count() == 0
    assert [r["doc_key"] for r in batch.deletes.collect()] == ["k1"]
    assert batch.documents.count() == 1


def test_classify_malformed_all_classes(spark):
    """OpenSearchClientTest.java:387-452 parity: each MALFORMED_DOC_ERRORS
    class is detected; tombstones are exempt; clean records pass."""
    from kafka_connect_opensearch_spark.operators.convert import (
        classify_malformed,
        synthesize_doc_key,
    )

    rows = [
        (None, '{"a": 1}'),          # null id → action_request_validation
        ("k" * 600, '{"a": 1}'),     # oversize id → illegal_argument
        ("id3", "{broken"),          # bad JSON → mapper_parsing
        ("id4", '{"a": 1, "x": 2}'),  # unmapped field → strict_dynamic_mapping
        ("id5", None),               # tombstone → exempt
        ("id6", '{"a": 1, "b": 2}'),  # clean
    ]
    df = synthesize_doc_key(
        spark.createDataFrame(rows, "rid string, payload string"), ("rid",)
    )
    got = [
        r["e"]
        for r in df.select(
            classify_malformed(
                df, ("rid",), "payload",
                payload_col="payload", mapping_fields=("a", "b"),
            ).alias("e")
        ).collect()
    ]
    assert got[0].startswith("action_request_validation_exception")
    assert got[1].startswith("illegal_argument_exception")
    assert got[2].startswith("mapper_parsing_exception")
    assert got[3].startswith("strict_dynamic_mapping_exception")
    assert got[4] is None and got[5] is None


def test_convert_records_with_payload_classification(spark):
    """convert_records quarantines every malformed class to the DLQ with
    its reason; FAIL raises when any class is present."""
    rows = [
        ("id1", '{"a": 1}', "body"),
        ("id2", "{broken", "body"),
    ]
    df = spark.createDataFrame(rows, "rid string, payload string, content string")
    batch = convert_records(
        df, ("rid",), "content",
        config=_cfg(BehaviorOnNullValues.IGNORE, BehaviorOnMalformedDoc.IGNORE),
        payload_col="payload", mapping_fields=("a",),
    )
    assert batch.documents.count() == 1
    dlq = batch.dlq.collect()
    assert len(dlq) == 1 and "mapper_parsing" in dlq[0]["_error"]
    with pytest.raises(ValueError, match="malformed"):
        convert_records(
            df, ("rid",), "content",
            config=_cfg(BehaviorOnNullValues.IGNORE, BehaviorOnMalformedDoc.FAIL),
            payload_col="payload", mapping_fields=("a",),
        )


def test_data_stream_dataset_validation():
    from kafka_connect_opensearch_spark.config import ConfigException

    for bad in ["UPPER", "x" * 101, "has space", "has-dash", "has:colon"]:
        with pytest.raises(ConfigException):
            EngineConfig(data_stream_dataset=bad)
    EngineConfig(data_stream_dataset="valid_dataset.name")


def test_preprocess_decimal_and_map(spark):
    df = spark.createDataFrame(
        [(1, {7: 2}, [1.5])],
        "id int, m map<int,int>, arr array<double>",
    ).withColumn("d", F.lit("12.34").cast("decimal(10,2)"))
    out = preprocess_payload(df)
    schema = dict(
        zip(
            out.columns,
            [f.dataType.simpleString() for f in out.schema.fields],
            strict=True,
        )
    )
    # int-keyed MAP → array<struct<key,value>> (DataConverter.java:292-297)
    assert schema["m"].startswith("array<struct<key:int,value:int")
    # Decimal → double (DataConverter.java:251-252)
    assert schema["d"] == "double"
    row = out.collect()[0]
    assert row["d"] == 12.34
    assert row["m"][0]["key"] == 7 and row["m"][0]["value"] == 2


def test_string_maps_stay_compact(spark):
    df = spark.createDataFrame([({"a": 1},)], "m map<string,int>")
    out = preprocess_payload(df, compact_string_maps=True)
    assert out.schema["m"].dataType.simpleString().startswith("map<string")


def test_topic_to_index_name(spark):
    # edge cases from OpenSearchSinkTaskTest.java:281-369
    cases = [
        ("MyTopic", "mytopic"),
        ("-leading", "leading"),
        ("_leading", "leading"),
        (".", "dot"),
        ("..", "dotdot"),
        ("a" * 300, "a" * 255),
        ("UPPER.case", "upper.case"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "topic string")
    got = [
        r[0]
        for r in df.select(convert_topic_to_index_name("topic")).collect()
    ]
    assert got == [want for _, want in cases]


def test_topic_to_data_stream_name(spark):
    df = spark.createDataFrame([("MyTopic",)], "topic string")
    got = df.select(
        convert_topic_to_data_stream_name("topic", "LOGS", "ds")
    ).collect()[0][0]
    assert got == "logs-ds-mytopic"


def test_topic_to_data_stream_name_truncates_topic_before_prefix(spark):
    # OpenSearchSinkTask.java:231-243: only the TOPIC is cut to 100 chars,
    # before prefixing — the concatenated name is never truncated
    long_topic = "T" * 150
    df = spark.createDataFrame([(long_topic,)], "topic string")
    got = df.select(
        convert_topic_to_data_stream_name("topic", "logs", "dataset")
    ).collect()[0][0]
    assert got == "logs-dataset-" + "t" * 100
    assert len(got) == len("logs-dataset-") + 100
