"""Mapping translation (MappingTest.java parity) + full-pipeline ingest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_opensearch_spark.config import (
    BehaviorOnMalformedDoc,
    BehaviorOnNullValues,
    EngineConfig,
)
from kafka_connect_opensearch_spark.functions.mapping import (
    KEYWORD_IGNORE_ABOVE,
    MappingError,
    infer_schema_of_json,
    opensearch_mapping,
)
from kafka_connect_opensearch_spark.operators.bm25 import IndexReader
from kafka_connect_opensearch_spark.operators.convert import add_timestamp
from kafka_connect_opensearch_spark.pipeline import ingest


def test_null_schema_fails():
    # MappingTest.java:44-48
    with pytest.raises(MappingError, match="null"):
        opensearch_mapping(None)


def test_string_maps_to_text_keyword():
    # MappingTest.java:57-70
    m = opensearch_mapping(T.StructType([T.StructField("s", T.StringType())]))
    f = m["properties"]["s"]
    assert f["type"] == "text"
    assert f["fields"]["keyword"] == {
        "type": "keyword",
        "ignore_above": KEYWORD_IGNORE_ABOVE,
    }


def test_primitive_types_and_defaults():
    # Mapping.java:226-249 type table; null_value defaults :170-202
    schema = T.StructType(
        [
            T.StructField("b", T.BooleanType()),
            T.StructField("i8", T.ByteType()),
            T.StructField("i16", T.ShortType()),
            T.StructField("i32", T.IntegerType(), metadata={"default": 42}),
            T.StructField("i64", T.LongType()),
            T.StructField("f32", T.FloatType()),
            T.StructField("f64", T.DoubleType()),
            T.StructField("bin", T.BinaryType()),
            T.StructField("d", T.DecimalType(10, 2)),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    p = opensearch_mapping(schema)["properties"]
    assert [p[k]["type"] for k in ("b", "i8", "i16", "i32", "i64", "f32",
                                   "f64", "bin", "d", "ts")] == [
        "boolean", "byte", "short", "integer", "long", "float", "double",
        "binary", "double", "date",
    ]
    assert p["i32"]["null_value"] == 42


def test_no_default_for_strings():
    # MappingTest.java:114-124
    schema = T.StructType(
        [T.StructField("s", T.StringType(), metadata={"default": "x"})]
    )
    with pytest.raises(MappingError, match="text"):
        opensearch_mapping(schema)


def test_nested_array_map_struct():
    # MappingTest.java:51-54,126-149
    schema = T.StructType(
        [
            T.StructField("arr", T.ArrayType(T.IntegerType())),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
            T.StructField(
                "st", T.StructType([T.StructField("inner", T.DoubleType())])
            ),
        ]
    )
    p = opensearch_mapping(schema)["properties"]
    assert p["arr"]["type"] == "integer"          # arrays are implicit
    assert p["m"]["properties"]["key"]["type"] == "text"
    assert p["m"]["properties"]["value"]["type"] == "long"
    assert p["st"]["properties"]["inner"]["type"] == "double"


def test_dynamic_mapping_inference(spark):
    # schema.ignore=true path (D8)
    df = spark.createDataFrame(
        [('{"a": 1, "b": "x"}',), ('{"a": 2, "b": "y", "c": 1.5}',)],
        "payload string",
    )
    schema = infer_schema_of_json(spark, df, "payload")
    kinds = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert kinds == {"a": "bigint", "b": "string", "c": "double"}


def test_add_timestamp_first_matching_field(spark):
    df = spark.createDataFrame(
        [(None, "2024-01-02", "x"), ("2024-05-05", "2024-01-03", "y")],
        "evt_ts string, created string, v string",
    ).select(
        F.col("evt_ts").cast("timestamp"),
        F.col("created").cast("timestamp"),
        "v",
    )
    out = add_timestamp(df, ("evt_ts", "created"))
    rows = {r["v"]: str(r["@timestamp"])[:10] for r in out.collect()}
    assert rows == {"x": "2024-01-02", "y": "2024-05-05"}


def test_pipeline_ingest_payload_mapping_validation(spark, tmp_path):
    """The ingest() path grades the serialized payload against the mapping:
    a record whose JSON body carries an unmapped field is DLQ'd
    (strict_dynamic_mapping), not silently indexed — ADVICE r2 medium."""
    rows = [("r", "a.py", "c1", 1, None), ("r", "b.py", "c1", 2, 5)]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, a int, zzz int"
    )
    cfg = EngineConfig(
        num_segments=1, salt_partitions=2,
        behavior_on_null_values=BehaviorOnNullValues.IGNORE,
        behavior_on_malformed_docs=BehaviorOnMalformedDoc.IGNORE,
    )
    d = str(tmp_path / "idx")
    res = ingest(
        spark, src, d, cfg, payload_cols=["a", "zzz"], mapping_fields=("a",)
    )
    # to_json omits null fields: row a → {"a":1} (mapped), row b →
    # {"a":2,"zzz":5} (unmapped field zzz) → DLQ
    assert res.metrics.docs_indexed == 1
    assert res.dlq_rows == 1


def test_pipeline_ingest_schema_payload(spark, tmp_path):
    """DataConverter.convertRecord end-to-end (DataConverter.java:116-200):
    a schema'd payload goes preprocess (Decimal→double, MAP→kv-structs) →
    to_json → indexed; the JSON tokens are then searchable."""
    rows = [("r", "a.py", "c1", 1, {3: 4}), ("r", "b.py", "c1", 2, {5: 6})]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, n int, m map<int,int>"
    ).withColumn("price", (F.col("n") * 1.5).cast("decimal(10,2)"))
    cfg = EngineConfig(
        num_segments=1, salt_partitions=2,
        behavior_on_null_values=BehaviorOnNullValues.IGNORE,
        behavior_on_malformed_docs=BehaviorOnMalformedDoc.IGNORE,
    )
    d = str(tmp_path / "idx")
    res = ingest(spark, src, d, cfg, payload_cols=["n", "m", "price"])
    assert res.metrics.docs_indexed == 2
    reader = IndexReader(spark, d)
    # JSON body text: {"n":1,"m":[{"key":3,"value":4}],"price":1.5}
    assert reader.match_count("price") == 2     # field names tokenized
    assert reader.match_count("key") == 2       # int-keyed map → kv structs


def test_full_pipeline_ingest(spark, tmp_path):
    """put-path end-to-end: policies, DLQ, dedup, index, tombstone delete."""
    rows = [
        ("r", "a.py", "c1", "py", "alpha beta", 1),
        ("r", "b.py", "c1", "py", "beta gamma", 1),
        ("r", "b.py", "c1", "py", "beta gamma v2", 2),   # replay, higher version
        ("r", "c.py", "c1", "py", "delta", 1),
        ("r", "c.py", "c1", "py", None, 2),              # tombstone → delete c
        (None, "d.py", "c1", "py", "omega", 1),          # malformed → DLQ
    ]
    src = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, version long",
    )
    cfg = EngineConfig(
        num_segments=2,
        salt_partitions=2,
        behavior_on_null_values=BehaviorOnNullValues.DELETE,
        behavior_on_malformed_docs=BehaviorOnMalformedDoc.IGNORE,
    )
    d = str(tmp_path / "idx")
    res = ingest(spark, src, d, cfg, version_col="version")
    assert res.dlq_rows == 1
    assert res.deletes_applied == 1
    reader = IndexReader(spark, d)
    assert reader.doc_count() == 2                  # a + b; c deleted
    assert reader.match_count("v2") == 1            # replay won
    assert reader.match_count("beta") == 2
    assert reader.match_count("delta") == 0         # tombstoned
    assert reader.match_count("omega") == 0         # malformed never indexed
