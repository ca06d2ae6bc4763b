"""Native search_topk must be bit-identical to the DataFrame search path."""

from __future__ import annotations

import pytest

from kafka_connect_opensearch_spark.config import EngineConfig
from kafka_connect_opensearch_spark.operators.bm25 import IndexReader
from kafka_connect_opensearch_spark.operators.indexer import build_index_bulk
from kafka_connect_opensearch_spark.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("native"))
    build_index_bulk(
        spark, generate_corpus(spark, 200), d,
        EngineConfig(num_segments=3, salt_partitions=2, shuffle_partitions=4),
    )
    return IndexReader(spark, d)


@pytest.mark.parametrize(
    "q,mode",
    [("ident_1 return", "or"), ("return import", "and"), ("ident_7", "or"),
     ("nosuchtoken_zz", "or")],
)
def test_native_equals_dataframe(spark, reader, q, mode):
    native = reader.search_topk(q, k=10, mode=mode)
    df = [(r["doc_id"], r["score"])
          for r in reader.search(q, k=10, mode=mode).collect()]
    assert native == df  # bit-identical scores, identical order
