"""Sequence packing + stratified sampling (training-data layout ops)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_connect_opensearch_spark.functions.analysis import tokenize_py
from kafka_connect_opensearch_spark.operators import packing


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i * 13 + 5, f"tok{i % 7} " * (i % 50))  # some empty docs
            for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_sequence_chunk_spans_match_serial_oracle(spark, docs):
    window = 64
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_off"],
                      r["first_chunk"], r["last_chunk"])
        for r in packing.sequence_chunk_spans(docs, window).collect()
    }
    rows = sorted(
        (r["doc_id"], len(tokenize_py(r["text"]))) for r in docs.collect()
    )
    off = 0
    want = {}
    for d, n in rows:
        if n == 0:
            continue
        want[d] = (n, off, off // window, (off + n - 1) // window)
        off += n
    assert got == want
    # total stream length consistency: next offset after the last doc
    last = max(want)
    assert want[last][1] + want[last][0] == off


def test_sequence_chunks_deterministic_across_partitionings(spark, docs):
    a = packing.sequence_chunk_spans(docs.repartition(17), 64).collect()
    b = packing.sequence_chunk_spans(docs.coalesce(1), 64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sequence_chunks_bucket_count_independent(spark, docs):
    a = packing.sequence_chunk_spans(docs, 64, n_buckets=3).collect()
    b = packing.sequence_chunk_spans(docs, 64, n_buckets=256).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_stratified_sample_deterministic_and_proportional(spark):
    rows = [(i, ["en", "zh", "es", "de"][i % 4]) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    fracs = {"en": 0.5, "zh": 0.25, "es": 0.125}
    got = packing.stratified_sample(df, fracs, stratum_col="lang").collect()
    # determinism under reshuffling
    again = packing.stratified_sample(
        df.repartition(13), fracs, stratum_col="lang"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    by = {}
    for r in got:
        by[r["lang"]] = by.get(r["lang"], 0) + 1
    assert "de" not in by                      # outside the mix → dropped
    for lang, frac in fracs.items():
        n = by.get(lang, 0)
        # 1000 rows per stratum; binomial 4σ band
        sd = np.sqrt(1000 * frac * (1 - frac))
        assert abs(n - 1000 * frac) <= 4 * sd, (lang, n)


def test_sequence_chunks_with_60bit_hash_ids(spark):
    """Bucket assignment must survive hash-sized (60-bit) doc ids — the
    production id shape — without int64 overflow: offsets equal the
    serial oracle and remain contiguous."""
    base = (1 << 59) + 12345
    rows = [(base + i * (1 << 40) + (i % 3), f"w{i % 5} " * (5 + i % 9))
            for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_off"])
        for r in packing.sequence_chunk_spans(docs, 32, n_buckets=7)
        .collect()
    }
    ordered = sorted(
        (r["doc_id"], len(tokenize_py(r["text"]))) for r in docs.collect()
    )
    off = 0
    for d, n in ordered:
        assert got[d] == (n, off), d
        off += n
