"""Text-analysis and multimodal plumbing tests."""

from __future__ import annotations

import hashlib

import pytest

from kafka_connect_opensearch_spark.operators import multimodal
from kafka_connect_opensearch_spark.operators import textstats as ts


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat is on the mat and it is happy"),
        (2, "der Hund ist nicht auf der Matte und das ist gut"),
        (3, "le chat est dans la maison et les chiens dans le jardin"),
        (4, "xyzzy qwerty plugh"),                      # no stopwords → und
        (5, ""),                                        # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id(spark, docs):
    out = {r["doc_id"]: r["pred_lang"]
           for r in ts.language_id(docs, "text", "doc_id").collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "und"
    assert out[5] == "und"


def test_token_counts(spark, docs):
    out = {r["doc_id"]: (r["ws_tokens"], r["word_tokens"])
           for r in ts.token_counts(docs, "text", "doc_id").collect()}
    assert out[1] == (10, 10)
    assert out[5] == (0, 0)


def test_quality_score_bounds(spark, docs):
    for r in ts.quality_score(docs, "text", "doc_id").collect():
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["alpha_ratio"] <= 1.0


def test_stopword_hits_text_equals_array_hof(spark):
    """stopword_hits_text (round-4 codegen regex shape) must be a multiset
    count identical to the interpreted-HOF stopword_hits over tokenize():
    repeats, token-boundary punctuation, leading/trailing tokens, words as
    substrings of longer tokens, empty/None text."""
    from pyspark.sql import functions as F

    from kafka_connect_opensearch_spark.functions.analysis import tokenize

    rows = [
        (1, "the the the"),                      # repeats, no separators run
        (2, "The,and.of;to the"),                # punctuation separators
        (3, "and"),                              # whole-string single token
        (4, "band the band theater others"),     # substring false-friends
        (5, ""),                                 # empty
        (6, None),                               # null text
        (7, "  the \t and\nof  "),               # whitespace runs + edges
        (8, "the_and of2 the"),                  # _ and digits keep tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    words = ts.LANG_STOPWORDS["en"]
    out = df.select(
        "doc_id",
        ts.stopword_hits_text(F.col("text"), words).alias("fast"),
        ts.stopword_hits(tokenize(F.col("text")), words).alias("hof"),
    ).collect()
    got = {r["doc_id"]: (r["fast"], r["hof"]) for r in out}
    assert got[1] == (3, 3)
    assert got[2] == (5, 5)
    assert got[3] == (1, 1)
    assert got[4] == (1, 1)   # band/theater don't count despite substrings
    assert got[5] == (0, 0)
    assert got[6] == (None, None)
    assert got[7] == (3, 3)
    assert got[8] == (1, 1)   # the_and / of2 are single non-stopword tokens


def test_language_id_quality_score_are_codegen(spark, docs):
    """Round-4 perf pin: no interpreted array HOF (ArrayFilter is
    CodegenFallback) and no Python eval in either projection's plan."""
    from kafka_connect_opensearch_spark import plans

    for q in (
        ts.language_id(docs, "text", "doc_id"),
        ts.quality_score(docs, "text", "doc_id"),
    ):
        plan = plans.executed_plan(q)
        assert "filter(" not in plan and "lambdafunction" not in plan.lower()
        assert "EvalPython" not in plan
        assert plans.codegen_stage_count(q) >= 1


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma ALPHA beta!"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fingerprint"]
           for r in ts.fingerprint(df, "text", "doc_id").collect()}
    assert out[1] == out[2]   # order/case/punct insensitive
    assert out[1] != out[3]


def test_approx_bpe_token_count(spark):
    from pyspark.sql import functions as F

    from kafka_connect_opensearch_spark.functions.analysis import (
        approx_bpe_token_count,
    )

    df = spark.createDataFrame(
        [("hello world!",), ("internationalization",)], "t string"
    )
    got = [r[0] for r in df.select(approx_bpe_token_count(F.col("t"))).collect()]
    # hello(2) world(2) !(1) = 5 ; 20-char word → ceil(20/4) = 5
    assert got == [5, 5]


def test_media_feature_extraction_stub(spark):
    media = multimodal.synth_media(spark, 9)
    feats = multimodal.extract_image_features(media).collect()
    assert len(feats) == 9
    for r in feats:
        assert r["feat_dim"] == multimodal.STUB_FEATURE_DIM
        assert len(r["feat"]) == multimodal.STUB_FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["feat"])
    # deterministic: same payload → same features
    again = multimodal.extract_image_features(media).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_frame_sampling_cardinality(spark):
    media = multimodal.synth_media(spark, 9)
    frames = multimodal.sample_frames(media, every_ms=1000).collect()
    durations = {r["media_id"]: r["duration_ms"] for r in media.collect()}
    by_media = {}
    for r in frames:
        by_media[r["media_id"]] = max(by_media.get(r["media_id"], 0), r["frame_idx"] + 1)
    for mid, n in by_media.items():
        assert n == max(1, durations[mid] // 1000)
    # frame identity is deterministic
    one = [r for r in frames if r["media_id"] == 2 and r["frame_idx"] == 0][0]
    payload = [r["payload"] for r in media.collect() if r["media_id"] == 2][0]
    assert one["frame_sha"] == hashlib.sha256(
        bytes(payload) + b":0"
    ).hexdigest()


def test_real_decode_raises(spark):
    with pytest.raises(NotImplementedError):
        multimodal._decode_image_real(b"png-bytes")


def test_media_stats_prunes_payload(spark):
    media = multimodal.synth_media(spark, 9)
    out = {r["kind"]: r["n"] for r in multimodal.media_stats(media).collect()}
    assert sum(out.values()) == 9 and set(out) == {"image", "audio", "video"}
