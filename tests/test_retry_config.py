"""Retry + config invariants (reference parity: RetryUtilTest.java,
ValidatorTest.java, OpenSearchSinkConnectorConfigTest.java)."""

from __future__ import annotations

import random

import pytest

from kafka_connect_opensearch_spark.config import ConfigException, EngineConfig
from kafka_connect_opensearch_spark.retry import (
    MAX_RETRY_TIME_MS,
    call_with_retries,
    compute_random_retry_wait_time_ms,
    compute_retry_wait_time_ms,
)


def test_backoff_doubles():
    # RetryUtilTest.java:62-69 — 100 → 3200 over attempts 0..5
    assert [compute_retry_wait_time_ms(a, 100) for a in range(6)] == [
        100, 200, 400, 800, 1600, 3200,
    ]


def test_backoff_cap_and_negatives():
    assert compute_retry_wait_time_ms(64, 100) == MAX_RETRY_TIME_MS
    assert compute_retry_wait_time_ms(3, -5) == 0
    assert compute_retry_wait_time_ms(0, 100) == 100


def test_jitter_in_range():
    # RetryUtilTest.java:107-120 — jittered wait in [0, bound]
    rng = random.Random(42)
    for attempt in range(8):
        bound = compute_retry_wait_time_ms(attempt, 100)
        for _ in range(20):
            w = compute_random_retry_wait_time_ms(attempt, 100, rng)
            assert 0 <= w <= bound


def test_call_with_retries_success_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    slept = []
    out = call_with_retries(
        "flaky", flaky, max_retries=5, retry_backoff_ms=10,
        sleep=slept.append, rng=random.Random(1),
    )
    assert out == "ok" and calls["n"] == 3 and len(slept) == 2


def test_call_with_retries_exhaustion():
    def always():
        raise OSError("down")

    with pytest.raises(OSError):
        call_with_retries(
            "always", always, max_retries=2, retry_backoff_ms=1,
            sleep=lambda s: None,
        )


def test_config_defaults_match_reference_envelope():
    c = EngineConfig()
    assert (c.batch_size, c.bulk_size_bytes, c.max_in_flight_requests) == (
        2000, 5 * 1024 * 1024, 5,
    )
    assert (c.max_buffered_records, c.linger_ms, c.flush_timeout_ms) == (
        20000, 1, 180_000,
    )
    assert (c.max_retries, c.retry_backoff_ms) == (5, 100)
    assert (c.k1, c.b) == (1.2, 0.75)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"linger_ms": 200_000},                      # linger > flush timeout
        {"max_buffered_records": 100},               # < batch*inflight
        {"connection_username": "u"},                # creds one-sided
        {"batch_size": 0},
        {"num_segments": 0},
        {"b": 1.5},
    ],
)
def test_config_invariants_rejected(kwargs):
    with pytest.raises(ConfigException):
        EngineConfig(**kwargs)
