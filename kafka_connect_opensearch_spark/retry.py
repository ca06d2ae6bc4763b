"""Exponential backoff + jitter retry, semantics-equal to the reference.

Reference: ``RetryUtil.java`` — wait = uniform(0, min(CAP, backoff << attempt))
(RetryUtil.java:93-94, cap 24h at :45); ``callWithRetries`` performs up to
``max_retries + 1`` attempts (RetryUtil.java:139-176). Used here around
segment-commit I/O; Spark task retries (spark.task.maxFailures) cover
infra-level failures inside jobs.
"""

from __future__ import annotations

import logging
import random
import time
from collections.abc import Callable
from typing import TypeVar

log = logging.getLogger(__name__)

T = TypeVar("T")

MAX_RETRY_TIME_MS = 24 * 60 * 60 * 1000  # 24h cap, RetryUtil.java:45


def compute_retry_wait_time_ms(retry_attempts: int, initial_backoff_ms: int) -> int:
    """Deterministic upper bound of the backoff window (RetryUtil.java:58-80)."""
    if initial_backoff_ms < 0:
        return 0
    if retry_attempts <= 0:
        return initial_backoff_ms
    if retry_attempts > 32:
        return MAX_RETRY_TIME_MS
    return min(MAX_RETRY_TIME_MS, initial_backoff_ms << retry_attempts)


def compute_random_retry_wait_time_ms(
    retry_attempts: int, initial_backoff_ms: int, rng: random.Random | None = None
) -> int:
    """Jittered wait: uniform(0, bound) (RetryUtil.java:87-95)."""
    bound = compute_retry_wait_time_ms(retry_attempts, initial_backoff_ms)
    r = rng if rng is not None else random
    return int(r.uniform(0, bound)) if bound > 0 else 0


def call_with_retries(
    description: str,
    fn: Callable[[], T],
    max_retries: int,
    retry_backoff_ms: int,
    retriable: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
) -> T:
    """Run ``fn`` with up to ``max_retries + 1`` attempts (RetryUtil.java:139-176).

    ``sleep`` and ``rng`` are injectable for deterministic tests (the
    reference injects MockTime in RetryUtilTest.java:62-120).
    """
    total_attempts = max_retries + 1
    for attempt in range(total_attempts):
        try:
            return fn()
        except retriable as exc:  # noqa: PERF203 — retry loop by design
            if attempt == total_attempts - 1:
                raise
            wait_ms = compute_random_retry_wait_time_ms(attempt, retry_backoff_ms, rng)
            log.warning(
                "Attempt %d/%d of %s failed (%s); retrying in %d ms",
                attempt + 1, total_attempts, description, exc, wait_ms,
            )
            sleep(wait_ms / 1000.0)
    raise AssertionError("unreachable")
