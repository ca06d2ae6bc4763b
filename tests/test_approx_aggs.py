"""Approximate aggregation twins (VERDICT r4 #7): the OpenSearch
cardinality/percentiles aggregations are HLL++/t-digest under the hood
precisely because exact per-group distinct/percentile state explodes at
scale. The CONTRACT rows stay on the exact variants (oracle-hashed);
these tests pin the opt-in approximate twins' error bounds against the
exact answers on the same events table, so the 100 TB recipe
(`approx_count_distinct` / `percentile_approx`) is verified, documented
(COVERAGE.md), and ready to swap in.

Bounds pinned here:
- HLL++ with rsd=0.02: relative error ≤ 3·rsd = 6% per group (3σ).
- GK quantile sketch with accuracy=A: rank error ≤ 1/A, so the approx
  p_q must lie within the exact [p_(q-2/A), p_(q+2/A)] envelope.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"
RSD = 0.02
ACCURACY = 1000


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_approx_cardinality_within_hll_bound(spark, events):
    exact = {
        r["event_type"]: r["users"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("users"))
        .collect()
    }
    approx = {
        r["event_type"]: r["users"]
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=RSD).alias("users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        rel = abs(approx[et] - n) / n
        assert rel <= 3 * RSD, (et, approx[et], n, rel)


def test_approx_percentiles_within_rank_envelope(spark, events):
    eps = 2.0 / ACCURACY
    qs = [0.5, 0.95, 0.99]
    lo_qs = [max(q - eps, 0.0) for q in qs]
    hi_qs = [min(q + eps, 1.0) for q in qs]
    rows = (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", [float(q) for q in qs], ACCURACY
            ).alias("approx"),
            F.percentile("value", F.array(*[F.lit(q) for q in lo_qs]))
            .alias("lo"),
            F.percentile("value", F.array(*[F.lit(q) for q in hi_qs]))
            .alias("hi"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        for a, lo, hi in zip(r["approx"], r["lo"], r["hi"], strict=True):
            assert lo <= a <= hi, (r["event_type"], a, lo, hi)
