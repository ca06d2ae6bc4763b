"""MaxScore/block-max pruning unit tests (pure numpy — no Spark).

The pruning contract: candidates must be a SUPERSET of the true top-k under
full scoring, for any posting-list mix (the engine rescores candidates
exactly, so correctness == candidate completeness)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_opensearch_spark.operators.bm25 import (
    _exact_scores,
    _maxscore_candidates,
    bm25_idf,
)

K1, B = 1.2, 0.75


def _mk_decoded(rng, n_terms=4, n_docs=5000, stopword_df=4000, rare_df=30):
    """Synthetic segment: mix of stopword-like and rare posting lists."""
    decoded = {}
    weights = {}
    universe = np.arange(n_docs, dtype=np.int64)
    dls = rng.integers(50, 2000, size=n_docs).astype(np.int64)
    for i in range(n_terms):
        df = stopword_df if i % 2 == 0 else rare_df
        ids = np.sort(rng.choice(universe, size=df, replace=False))
        tfs = rng.integers(1, 30 if i % 2 == 0 else 5, size=df).astype(np.int64)
        bmax = np.array(
            [tfs[j : j + 128].max() for j in range(0, df, 128)], dtype=np.int64
        )
        decoded[f"t{i}"] = (ids, tfs, dls[ids], bmax)
        weights[f"t{i}"] = bm25_idf(n_docs, df)
    return decoded, weights


@pytest.mark.parametrize("seed", [1, 7, 42, 99])
@pytest.mark.parametrize("k", [1, 10, 100])
def test_candidates_superset_of_topk(seed, k):
    rng = np.random.default_rng(seed)
    decoded, weights = _mk_decoded(rng)
    avgdl = 1000.0
    # full scoring over the union of all docs
    union = np.unique(np.concatenate([v[0] for v in decoded.values()]))
    full = _exact_scores(union, decoded, weights, avgdl, K1, B)
    order = np.lexsort((union, -full))[:k]
    true_topk = set(union[order].tolist())
    cand = _maxscore_candidates(decoded, weights, avgdl, K1, B, k, 128)
    assert true_topk <= set(cand.tolist())
    # pruning must actually prune in the skewed case (stopword lists big)
    if k <= 10:
        assert cand.size <= union.size


def test_single_term_returns_whole_list():
    rng = np.random.default_rng(0)
    decoded, weights = _mk_decoded(rng, n_terms=1)
    cand = _maxscore_candidates(decoded, weights, 1000.0, K1, B, 10, 128)
    assert np.array_equal(cand, decoded["t0"][0])


def test_exact_scores_sorted_term_order_deterministic():
    rng = np.random.default_rng(3)
    decoded, weights = _mk_decoded(rng, n_terms=3, n_docs=500,
                                   stopword_df=400, rare_df=20)
    docs = decoded["t0"][0][:50]
    a = _exact_scores(docs, decoded, weights, 800.0, K1, B)
    b = _exact_scores(docs, decoded, weights, 800.0, K1, B)
    assert np.array_equal(a, b)  # bit-identical reruns


def test_should_only_exclusion_then_maxscore_exact_and_pruning():
    """Round-4 path: bool query with no must — MaxScore over the should
    union after must_not pre-filtering. Candidates must (a) exclude every
    must_not doc, (b) be a superset of the true post-exclusion top-k, and
    (c) actually prune the stopword-heavy OR union."""
    from kafka_connect_opensearch_spark.operators.bm25 import (
        _exclude_from_lists,
    )

    rng = np.random.default_rng(5)
    decoded, weights = _mk_decoded(rng)
    avgdl = 1000.0
    excl_ids = np.sort(rng.choice(5000, size=1500, replace=False))
    all_decoded = dict(decoded)
    all_decoded["nt"] = (
        excl_ids,
        np.ones_like(excl_ids),
        np.ones_like(excl_ids),
        np.array([1], dtype=np.int64),
    )
    filtered = _exclude_from_lists(decoded, all_decoded, ["nt"], 128)

    union = np.unique(np.concatenate([v[0] for v in decoded.values()]))
    union = union[~np.isin(union, excl_ids)]
    full = _exact_scores(union, decoded, weights, avgdl, K1, B)
    order = np.lexsort((union, -full))[:10]
    true_topk = set(union[order].tolist())

    cand = _maxscore_candidates(filtered, weights, avgdl, K1, B, 10, 128)
    assert not np.isin(cand, excl_ids).any()
    assert true_topk <= set(cand.tolist())
    assert cand.size < union.size  # pruning effective on stopword lists
    # exact scores on the filtered lists match the unfiltered ones for
    # every surviving doc (exclusion only removes rows, never edits them)
    np.testing.assert_array_equal(
        _exact_scores(cand, filtered, weights, avgdl, K1, B),
        _exact_scores(cand, decoded, weights, avgdl, K1, B),
    )


@settings(max_examples=200, deadline=None)
@given(
    n_docs=st.integers(min_value=1, max_value=400),
    n_terms=st.integers(min_value=1, max_value=4),
    frac=st.floats(min_value=0.0, max_value=1.0),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_restrict_exclude_duality(n_docs, n_terms, frac, seed):
    """restrict(allowed) must equal exclude(universe − allowed) on every
    posting list — same survivors, same tf/dl rows, both with valid
    recomputed block-max (= true max of each 128-block)."""
    from kafka_connect_opensearch_spark.operators.bm25 import (
        _exclude_from_lists,
        _restrict_to_lists,
    )

    rng = np.random.default_rng(seed)
    universe = np.arange(n_docs, dtype=np.int64) * 7 + 3
    decoded = {}
    for t in range(n_terms):
        ids = np.sort(rng.choice(universe,
                                 size=rng.integers(1, n_docs + 1),
                                 replace=False))
        tfs = rng.integers(1, 50, size=ids.size)
        dls = rng.integers(10, 500, size=ids.size)
        starts = np.arange(0, ids.size, 128)
        decoded[f"t{t}"] = (ids, tfs, dls,
                            np.maximum.reduceat(tfs, starts))
    allowed = np.sort(rng.choice(
        universe, size=int(round(frac * n_docs)), replace=False
    ).astype(np.int64))
    blocked = np.setdiff1d(universe, allowed)
    if allowed.size == 0:
        restricted = {}
    else:
        restricted = _restrict_to_lists(decoded, allowed, 128)
    nt = {"__not__": (blocked, np.ones_like(blocked),
                      np.ones_like(blocked), np.array([1]))}
    excluded = _exclude_from_lists(decoded, {**decoded, **nt},
                                   ["__not__"], 128)
    assert set(restricted) == set(excluded)
    for t in restricted:
        ri, rt, rd, rb = restricted[t]
        ei, et, ed, eb = excluded[t]
        np.testing.assert_array_equal(ri, ei)
        np.testing.assert_array_equal(rt, et)
        np.testing.assert_array_equal(rd, ed)
        np.testing.assert_array_equal(rb, eb)
        starts = np.arange(0, ri.size, 128)
        np.testing.assert_array_equal(rb, np.maximum.reduceat(rt, starts))
