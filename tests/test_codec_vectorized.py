"""Vectorized grouped codec paths vs the scalar reference implementations."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_opensearch_spark.operators.postings import (
    cumsum_with_resets,
    varint_decode,
    varint_decode_concat,
    varint_encode,
    varint_encode_grouped,
)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**50), min_size=1, max_size=200),
    st.data(),
)
def test_encode_grouped_equals_per_group(vals, data):
    arr = np.array(vals, dtype=np.uint64)
    n_groups = data.draw(st.integers(min_value=1, max_value=len(vals)))
    starts = np.array(
        sorted({0, *data.draw(
            st.lists(st.integers(0, len(vals) - 1), max_size=n_groups)
        )}),
        dtype=np.int64,
    )
    grouped = varint_encode_grouped(arr, starts)
    ends = np.append(starts[1:], arr.size)
    expected = [varint_encode(arr[s:e]) for s, e in zip(starts, ends, strict=True)]
    assert grouped == expected


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**50), min_size=1, max_size=30),
        min_size=1,
        max_size=20,
    )
)
def test_decode_concat_equals_per_row(rows):
    bufs = [varint_encode(np.array(r, dtype=np.uint64)) for r in rows]
    vals, row_of = varint_decode_concat(bufs)
    expected_vals = np.concatenate(
        [np.array(r, dtype=np.uint64) for r in rows]
    )
    expected_rows = np.concatenate(
        [np.full(len(r), i, dtype=np.int64) for i, r in enumerate(rows)]
    )
    assert np.array_equal(vals, expected_vals)
    assert np.array_equal(row_of, expected_rows)
    # and parity with the scalar decoder
    for b, r in zip(bufs, rows, strict=True):
        assert varint_decode(b).tolist() == r


def test_decode_concat_empty():
    vals, rows = varint_decode_concat([])
    assert vals.size == 0 and rows.size == 0


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1,
                 max_size=30),
        min_size=1,
        max_size=20,
    )
)
def test_cumsum_with_resets(runs):
    deltas = np.concatenate([np.array(r, dtype=np.int64) for r in runs])
    starts = np.cumsum([0] + [len(r) for r in runs[:-1]]).astype(np.int64)
    got = cumsum_with_resets(deltas, starts)
    expected = np.concatenate([np.cumsum(r) for r in runs])
    assert np.array_equal(got, expected)
