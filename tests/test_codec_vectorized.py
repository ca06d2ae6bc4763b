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


# --- positional pack → decode → match property (no Spark: pure Arrow/numpy)

import pandas as _pd
import pyarrow as _pa

from kafka_connect_opensearch_spark.operators import positions as _P

_TOKENS = ["a", "b", "c", "d"]


def _brute_phrase(doc_toks: dict[int, list[str]], phrase: list[str]):
    out = {}
    for d, toks in doc_toks.items():
        n = sum(
            1
            for i in range(len(toks) - len(phrase) + 1)
            if toks[i:i + len(phrase)] == phrase
        )
        if n:
            out[d] = n
    return out


@settings(max_examples=200, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    phrase=st.lists(st.sampled_from(_TOKENS), min_size=1, max_size=3),
)
def test_positions_pack_decode_phrase_property(docs, phrase):
    """Random corpora: Arrow pack → varint store rows → keyed decode →
    phrase intersection must equal the brute-force adjacency count —
    including repeated terms, empty docs, and absent phrase terms."""
    doc_toks = {i + 1: t for i, t in enumerate(docs)}
    ids = _pa.array(sorted(doc_toks), type=_pa.int64())
    toks = _pa.array([doc_toks[d] for d in sorted(doc_toks)],
                     type=_pa.list_(_pa.string()))
    out = _P._pack_group_arrow(ids, toks)
    if out is None:  # all docs empty
        assert not any(doc_toks.values())
        return
    pdf = _pd.DataFrame(
        {
            "term": out[0].to_pylist(),
            "seg": "s0",
            "part": 0,
            "n_docs": out[1].to_pylist(),
            "doc_ids": out[2].to_pylist(),
            "pos_counts": out[3].to_pylist(),
            "positions": out[4].to_pylist(),
        }
    )
    keyed, lookup, m = _P._decode_keyed(
        pdf, required_all=sorted(set(phrase))
    )
    got_df = _P._phrase_occ_keyed(keyed, lookup, m, phrase)
    got = dict(zip(got_df["doc_id"], got_df["tf"], strict=True))
    assert got == _brute_phrase(doc_toks, phrase)


@settings(max_examples=200, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    slop=st.integers(min_value=0, max_value=4),
    ordered=st.booleans(),
)
def test_positions_near_property(docs, slop, ordered):
    """Random corpora: NEAR (and ordered/span_near) over the packed store
    equals the brute-force min-distance definition."""
    a_t, b_t = "a", "b"
    doc_toks = {i + 1: t for i, t in enumerate(docs)}
    ids = _pa.array(sorted(doc_toks), type=_pa.int64())
    toks = _pa.array([doc_toks[d] for d in sorted(doc_toks)],
                     type=_pa.list_(_pa.string()))
    out = _P._pack_group_arrow(ids, toks)
    if out is None:
        return
    pdf = _pd.DataFrame(
        {
            "term": out[0].to_pylist(),
            "seg": "s0",
            "part": 0,
            "n_docs": out[1].to_pylist(),
            "doc_ids": out[2].to_pylist(),
            "pos_counts": out[3].to_pylist(),
            "positions": out[4].to_pylist(),
        }
    )
    keyed, lookup, m = _P._decode_keyed(pdf, required_all=[a_t, b_t])
    got = sorted(
        _P._near_docs_keyed(keyed, lookup, m, a_t, b_t, slop, ordered)
    )
    want = []
    for d, tok in doc_toks.items():
        pa_ = [i for i, t in enumerate(tok) if t == a_t]
        pb_ = [i for i, t in enumerate(tok) if t == b_t]
        hit = any(
            (pb - pa <= slop if ordered and pb > pa
             else (not ordered and abs(pa - pb) <= slop))
            for pa in pa_
            for pb in pb_
        )
        if hit:
            want.append(d)
    assert got == sorted(want)


@settings(max_examples=150, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    slop=st.integers(min_value=0, max_value=4),
    ordered=st.booleans(),
)
def test_positions_near_same_term_property(docs, slop, ordered):
    """term_a == term_b: a span may not match itself — a doc qualifies iff
    it has two DISTINCT occurrences within slop (consecutive gap suffices:
    the nearest distinct pair is always adjacent in position order)."""
    a_t = "a"
    doc_toks = {i + 1: t for i, t in enumerate(docs)}
    ids = _pa.array(sorted(doc_toks), type=_pa.int64())
    toks = _pa.array([doc_toks[d] for d in sorted(doc_toks)],
                     type=_pa.list_(_pa.string()))
    out = _P._pack_group_arrow(ids, toks)
    if out is None:
        return
    pdf = _pd.DataFrame(
        {
            "term": out[0].to_pylist(),
            "seg": "s0",
            "part": 0,
            "n_docs": out[1].to_pylist(),
            "doc_ids": out[2].to_pylist(),
            "pos_counts": out[3].to_pylist(),
            "positions": out[4].to_pylist(),
        }
    )
    keyed, lookup, m = _P._decode_keyed(pdf, required_all=[a_t])
    got = sorted(
        _P._near_docs_keyed(keyed, lookup, m, a_t, a_t, slop, ordered)
    )
    want = []
    for d, tok in doc_toks.items():
        pa_ = [i for i, t in enumerate(tok) if t == a_t]
        if any(q - p <= slop for p, q in zip(pa_, pa_[1:], strict=False)):
            want.append(d)
    assert got == sorted(want)


@settings(max_examples=150, deadline=None)
@given(
    g1=st.lists(st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=10),
                min_size=1, max_size=5),
    g2=st.lists(st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=10),
                min_size=0, max_size=5),
    req_all=st.lists(st.sampled_from(_TOKENS), max_size=2),
    req_any=st.lists(st.sampled_from(_TOKENS), max_size=2),
    phrase=st.lists(st.sampled_from(_TOKENS), min_size=1, max_size=3),
)
def test_keyed_from_parts_equals_decode_keyed(g1, g2, req_all, req_any,
                                              phrase):
    """The hot-term-cache assembly (_rows_to_parts → _keyed_from_parts)
    must be semantically identical to _decode_keyed on random multi-group
    corpora with random required_all/required_any filters: same per-term
    (doc, pos) sets after filtering, same phrase results."""
    import numpy as _np

    rows_parts = []
    docbase = 1
    for gi, docs in enumerate((g1, g2)):
        if not docs:
            continue
        doc_toks = {docbase + i: t for i, t in enumerate(docs)}
        docbase += len(docs) + 7
        ids = _pa.array(sorted(doc_toks), type=_pa.int64())
        toks = _pa.array([doc_toks[d] for d in sorted(doc_toks)],
                         type=_pa.list_(_pa.string()))
        out = _P._pack_group_arrow(ids, toks)
        if out is None:
            continue
        rows_parts.append(_pd.DataFrame(
            {
                "term": out[0].to_pylist(),
                "seg": f"s{gi}",
                "part": gi,
                "n_docs": out[1].to_pylist(),
                "doc_ids": out[2].to_pylist(),
                "pos_counts": out[3].to_pylist(),
                "positions": out[4].to_pylist(),
            }
        ))
    if not rows_parts:
        return
    pdf = _pd.concat(rows_parts, ignore_index=True)
    kw = {
        "required_all": sorted(set(req_all)) or None,
        "required_any": sorted(set(req_any)) or None,
    }
    ka, la, Ma = _P._decode_keyed(pdf, _P._group_codes(pdf), **kw)

    gids = {}
    parts = {}
    for t in sorted(set(pdf["term"])):
        sub = pdf[pdf["term"] == t]
        codes = _np.empty(len(sub), dtype=_np.int64)
        for i, (s, p) in enumerate(zip(sub["seg"], sub["part"],
                                       strict=True)):
            codes[i] = gids.setdefault((s, int(p)), len(gids))
        parts[t] = _P._rows_to_parts(sub, codes)
    kb, lb, Mb = _P._keyed_from_parts(parts, **kw)

    def sem(keyed, lookup, M):
        return {
            t: sorted(
                (int(lookup[k // M]), int(k % M)) for k in keyed[t]
            )
            for t in keyed if keyed[t].size
        }
    assert sem(ka, la, Ma) == sem(kb, lb, Mb)
    pa_df = _P._phrase_occ_keyed(ka, la, Ma, phrase)
    pb_df = _P._phrase_occ_keyed(kb, lb, Mb, phrase)
    assert sorted(zip(pa_df["doc_id"], pa_df["tf"], strict=True)) == sorted(
        zip(pb_df["doc_id"], pb_df["tf"], strict=True)
    )


def _keyed_sem(keyed, lookup, m):
    out = set()
    for t, keys in keyed.items():
        for k in keys.tolist():
            out.add((t, int(lookup[k // m]), k % m))
    return out


@settings(max_examples=60, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=10),
        min_size=1,
        max_size=40,
    ),
    req=st.lists(st.sampled_from(_TOKENS), min_size=1, max_size=3,
                 unique=True),
)
def test_skip_prune_parity_property(docs, req):
    """Round-5 block-skip layout (VERDICT r4 #2): pruning a packed frame
    to candidate blocks via the stored (blk_max_doc, blk_lens) skip data
    must be semantically invisible — the keyed decode over the pruned
    frame equals the decode over the full frame for any required_all
    set, any corpus, any block tiling (block size forced tiny so runs,
    gaps, and rebased first-deltas all occur)."""
    orig = _P._SKIP_BLOCK
    _P._SKIP_BLOCK = 3
    try:
        doc_toks = {i * 7 + 1: t for i, t in enumerate(docs)}
        ids = _pa.array(sorted(doc_toks), type=_pa.int64())
        toks = _pa.array([doc_toks[d] for d in sorted(doc_toks)],
                         type=_pa.list_(_pa.string()))
        out = _P._pack_group_arrow(ids, toks)
        if out is None:
            return
        pdf = _pd.DataFrame(
            {
                "term": out[0].to_pylist(),
                "seg": "s0",
                "part": 0,
                "n_docs": out[1].to_pylist(),
                "doc_ids": out[2].to_pylist(),
                "pos_counts": out[3].to_pylist(),
                "positions": out[4].to_pylist(),
                "blk_max_doc": out[5].to_pylist(),
                "blk_lens": out[6].to_pylist(),
            }
        )
        req_s = sorted(req)
        with_skip = _P._decode_keyed(pdf, required_all=req_s)
        without = _P._decode_keyed(
            pdf.drop(columns=["blk_max_doc", "blk_lens"]),
            required_all=req_s,
        )
        assert _keyed_sem(*with_skip) == _keyed_sem(*without)
    finally:
        _P._SKIP_BLOCK = orig


def test_skip_prune_actually_prunes_and_rebases():
    """Constructed case: a rare term restricted to one far block must cut
    the hot term's frame to candidate runs (strictly fewer entries), with
    doc ids intact across the rebased run boundary."""
    orig = _P._SKIP_BLOCK
    _P._SKIP_BLOCK = 4
    try:
        n = 40
        doc_toks = {}
        for i in range(n):
            d = i * 3 + 2
            doc_toks[d] = ["hot", "filler"]
        rare_doc = (n - 3) * 3 + 2
        doc_toks[rare_doc] = ["hot", "rare"]
        ids = _pa.array(sorted(doc_toks), type=_pa.int64())
        toks = _pa.array([doc_toks[d] for d in sorted(doc_toks)],
                         type=_pa.list_(_pa.string()))
        out = _P._pack_group_arrow(ids, toks)
        pdf = _pd.DataFrame(
            {
                "term": out[0].to_pylist(),
                "seg": "s0",
                "part": 0,
                "n_docs": out[1].to_pylist(),
                "doc_ids": out[2].to_pylist(),
                "pos_counts": out[3].to_pylist(),
                "positions": out[4].to_pylist(),
                "blk_max_doc": out[5].to_pylist(),
                "blk_lens": out[6].to_pylist(),
            }
        )
        pruned = _P._skip_prune_rows(pdf, ["rare", "hot"])
        hot_entries = int(
            pruned[pruned["term"] == "hot"]["n_docs"].sum()
        )
        assert hot_entries <= _P._SKIP_BLOCK          # one candidate block
        assert hot_entries < n                        # strictly pruned
        keyed, lookup, m = _P._decode_keyed(pdf, required_all=["rare",
                                                               "hot"])
        sem = _keyed_sem(keyed, lookup, m)
        assert {d for _, d, _ in sem} == {rare_doc}   # only the candidate
        got = _P._phrase_occ_keyed(keyed, lookup, m, ["hot", "rare"])
        assert list(got["doc_id"]) == [rare_doc]
    finally:
        _P._SKIP_BLOCK = orig


def test_slots_of_pow2_equals_division():
    """The bitshift specialization must equal plain floor division for
    pow2 and fall back exactly for non-pow2 M."""
    import numpy as np

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 55, size=5000).astype(np.int64)
    for m in (1 << 21, 1 << 10, 2, 1000, 12345, 3):
        assert np.array_equal(_P._slots_of(keys, m), keys // m), m
