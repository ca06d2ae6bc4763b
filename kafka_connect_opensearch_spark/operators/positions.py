"""Positional index: per-(term, doc) token positions for TRUE phrase /
proximity queries at the index level (no source-table rescan).

Additive subsystem beside the frequency postings (postings.py): Lucene
stores positions in the same postings files; here they are a separate
parquet store so frequency-only queries never pay for them (column/file
separation instead of Lucene's per-field flags).

Storage rows — ``positions.parquet``, term-sorted within partitions so a
query's ``term IN (...)`` prunes row groups:

    term string, n_docs long,
    doc_ids binary     -- delta varints, reset per row
    pos_counts binary  -- varint positions-per-doc, aligned with doc_ids
    positions binary   -- delta varints, reset at each doc boundary

One row per (shuffle partition, term): the doc-hash repartition makes
rows doc-disjoint, so queries just decode every row of a term (≤ one per
partition — the same union-of-segments shape as the postings read path).
The pack is mapInArrow: tokens stay Arrow ListArrays, the only per-term
Python is byte-slicing.

Scale: the positions store is ~Σ dl varints ≈ the tokenized corpus size;
build is one scan + one doc-hash shuffle + one term shuffle; phrase
queries read only the query terms' rows (pushdown pinned in tests).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_opensearch_spark.config import EngineConfig
from kafka_connect_opensearch_spark.functions.analysis import tokenize, tokenize_py
from kafka_connect_opensearch_spark.operators import postings as codec
from kafka_connect_opensearch_spark.operators.indexer import prepare_identity

POSITIONS_SCHEMA = (
    "term string, n_docs long, doc_ids binary, pos_counts binary, "
    "positions binary"
)


def _pack_positions(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        if batch.num_rows == 0:
            continue
        tok_col = batch.column(1)
        flat = tok_col.flatten()  # slice-safe (offsets may not start at 0)
        if len(flat) == 0:
            continue
        offsets = tok_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        counts = np.diff(offsets)
        doc_ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_rep = np.repeat(doc_ids, counts)
        # position of each occurrence within its doc
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offsets[:-1], counts
        )
        dic = flat.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        terms = dic.dictionary.to_pylist()
        # stable sort: (term, doc) groups keep original (ascending) pos order
        order = np.lexsort((doc_rep, codes))
        codes_s, docs_s, pos_s = codes[order], doc_rep[order], pos[order]

        term_change = np.empty(codes_s.size, dtype=bool)
        term_change[0] = True
        np.not_equal(codes_s[1:], codes_s[:-1], out=term_change[1:])
        doc_change = term_change.copy()
        np.logical_or(
            doc_change[1:], docs_s[1:] != docs_s[:-1], out=doc_change[1:]
        )
        term_starts = np.nonzero(term_change)[0]
        doc_starts = np.nonzero(doc_change)[0]

        # per-doc position deltas (reset at each doc boundary)
        pos_deltas = pos_s.copy()
        pos_deltas[1:] -= pos_s[:-1]
        pos_deltas[doc_starts] = pos_s[doc_starts]
        pos_bufs = codec.varint_encode_grouped(pos_deltas, term_starts)

        # per-term doc lists (docs are sorted within a term by the lexsort)
        first_docs = docs_s[doc_starts]
        # per-doc occurrence counts, grouped by term
        doc_ends = np.append(doc_starts[1:], codes_s.size)
        occ_counts = doc_ends - doc_starts
        term_of_doc = np.searchsorted(term_starts, doc_starts, side="right") - 1
        tstart_of_doc = np.nonzero(
            np.concatenate(
                ([True], term_of_doc[1:] != term_of_doc[:-1])
            )
        )[0]
        doc_deltas = first_docs.copy()
        doc_deltas[1:] -= first_docs[:-1]
        doc_deltas[tstart_of_doc] = first_docs[tstart_of_doc]
        docid_bufs = codec.varint_encode_grouped(doc_deltas, tstart_of_doc)
        count_bufs = codec.varint_encode_grouped(occ_counts, tstart_of_doc)
        n_docs_per_term = np.diff(np.append(tstart_of_doc, first_docs.size))

        yield pa.RecordBatch.from_arrays(
            [
                pa.array([terms[codes_s[i]] for i in term_starts],
                         type=pa.string()),
                pa.array(n_docs_per_term, type=pa.int64()),
                pa.array(docid_bufs, type=pa.binary()),
                pa.array(count_bufs, type=pa.binary()),
                pa.array(pos_bufs, type=pa.binary()),
            ],
            names=["term", "n_docs", "doc_ids", "pos_counts", "positions"],
        )


def build_positions(
    spark: SparkSession,
    source: DataFrame,
    out_dir: str,
    config: EngineConfig | None = None,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    content_col: str = "content",
    doc_id_col: str | None = None,
) -> None:
    """One scan → doc-hash spread → Arrow pack → term shuffle → sorted
    write. Same pipeline shape as the frequency-postings bulk build."""
    config = config or EngineConfig()
    docs = prepare_identity(source, id_cols, content_col, doc_id_col)
    analyzed = docs.repartition(config.shuffle_partitions, "doc_id").select(
        "doc_id", tokenize(content_col).alias("tokens")
    )
    packed = analyzed.mapInArrow(_pack_positions, schema=POSITIONS_SCHEMA)
    (
        packed.repartition(max(2, config.shuffle_partitions), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def _decode_term_rows(pdf) -> dict[int, np.ndarray]:
    """Rows of ONE term → {doc_id: ascending positions array}."""
    out: dict[int, np.ndarray] = {}
    for _, row in pdf.iterrows():
        docs = np.cumsum(codec.varint_decode(row["doc_ids"]).astype(np.int64))
        cnts = codec.varint_decode(row["pos_counts"]).astype(np.int64)
        pos_deltas = codec.varint_decode(row["positions"]).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        pos = codec.cumsum_with_resets(pos_deltas, starts)
        for d, s, c in zip(docs, starts, cnts, strict=True):
            out[int(d)] = pos[s : s + c]
    return out


def phrase_occurrences(
    positions_dir: str, phrase: str
) -> dict[int, int]:
    """doc_id → number of phrase occurrences (consecutive-position chains;
    overlapping occurrences count, matching the SQL chain-join oracle)."""
    import pyarrow.dataset as pads

    terms = tokenize_py(phrase)
    if not terms:
        return {}
    dset = pads.dataset(positions_dir, format="parquet")
    tbl = dset.to_table(filter=pads.field("term").isin(sorted(set(terms))))
    pdf = tbl.to_pandas()
    per_term = {
        t: _decode_term_rows(pdf[pdf["term"] == t]) for t in set(terms)
    }
    if any(not per_term[t] for t in terms):
        return {}
    cand = set(per_term[terms[0]])
    for t in terms[1:]:
        cand &= set(per_term[t])
    out: dict[int, int] = {}
    for d in cand:
        live = per_term[terms[0]][d]
        for t in terms[1:]:
            live = np.intersect1d(live + 1, per_term[t][d],
                                  assume_unique=True)
            if live.size == 0:
                break
        if live.size:
            out[int(d)] = int(live.size)
    return out


def phrase_score_topk(
    spark: SparkSession,
    positions_dir: str,
    reader,
    phrase: str,
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Phrase-BM25 ranking: the phrase acts as one synthetic term whose
    per-doc tf is its occurrence count and whose df is the count of
    matching docs; dl/avgdl/N come from the segment store's stats. The
    positional store supplies tf without touching source text; dl for the
    (small) candidate set is a keyed lookup against the index's docs
    table."""
    from kafka_connect_opensearch_spark.operators.bm25 import (
        bm25_idf,
        bm25_tf_weight,
    )

    occ = phrase_occurrences(positions_dir, phrase)
    if not occ:
        return spark.createDataFrame([], "doc_id long, score double")
    n_docs, avgdl = reader._stats  # noqa: SLF001
    df = len(occ)
    idf = bm25_idf(n_docs, df)
    cand = sorted(occ)
    dl_rows = (
        reader.docs()
        .filter(F.col("doc_id").isin(cand))
        .select("doc_id", "dl")
        .collect()
    )
    dl = {r["doc_id"]: r["dl"] for r in dl_rows}
    scored = []
    for d in cand:
        w = idf * float(
            bm25_tf_weight(
                np.array([float(occ[d])]), np.array([float(dl[d])]),
                avgdl, reader.k1, reader.b,
            )[0]
        )
        scored.append((d, round(w, round_to)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    import pandas as pd

    pdf = pd.DataFrame(scored[:k], columns=["doc_id", "score"]).astype(
        {"doc_id": "int64", "score": "float64"}
    )
    return spark.createDataFrame(pdf, "doc_id long, score double")


def near_match_docs(
    spark: SparkSession,
    positions_dir: str,
    term_a: str,
    term_b: str,
    slop: int = 3,
) -> DataFrame:
    """Proximity (NEAR) query: docs where ``term_a`` and ``term_b`` occur
    within ``slop`` token positions of each other. Same read shape as
    phrase matching: only the two terms' rows are decoded."""
    import pyarrow.dataset as pads

    dset = pads.dataset(positions_dir, format="parquet")
    tbl = dset.to_table(
        filter=pads.field("term").isin(sorted({term_a, term_b}))
    )
    pdf = tbl.to_pandas()
    pa_pos = _decode_term_rows(pdf[pdf["term"] == term_a])
    pb_pos = _decode_term_rows(pdf[pdf["term"] == term_b])
    hits = []
    for d in set(pa_pos) & set(pb_pos):
        a, b = pa_pos[d], pb_pos[d]
        # min |a_i - b_j| over two sorted arrays via a merge walk
        idx = np.searchsorted(b, a)
        best = np.inf
        for i, p in enumerate(a):
            j = idx[i]
            if j < b.size:
                best = min(best, abs(int(b[j]) - int(p)))
            if j > 0:
                best = min(best, abs(int(p) - int(b[j - 1])))
        if best <= slop:
            hits.append((d,))
    if not hits:
        return spark.createDataFrame([], "doc_id long")
    return spark.createDataFrame(sorted(hits), "doc_id long")


def phrase_match_docs(
    spark: SparkSession, positions_dir: str, phrase: str
) -> DataFrame:
    """Exact positional phrase match: doc_ids where the phrase's tokens
    occur at consecutive positions. Reads ONLY the phrase terms' rows
    (term pushdown on the sorted store); the adjacency intersection runs
    coordinator-side on the decoded position lists (bounded by the
    AND-match doc count, the same envelope as top-k scoring)."""
    import pyarrow.dataset as pads

    terms = tokenize_py(phrase)
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    dset = pads.dataset(positions_dir, format="parquet")
    tbl = dset.to_table(filter=pads.field("term").isin(sorted(set(terms))))
    pdf = tbl.to_pandas()
    per_term = {
        t: _decode_term_rows(pdf[pdf["term"] == t]) for t in set(terms)
    }
    if any(not per_term[t] for t in terms):
        return spark.createDataFrame([], "doc_id long")
    # candidates: docs containing every term
    cand = set(per_term[terms[0]])
    for t in terms[1:]:
        cand &= set(per_term[t])
    hits = []
    for d in cand:
        live = per_term[terms[0]][d]
        for i, t in enumerate(terms[1:], start=1):
            live = np.intersect1d(live + 1, per_term[t][d],
                                  assume_unique=True)
            if live.size == 0:
                break
        if live.size:
            hits.append((d,))
    if not hits:
        return spark.createDataFrame([], "doc_id long")
    return spark.createDataFrame(sorted(hits), "doc_id long")
