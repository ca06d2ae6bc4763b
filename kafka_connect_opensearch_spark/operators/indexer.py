"""Inverted-index build: micro-batched, salted, resumable (SURVEY.md D2-D4).

Pipeline per micro-batch (one batch → one immutable segment, mirroring the
connector's bulk-flush unit, OpenSearchClient.java:145-155):

  source batch
    → tokenize (JVM built-ins, whole-stage codegen)
    → term_frequencies (Arrow UDF = map-side combine: one row per distinct
      (doc, term), not per occurrence)
    → explode map
    → groupBy(term, salt(doc_id)) applyInPandas  — level-1 salted pack
    → groupBy(term)              applyInPandas  — level-2 merge + block-max
    → parquet segment, range-partitioned + sorted by term (row-group min/max
      stats on `term` give query-time predicate pushdown / rowgroup skip)

The two-level salted aggregation bounds the largest shuffle group: stopword
terms like ``return`` would otherwise concentrate a whole corpus' postings
in single reducers (the north rule calls this skew out explicitly). AQE skew
handling only splits *join* partitions, not aggregation groups, so the salt
is explicit (SURVEY.md §4.2).

Scale notes (100 TB / 10^12 docs): the driver loop is over micro-batches
(default 8 here; thousands at scale), each a full cluster-wide job bounded
by ``batch_rows``; the per-batch cache is bounded the same way the
reference bounds its buffer (max.buffered.records, B3). Nothing is ever
collected to the driver except per-segment counters.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from kafka_connect_opensearch_spark.config import DOC_KEY_SEP, EngineConfig
from kafka_connect_opensearch_spark.functions.analysis import (
    term_frequencies,
    tokenize,
)
from kafka_connect_opensearch_spark.operators import postings as codec
from kafka_connect_opensearch_spark.operators.segments import (
    DOCS_COLUMNS,
    POSTINGS_SCHEMA,
    BuildMetrics,
    SegmentMeta,
    SegmentStore,
)
from kafka_connect_opensearch_spark.retry import call_with_retries

PARTIAL_SCHEMA = "term string, doc_ids binary, tfs binary, dls binary"


def doc_id_expr(doc_key_col: str = "doc_key") -> F.Column:
    """Deterministic int64 doc id from the document key.

    ``doc_id = int(sha256(doc_key)[:15 hex], 16)`` — 60 bits, positive,
    reproducible in plain Python/DuckDB for oracles (unlike xxhash64).
    Reference parity: `_id` = "{topic}+{partition}+{offset}"
    (DataConverter.java:156-158) re-cast as a content-addressed key
    (SURVEY.md §1.4). Full sha256(content) is stored alongside for the
    north-rule per-row parity check.
    """
    return F.conv(F.substring(F.sha2(F.col(doc_key_col), 256), 1, 15), 16, 10).cast(
        "long"
    )


def doc_id_py(doc_key: str) -> int:
    import hashlib

    return int(hashlib.sha256(doc_key.encode()).hexdigest()[:15], 16)


def _pack_rows(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pack a sorted-by-(term, doc_id) frame into one partial row per term.

    Vectorized over the whole frame: group boundaries via term-change
    detection, one varint-encode per group slice (numpy; no per-group
    Spark/Arrow machinery).
    """
    import numpy as np

    terms = pdf["term"].to_numpy()
    ids = pdf["doc_id"].to_numpy(dtype="int64")
    tfs = pdf["tf"].to_numpy(dtype="int64")
    dls = pdf["dl"].to_numpy(dtype="int64")
    change = np.empty(terms.size, dtype=bool)
    change[0] = True
    np.not_equal(terms[1:], terms[:-1], out=change[1:])
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], terms.size)
    out_t, out_i, out_f, out_d = [], [], [], []
    for s, e in zip(starts, ends, strict=True):
        g_ids = ids[s:e]
        g_tfs = tfs[s:e]
        g_dls = dls[s:e]
        # multiple salt groups of one term can land in one partition; rows
        # are (salt, doc_id)-sorted there, not doc_id-sorted → sort per group
        order = np.argsort(g_ids, kind="stable")
        g_ids, g_tfs, g_dls = g_ids[order], g_tfs[order], g_dls[order]
        deltas = np.empty_like(g_ids)
        deltas[0] = g_ids[0]
        np.subtract(g_ids[1:], g_ids[:-1], out=deltas[1:])
        out_t.append(terms[s])
        out_i.append(codec.varint_encode(deltas.astype("uint64")))
        out_f.append(codec.varint_encode(g_tfs.astype("uint64")))
        out_d.append(codec.varint_encode(g_dls.astype("uint64")))
    return pd.DataFrame(
        {"term": out_t, "doc_ids": out_i, "tfs": out_f, "dls": out_d}
    )


def _stream_groups(batches: Iterator[pd.DataFrame], key: str):
    """Re-chunk an ordered batch stream so no `key` group spans two yields."""
    carry: pd.DataFrame | None = None
    for b in batches:
        if carry is not None and len(carry):
            b = pd.concat([carry, b], ignore_index=True)
            carry = None
        if not len(b):
            continue
        keys = b[key].to_numpy()
        change = keys[1:] != keys[:-1]
        import numpy as np

        nz = np.nonzero(change)[0]
        if nz.size == 0:
            carry = b  # whole batch is one (possibly continuing) group
            continue
        split = int(nz[-1] + 1)
        carry = b.iloc[split:]
        yield b.iloc[:split]
    if carry is not None and len(carry):
        yield carry


def _pack_partial_stream(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for chunk in _stream_groups(batches, "term"):
        yield _pack_rows(chunk)


def _make_merge_stream(seg_name: str, block_size: int):
    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for chunk in _stream_groups(batches, "term"):
            terms = chunk["term"].to_numpy()
            change = np.empty(terms.size, dtype=bool)
            change[0] = True
            np.not_equal(terms[1:], terms[:-1], out=change[1:])
            starts = np.nonzero(change)[0]
            ends = np.append(starts[1:], terms.size)
            rows = {k: [] for k in (
                "term", "seg", "df", "max_tf", "doc_ids", "tfs", "dls",
                "block_max",
            )}
            for s, e in zip(starts, ends, strict=True):
                parts_i, parts_f, parts_d = [], [], []
                for j in range(s, e):
                    d = codec.varint_decode(chunk["doc_ids"].iloc[j])
                    parts_i.append(np.cumsum(d.astype("int64")))
                    parts_f.append(
                        codec.varint_decode(chunk["tfs"].iloc[j]).astype("int64")
                    )
                    parts_d.append(
                        codec.varint_decode(chunk["dls"].iloc[j]).astype("int64")
                    )
                ids = np.concatenate(parts_i)
                tfs = np.concatenate(parts_f)
                dls = np.concatenate(parts_d)
                # a doc_id never spans salt groups (salt = f(doc_id)) → sort
                order = np.argsort(ids, kind="stable")
                ids, tfs, dls = ids[order], tfs[order], dls[order]
                deltas = np.empty_like(ids)
                deltas[0] = ids[0]
                np.subtract(ids[1:], ids[:-1], out=deltas[1:])
                n_blocks = -(-ids.size // block_size)
                bmax = np.asarray(
                    [tfs[i * block_size : (i + 1) * block_size].max()
                     for i in range(n_blocks)],
                    dtype="int64",
                )
                rows["term"].append(terms[s])
                rows["seg"].append(seg_name)
                rows["df"].append(int(ids.size))
                rows["max_tf"].append(int(tfs.max()))
                rows["doc_ids"].append(codec.varint_encode(deltas.astype("uint64")))
                rows["tfs"].append(codec.varint_encode(tfs.astype("uint64")))
                rows["dls"].append(codec.varint_encode(dls.astype("uint64")))
                rows["block_max"].append(codec.varint_encode(bmax.astype("uint64")))
            yield pd.DataFrame(rows)

    return merge


def build_segment_postings(
    doc_term_df: DataFrame, seg_name: str, config: EngineConfig
) -> DataFrame:
    """(doc_id, dl, term, tf) → packed postings rows (POSTINGS_SCHEMA).

    Two sort-based levels, one Python invocation per *partition* (not per
    group): level 1 hash-partitions on (term, salt(doc_id)) — bounding the
    largest reducer for stopword terms — and stream-packs sorted runs;
    level 2 hash-partitions partials on term and stream-merges. Both
    shuffles carry packed binary, so level 2 moves ~salt_partitions rows
    per term regardless of posting-list length.
    """
    salted = doc_term_df.withColumn(
        "_salt", F.pmod(F.col("doc_id"), F.lit(config.salt_partitions))
    )
    l1 = salted.repartition(
        config.shuffle_partitions, "term", "_salt"
    ).sortWithinPartitions("term", "_salt", "doc_id")
    partial = l1.mapInPandas(_pack_partial_stream, schema=PARTIAL_SCHEMA)
    l2 = partial.repartition(
        max(2, config.shuffle_partitions // 4), "term"
    ).sortWithinPartitions("term")
    return l2.mapInPandas(
        _make_merge_stream(seg_name, config.block_size), schema=POSTINGS_SCHEMA
    )


def prepare_documents(
    source: DataFrame,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    content_col: str = "content",
    doc_id_col: str | None = None,
) -> DataFrame:
    """Project a source table to the canonical doc frame.

    Adds: ``doc_key`` (separator-joined id columns — the reference's
    "{topic}+{partition}+{offset}" identity, DataConverter.java:156-158),
    ``doc_id`` (int64), ``content_sha256`` (north-rule parity column),
    ``tokens``, ``dl``. When the source already carries a numeric id
    (``doc_id_col``, the key.ignore=false path: DataConverter.java:87-114),
    it is used directly instead of the hashed key.
    """
    if doc_id_col is not None:
        df = source.withColumn("doc_key", F.col(doc_id_col).cast("string"))
        df = df.withColumn("doc_id", F.col(doc_id_col).cast("long"))
    else:
        df = source.withColumn(
            "doc_key", F.concat_ws(DOC_KEY_SEP, *[F.col(c) for c in id_cols])
        )
        df = df.withColumn("doc_id", doc_id_expr("doc_key"))
    df = df.withColumn("content_sha256", F.sha2(F.col(content_col), 256))
    df = df.withColumn("tokens", tokenize(content_col))
    return df.withColumn("dl", F.size("tokens"))


def build_index(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    config: EngineConfig | None = None,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    content_col: str = "content",
    resume: bool = True,
    fail_after_batches: int | None = None,
    doc_id_col: str | None = None,
) -> BuildMetrics:
    """Build (or resume) an inverted index over ``source``.

    ``fail_after_batches`` is a fault-injection hook for the kill/resume
    test (mirrors the reference's offset-safety ITs,
    integration/OpenSearchSinkTaskIT.java:120-165).
    """
    config = config or EngineConfig()
    t0 = time.monotonic()
    store = SegmentStore(index_dir)
    store.create_if_absent(
        {
            "analyzer": "lowercase_word",
            "k1": config.k1,
            "b": config.b,
            "block_size": config.block_size,
            "num_segments": config.num_segments,
        }
    )
    metrics = BuildMetrics()
    committed = store.committed_batches() if resume else {}

    docs = prepare_documents(source, id_cols, content_col, doc_id_col)
    docs = docs.withColumn(
        "_batch", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(config.num_segments))
    )

    done = 0
    for b in range(config.num_segments):
        batch_id = f"b{b:04d}"
        if batch_id in committed:
            metrics.batches_skipped += 1
            continue
        if fail_after_batches is not None and done >= fail_after_batches:
            raise RuntimeError(f"fault injection: stopping after {done} batches")
        seg_name = f"seg_g0_{batch_id}"
        seg_meta = _build_one_segment(
            spark, docs.filter(F.col("_batch") == b), store, seg_name, config
        )
        # manifest rename is the commit point (O4); wrapped in the reference's
        # retry envelope (B5) for transient FS errors.
        call_with_retries(
            f"commit {batch_id}",
            lambda sm=seg_meta, bid=batch_id: store.commit_batch(
                bid,
                {
                    "batch": bid,
                    "segments": [sm.__dict__],
                    "replaces": [],
                },
            ),
            max_retries=config.max_retries,
            retry_backoff_ms=config.retry_backoff_ms,
        )
        metrics.docs_indexed += seg_meta.doc_count
        metrics.postings_written += seg_meta.n_postings
        metrics.segments_built += 1
        done += 1

    metrics.wall_secs = time.monotonic() - t0
    return metrics


def _build_one_segment(
    spark: SparkSession,
    batch_df: DataFrame,
    store: SegmentStore,
    seg_name: str,
    config: EngineConfig,
) -> SegmentMeta:
    seg_path = store.segment_path(seg_name)
    cached = batch_df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        docs_out = cached.select(*DOCS_COLUMNS)
        docs_out.write.mode("overwrite").parquet(f"{seg_path}/docs.parquet")

        doc_term = cached.select(
            "doc_id", "dl", F.explode(term_frequencies("tokens")).alias("term", "tf")
        )
        post = build_segment_postings(doc_term, seg_name, config)
        # sorted-by-term layout → parquet min/max stats prune query lookups
        post.repartitionByRange(
            max(2, config.shuffle_partitions // 8), "term"
        ).sortWithinPartitions("term").write.mode("overwrite").parquet(
            f"{seg_path}/postings.parquet"
        )
    finally:
        cached.unpersist()

    # stats from the *written* files (no recompute of the build lineage)
    drow = (
        spark.read.parquet(f"{seg_path}/docs.parquet")
        .agg(F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("sdl"))
        .collect()[0]
    )
    prow = (
        spark.read.parquet(f"{seg_path}/postings.parquet")
        .agg(
            F.count("*").alias("terms"),
            F.coalesce(F.sum("df"), F.lit(0)).alias("postings"),
        )
        .collect()[0]
    )
    meta = SegmentMeta(
        name=seg_name,
        generation=0,
        doc_count=int(drow["n"]),
        sum_dl=int(drow["sdl"]),
        n_terms=int(prow["terms"]),
        n_postings=int(prow["postings"]),
    )
    store.write_segmeta(meta)
    return meta
