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


def _pack_partial(pdf: pd.DataFrame) -> pd.DataFrame:
    """Level-1: pack one (term, salt) group into aligned binary arrays."""
    import numpy as np

    ids = pdf["doc_id"].to_numpy(dtype="int64")
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    tfs = pdf["tf"].to_numpy(dtype="int64")[order]
    dls = pdf["dl"].to_numpy(dtype="int64")[order]
    deltas = np.empty_like(ids)
    if ids.size:
        deltas[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "doc_ids": [codec.varint_encode(deltas.astype("uint64"))],
            "tfs": [codec.varint_encode(tfs.astype("uint64"))],
            "dls": [codec.varint_encode(dls.astype("uint64"))],
        }
    )


def _make_merge_partials(seg_name: str, block_size: int):
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids_parts, tf_parts, dl_parts = [], [], []
        for _, row in pdf.iterrows():
            d = codec.varint_decode(row["doc_ids"]).astype("int64")
            ids_parts.append(np.cumsum(d))
            tf_parts.append(codec.varint_decode(row["tfs"]).astype("int64"))
            dl_parts.append(codec.varint_decode(row["dls"]).astype("int64"))
        ids = np.concatenate(ids_parts)
        tfs = np.concatenate(tf_parts)
        dls = np.concatenate(dl_parts)
        # same doc_id never spans salt groups (salt = f(doc_id)) → plain sort
        order = np.argsort(ids, kind="stable")
        ids, tfs, dls = ids[order], tfs[order], dls[order]
        deltas = np.empty_like(ids)
        deltas[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=deltas[1:])
        n_blocks = -(-ids.size // block_size)
        block_max = np.asarray(
            [
                tfs[i * block_size : (i + 1) * block_size].max()
                for i in range(n_blocks)
            ],
            dtype="int64",
        )
        return pd.DataFrame(
            {
                "term": [pdf["term"].iloc[0]],
                "seg": [seg_name],
                "df": [int(ids.size)],
                "max_tf": [int(tfs.max())],
                "doc_ids": [codec.varint_encode(deltas.astype("uint64"))],
                "tfs": [codec.varint_encode(tfs.astype("uint64"))],
                "dls": [codec.varint_encode(dls.astype("uint64"))],
                "block_max": [codec.varint_encode(block_max.astype("uint64"))],
            }
        )

    return merge


def build_segment_postings(
    doc_term_df: DataFrame, seg_name: str, config: EngineConfig
) -> DataFrame:
    """(doc_id, dl, term, tf) → packed postings rows (POSTINGS_SCHEMA)."""
    salted = doc_term_df.withColumn(
        "_salt", F.pmod(F.col("doc_id"), F.lit(config.salt_partitions))
    )
    partial = salted.groupBy("term", "_salt").applyInPandas(
        _pack_partial, schema=PARTIAL_SCHEMA
    )
    return partial.groupBy("term").applyInPandas(
        _make_merge_partials(seg_name, config.block_size), schema=POSTINGS_SCHEMA
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
