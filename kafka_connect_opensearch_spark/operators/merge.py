"""Log-structured segment merge (SURVEY.md D3) + index-level deletes (W3).

Mirrors Lucene's merge behind the reference's bulk flushes: k immutable
segments are rewritten into one, with document-level latest-wins across
generations (a doc re-ingested into a newer segment shadows its older
posting entries — the index-level continuation of the connector's external
versioning, W4) and optional tombstone deletes applied during the rewrite.

Execution shape (scales like the initial build — merge cost is O(postings)
with the same salted two-level aggregation, no driver materialization):

  postings(seg k..n) → mapInPandas decode-explode → (term, doc_id, tf, dl)
    → anti-join losers (docs shadowed by newer segments) and deletes
    → groupBy(term, salt) / groupBy(term) re-pack → new segment
    → manifest entry with ``replaces=[old segments]`` (atomic commit)

Old segment directories are left in place (immutable); the manifest marks
them dead, so a crashed merge is invisible and a re-run is idempotent —
exactly the reference's retry-safe bulk semantics (B5).
"""

from __future__ import annotations

import time
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_opensearch_spark.config import EngineConfig
from kafka_connect_opensearch_spark.operators import postings as codec
from kafka_connect_opensearch_spark.operators.indexer import (
    build_segment_postings,
)
from kafka_connect_opensearch_spark.operators.segments import (
    BuildMetrics,
    SegmentMeta,
    SegmentStore,
)
from kafka_connect_opensearch_spark.retry import call_with_retries

DECODED_SCHEMA = "term string, _segname string, doc_id long, tf long, dl long"


def tiered_merge_candidates(
    segments: list[SegmentMeta], merge_factor: int = 4
) -> list[str]:
    """Size-tiered merge policy (Lucene TieredMergePolicy shape): segments
    are binned by ``floor(log_mf(doc_count))``; the first (smallest) tier
    holding ≥ merge_factor segments yields its merge_factor smallest
    members. Smallest-first keeps write amplification logarithmic: each
    document is rewritten O(log_mf(N)) times over the index's lifetime."""
    import math

    tiers: dict[int, list[SegmentMeta]] = {}
    for m in segments:
        tier = int(math.log(max(m.doc_count, 1), merge_factor))
        tiers.setdefault(tier, []).append(m)
    for tier in sorted(tiers):
        if len(tiers[tier]) >= merge_factor:
            picked = sorted(tiers[tier], key=lambda m: (m.doc_count, m.name))
            return [m.name for m in picked[:merge_factor]]
    return []


def auto_merge(
    spark: SparkSession,
    index_dir: str,
    config: EngineConfig | None = None,
) -> BuildMetrics:
    """Run the tiered policy to a fixed point: merge while any tier trips.

    This is the engine's analog of the reference's automatic flush/merge
    cadence (BulkProcessor, OpenSearchClient.java:145-155) — without it a
    long-running incremental ingest accumulates unbounded segment count and
    query-side unions grow linearly. Idempotent and crash-safe: each merge
    is an atomic manifest commit; a re-run just continues."""
    config = config or EngineConfig()
    total = BuildMetrics()
    t0 = time.monotonic()
    store = SegmentStore(index_dir)
    while True:
        names = tiered_merge_candidates(
            store.active_segments(), config.merge_factor
        )
        if not names:
            break
        m = merge_segments(spark, index_dir, config, segment_names=names)
        total.docs_indexed += m.docs_indexed
        total.postings_written += m.postings_written
        total.segments_built += m.segments_built
        total.segments_merged += m.segments_merged
    total.wall_secs = time.monotonic() - t0
    return total


def decode_postings_df(postings: DataFrame) -> DataFrame:
    """Packed postings rows → exploded (term, seg, doc_id, tf, dl) rows.

    mapInPandas so decoding is per-Arrow-batch numpy, not per-row Python.
    The segment name travels in the stored ``seg`` column.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            if not len(b):
                continue
            d_vals, d_row = codec.varint_decode_concat(list(b["doc_ids"]))
            t_vals, _ = codec.varint_decode_concat(list(b["tfs"]))
            l_vals, _ = codec.varint_decode_concat(list(b["dls"]))
            if d_vals.size == 0:
                continue
            run_change = np.empty(d_row.size, dtype=bool)
            run_change[0] = True
            np.not_equal(d_row[1:], d_row[:-1], out=run_change[1:])
            ids = codec.cumsum_with_resets(
                d_vals, np.nonzero(run_change)[0]
            )
            counts = np.bincount(d_row, minlength=len(b))
            yield pd.DataFrame(
                {
                    "term": np.repeat(b["term"].to_numpy(), counts),
                    "_segname": np.repeat(b["seg"].to_numpy(), counts),
                    "doc_id": ids,
                    "tf": t_vals.astype("int64"),
                    "dl": l_vals.astype("int64"),
                }
            )

    return postings.select("term", "seg", "doc_ids", "tfs", "dls").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    config: EngineConfig | None = None,
    segment_names: list[str] | None = None,
    delete_doc_keys: DataFrame | None = None,
) -> BuildMetrics:
    """Merge ``segment_names`` (default: all active) into one new segment.

    ``delete_doc_keys``: optional single-column ``doc_key`` frame — those
    documents are dropped during the rewrite (tombstone semantics W3,
    DataConverter.java:122-139 re-cast as an index-maintenance op).
    """
    config = config or EngineConfig()
    t0 = time.monotonic()
    store = SegmentStore(index_dir)
    segs = {s.name: s for s in store.active_segments()}
    names = segment_names or sorted(segs)
    if len(names) < 1:
        return BuildMetrics()
    metas = [segs[n] for n in names]
    new_gen = max(m.generation for m in metas) + 1
    # uuid suffix: epoch seconds alone collide when two same-generation
    # merges land within one second (back-to-back ingest() calls with
    # deletes), silently overwriting a segment directory
    seg_name = f"seg_g{new_gen}_m{int(time.time())}_{uuid.uuid4().hex[:8]}"

    # Disjoint-segment fast path (the common tiered-merge shape: a
    # hash-partitioned build never re-ingests a doc into two segments).
    # When no doc_id appears twice and there are no deletes, latest-wins
    # is the identity — so the decode-explode of every posting entry, the
    # winners aggregation and the survivor join are pure overhead
    # (guide §2.3: shuffle the packed bytes, not the exploded rows). The
    # probe is one ids-only columnar count compared against the manifest
    # doc counts.
    if delete_doc_keys is None:
        total_docs = sum(m.doc_count for m in metas)
        distinct_docs = (
            store.read_docs(spark, metas).select("doc_id").distinct().count()
        )
        if distinct_docs == total_docs:
            return _merge_disjoint(
                spark, store, metas, names, seg_name, new_gen, config, t0
            )

    docs_parts = []
    for m in metas:
        docs_parts.append(
            store.read_docs(spark, [m], with_seg=True)
            .withColumnRenamed("seg", "_segname")
            .withColumn("_gen", F.lit(m.generation))
        )
    all_docs = docs_parts[0]
    for d in docs_parts[1:]:
        all_docs = all_docs.unionByName(d)

    # latest-wins across generations (ties: lexicographically later segment)
    winners = (
        all_docs.groupBy("doc_id")
        .agg(
            F.max_by(
                F.struct("doc_key", "content_sha256", "dl", "_segname"),
                F.struct("_gen", "_segname"),
            ).alias("w")
        )
        .select(
            "doc_id",
            F.col("w.doc_key").alias("doc_key"),
            F.col("w.content_sha256").alias("content_sha256"),
            F.col("w.dl").alias("dl"),
            F.col("w._segname").alias("_segname"),
        )
    )
    if delete_doc_keys is not None:
        winners = winners.join(
            F.broadcast(delete_doc_keys.select("doc_key").distinct()),
            "doc_key",
            "left_anti",
        )

    packed = store.read_postings(spark, metas)
    decoded = decode_postings_df(packed)
    # keep only posting entries of surviving (doc_id, winning segment) pairs
    survivors = decoded.join(
        winners.select("doc_id", "_segname"), ["doc_id", "_segname"], "inner"
    ).select("term", "doc_id", "tf", "dl")

    from pyspark.sql import Observation

    seg_path = store.segment_path(seg_name)
    doc_obs = Observation(f"{seg_name}_docs")
    winners.select("doc_id", "doc_key", "content_sha256", "dl").observe(
        doc_obs,
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("s"),
    ).write.mode("overwrite").parquet(f"{seg_path}/docs.parquet")
    post = build_segment_postings(survivors, seg_name, config)
    post_obs = Observation(f"{seg_name}_post")
    post = post.observe(
        post_obs,
        F.count(F.lit(1)).alias("t"),
        F.coalesce(F.sum("df"), F.lit(0)).alias("p"),
    )
    # already term-partitioned + sorted (see indexer._build_one_segment)
    post.write.mode("overwrite").parquet(f"{seg_path}/postings.parquet")

    if store.meta().get("positions"):
        # positions live in the same segments merges rewrite (Lucene
        # contract): decode to per-doc blobs, keep the same survivors
        # (latest-wins + deletes), re-pack for the merged segment. Blobs
        # concatenate byte-for-byte — no position value is re-encoded.
        from kafka_connect_opensearch_spark.operators import positions as pos

        decoded_pos = pos.decode_positions_df(store.read_positions(spark, metas))
        pos_survivors = decoded_pos.join(
            winners.select("doc_id", "_segname"), ["doc_id", "_segname"],
            "inner",
        ).select("term", "doc_id", "n_pos", "pos_blob")
        pos.repack_positions(pos_survivors, config).withColumn(
            "seg", F.lit(seg_name)
        ).select(
            "term", "seg", "part", "n_docs",
            "doc_ids", "pos_counts", "positions",
        ).withColumn(
            "rb", F.substring("term", 1, 1)
        ).write.partitionBy("rb").mode("overwrite").parquet(
            f"{seg_path}/positions.parquet"
        )

    # stats ride the write jobs (Observation) — the prior read-back of the
    # just-written files was two extra jobs per merge
    drow, prow = doc_obs.get, post_obs.get
    meta = SegmentMeta(
        name=seg_name,
        generation=new_gen,
        doc_count=int(drow["n"]),
        sum_dl=int(drow["s"]),
        n_terms=int(prow["t"]),
        n_postings=int(prow["p"]),
    )
    store.write_segmeta(meta)
    call_with_retries(
        f"commit merge {seg_name}",
        lambda: store.commit_batch(
            f"merge_{seg_name}",
            {"batch": f"merge_{seg_name}", "segments": [meta.__dict__],
             "replaces": names},
        ),
        max_retries=config.max_retries,
        retry_backoff_ms=config.retry_backoff_ms,
    )
    out = BuildMetrics(
        docs_indexed=meta.doc_count,
        postings_written=meta.n_postings,
        segments_built=1,
        segments_merged=len(names),
    )
    out.wall_secs = time.monotonic() - t0
    return out


def _merge_disjoint(
    spark: SparkSession,
    store: SegmentStore,
    metas: list[SegmentMeta],
    names: list[str],
    seg_name: str,
    new_gen: int,
    config: EngineConfig,
    t0: float,
) -> BuildMetrics:
    """Merge segments with pairwise-disjoint doc ids (no deletes): every
    doc and posting survives verbatim, so the rewrite reduces to

    - docs: verbatim union write (no winners aggregation, no join);
    - postings: the stored packed rows ARE valid level-1 partials
      (term, delta-varint doc_ids/tfs/dls) — regroup them by term and run
      the standard level-2 sorted-run merge. The shuffle carries one
      packed row per (term, source segment) instead of one exploded row
      per posting (~20x fewer bytes; the r6 A/B measured auto_merge
      12.9 s -> see BENCH/ROUND6.md);
    - positions: per-doc blobs concat byte-for-byte (same as the slow
      path, minus the survivor join).

    Doc stats come from manifest arithmetic (exact under disjointness);
    term stats ride the postings write as an Observation.
    """
    from pyspark.sql import Observation

    from kafka_connect_opensearch_spark.operators.indexer import (
        _make_merge_stream,
    )
    from kafka_connect_opensearch_spark.operators.segments import (
        POSTINGS_SCHEMA,
    )

    seg_path = store.segment_path(seg_name)
    store.read_docs(spark, metas).select(
        "doc_id", "doc_key", "content_sha256", "dl"
    ).write.mode("overwrite").parquet(f"{seg_path}/docs.parquet")

    partial = store.read_postings(spark, metas).select(
        "term", "doc_ids", "tfs", "dls"
    )
    l2 = partial.repartition(
        max(2, config.shuffle_partitions // 4), "term"
    ).sortWithinPartitions("term")
    post = l2.mapInPandas(
        _make_merge_stream(seg_name, config.block_size), schema=POSTINGS_SCHEMA
    )
    post_obs = Observation(f"{seg_name}_post")
    post.observe(
        post_obs,
        F.count(F.lit(1)).alias("t"),
        F.coalesce(F.sum("df"), F.lit(0)).alias("p"),
    ).write.mode("overwrite").parquet(f"{seg_path}/postings.parquet")

    if store.meta().get("positions"):
        from kafka_connect_opensearch_spark.operators import positions as pos

        decoded_pos = pos.decode_positions_df(
            store.read_positions(spark, metas)
        ).select("term", "doc_id", "n_pos", "pos_blob")
        pos.repack_positions(decoded_pos, config).withColumn(
            "seg", F.lit(seg_name)
        ).select(
            "term", "seg", "part", "n_docs",
            "doc_ids", "pos_counts", "positions",
        ).withColumn(
            "rb", F.substring("term", 1, 1)
        ).write.partitionBy("rb").mode("overwrite").parquet(
            f"{seg_path}/positions.parquet"
        )

    prow = post_obs.get
    meta = SegmentMeta(
        name=seg_name,
        generation=new_gen,
        doc_count=sum(m.doc_count for m in metas),
        sum_dl=sum(m.sum_dl for m in metas),
        n_terms=int(prow["t"]),
        n_postings=int(prow["p"]),
    )
    store.write_segmeta(meta)
    call_with_retries(
        f"commit merge {seg_name}",
        lambda: store.commit_batch(
            f"merge_{seg_name}",
            {"batch": f"merge_{seg_name}", "segments": [meta.__dict__],
             "replaces": names},
        ),
        max_retries=config.max_retries,
        retry_backoff_ms=config.retry_backoff_ms,
    )
    out = BuildMetrics(
        docs_indexed=meta.doc_count,
        postings_written=meta.n_postings,
        segments_built=1,
        segments_merged=len(names),
    )
    out.wall_secs = time.monotonic() - t0
    return out


def reconcile_updates(
    spark: SparkSession,
    index_dir: str,
    config: EngineConfig | None = None,
    new_segment_names: list[str] | None = None,
) -> BuildMetrics | None:
    """Make cross-segment re-ingests visible latest-wins IMMEDIATELY.

    Lucene marks a superseded document deleted the moment its update
    commits (per-segment live-docs); until this runs, a doc re-ingested
    into a NEW segment coexists with its older copy — doc_count
    over-reports, searches return both rows, stale phrases still match.
    The engine's equivalent is a targeted merge of exactly the segments
    that share a doc_id: ``merge_segments`` already implements the
    (generation, segment-name) winner rule, so reconciliation reuses the
    fully-tested rewrite instead of a second shadowing mechanism.

    ``new_segment_names`` narrows the overlap probe to docs of the
    just-committed segments (the streaming per-batch shape — O(batch)
    semi-join against the older doc ids, ids-only columnar scan); None
    probes all active segments pairwise (one groupBy over doc ids).
    Returns the merge metrics, or None when there was nothing to do.
    No-overlap ingests pay only the probe; write amplification is bounded
    by the tiered auto-merge policy that would have merged these segments
    eventually anyway."""
    store = SegmentStore(index_dir)
    metas = store.active_segments()
    if len(metas) < 2:
        return None
    tagged = store.read_docs(spark, metas, with_seg=True).select(
        "doc_id", "seg"
    )
    if new_segment_names:
        new_ids = tagged.filter(
            F.col("seg").isin(list(new_segment_names))
        ).select("doc_id")
        tagged = tagged.join(new_ids.distinct(), "doc_id", "left_semi")
    dup_segs = (
        tagged.groupBy("doc_id")
        .agg(F.collect_set("seg").alias("segs"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .select(F.explode("segs").alias("seg"))
        .distinct()
        .collect()
    )
    names = sorted({r["seg"] for r in dup_segs})
    if not names:
        return None
    return merge_segments(spark, index_dir, config, segment_names=names)
