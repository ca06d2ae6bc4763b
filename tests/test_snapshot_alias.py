"""Aliases + snapshot/restore: the index lifecycle ops (_aliases /
_snapshot analogs) — atomic swap, point-in-time isolation."""

from __future__ import annotations

from kafka_connect_opensearch_spark.config import EngineConfig
from kafka_connect_opensearch_spark.operators import snapshot as snap
from kafka_connect_opensearch_spark.operators.bm25 import IndexReader
from kafka_connect_opensearch_spark.operators.indexer import build_index
from kafka_connect_opensearch_spark.operators.merge import merge_segments


def _mk_index(spark, path, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = EngineConfig(num_segments=1, salt_partitions=2,
                       shuffle_partitions=2)
    build_index(spark, docs, str(path), cfg, content_col="text",
                doc_id_col="doc_id")
    return str(path), cfg


def test_alias_swap_is_atomic_pointer(spark, tmp_path):
    """Readers resolve through the alias; a swap repoints them to the new
    index without touching either index (zero-downtime reindex)."""
    a_dir, _ = _mk_index(spark, tmp_path / "idx_a",
                         [(1, "alpha beta"), (2, "alpha gamma")])
    b_dir, _ = _mk_index(spark, tmp_path / "idx_b",
                         [(1, "alpha beta"), (2, "alpha gamma"),
                          (3, "alpha delta")])
    aliases = str(tmp_path / "aliases")
    snap.create_alias(aliases, "live", a_dir)
    assert IndexReader(spark, snap.resolve_alias(aliases, "live")) \
        .doc_count() == 2
    old = snap.swap_alias(aliases, "live", b_dir)
    assert old == a_dir
    assert IndexReader(spark, snap.resolve_alias(aliases, "live")) \
        .doc_count() == 3
    assert snap.list_aliases(aliases) == {"live": b_dir}
    try:
        snap.resolve_alias(aliases, "nope")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_snapshot_restore_point_in_time(spark, tmp_path):
    """A snapshot taken before a destructive merge restores the original
    result set; the live index's later delete doesn't leak in."""
    d, cfg = _mk_index(spark, tmp_path / "idx",
                       [(1, "alpha beta"), (2, "alpha gamma"),
                        (3, "beta gamma")])
    reader = IndexReader(spark, d)
    before = reader.match_count("alpha", "or")
    assert before == 2

    info = snap.snapshot_index(d, str(tmp_path / "snap"))
    assert info["files"] > 0

    # destructive change on the live index: delete doc 2
    deletes = spark.createDataFrame([("2",)], "doc_key string")
    merge_segments(spark, d, cfg, delete_doc_keys=deletes)
    reader.refresh()
    assert reader.match_count("alpha", "or") == 1

    restored = snap.restore_index(str(tmp_path / "snap"),
                                  str(tmp_path / "restored"))
    r2 = IndexReader(spark, restored)
    assert r2.match_count("alpha", "or") == before   # point-in-time
    assert r2.doc_count() == 3
    # and the restored copy is independent: deleting there leaves live alone
    merge_segments(spark, restored, cfg,
                   delete_doc_keys=spark.createDataFrame(
                       [("1",)], "doc_key string"))
    r2.refresh()
    assert r2.doc_count() == 2
    reader.refresh()
    assert reader.doc_count() == 2  # live still has docs 1 and 3


def test_snapshot_is_manifest_pinned_not_walk_ordered(spark, tmp_path):
    """The snapshot copies exactly what the pinned manifest set names —
    an in-flight (data-written, not-yet-committed) segment and files a
    concurrent writer drops into the index dir are never picked up, so a
    commit landing mid-copy cannot tear the image (ADVICE r4 #1)."""
    import json
    import os
    import shutil

    d, _ = _mk_index(spark, tmp_path / "idx",
                     [(1, "alpha beta"), (2, "alpha gamma")])
    # simulate a live writer: a fully-written seg partition whose
    # manifest commit hasn't happened yet, plus a stray scratch file
    # (single-batch builds use the unified bulk layout since r6)
    store_root = d
    bulk_roots = [f for f in os.listdir(store_root)
                  if f.startswith("bulk_")]
    assert bulk_roots, "expected bulk layout for the wave-built index"
    docs_root = os.path.join(store_root, bulk_roots[0], "docs.parquet")
    committed = [f for f in os.listdir(docs_root) if f.startswith("seg=")]
    shutil.copytree(
        os.path.join(docs_root, committed[0]),
        os.path.join(docs_root, "seg=inflight_seg"),
    )
    with open(os.path.join(d, "scratch.tmp"), "w") as f:
        f.write("writer scratch")

    info = snap.snapshot_index(d, str(tmp_path / "snap"))
    sd = str(tmp_path / "snap")
    assert not os.path.exists(
        os.path.join(sd, bulk_roots[0], "docs.parquet", "seg=inflight_seg")
    )
    assert not os.path.exists(os.path.join(sd, "scratch.tmp"))
    # pinned manifests match the live commit set except that bulk paths
    # are rewritten snapshot-relative (self-containment, r5 ADVICE #1)
    live = sorted(os.listdir(os.path.join(d, "manifest")))
    snapm = sorted(os.listdir(os.path.join(sd, "manifest")))
    assert live == snapm
    for fn in snapm:
        with open(os.path.join(d, "manifest", fn)) as f:
            a = json.load(f)
        with open(os.path.join(sd, "manifest", fn)) as f:
            b = json.load(f)
        for seg_a, seg_b in zip(a.get("segments", []),
                                b.get("segments", []), strict=True):
            pa, pb = seg_a.pop("path", ""), seg_b.pop("path", "")
            if pa:
                assert not os.path.isabs(pb)
                assert os.path.isdir(os.path.join(sd, pb))
        assert a == b
    assert info["segments"] >= 1 and info["batches"] >= 1
    # the snapshot is a fully-functional index
    r = IndexReader(spark, sd)
    assert r.doc_count() == 2


def test_rollover_creates_fresh_write_index(spark, tmp_path):
    """_rollover analog: max_docs trigger creates <base>-NNNNNN with the
    same meta and atomically repoints the alias; below the threshold
    nothing happens; successive rollovers increment the suffix."""
    import os

    d, cfg = _mk_index(spark, tmp_path / "logs",
                       [(1, "alpha beta"), (2, "alpha gamma")])
    aliases = str(tmp_path / "aliases")
    snap.create_alias(aliases, "write", d)
    assert snap.rollover_index(aliases, "write", max_docs=10) is None
    new = snap.rollover_index(aliases, "write", max_docs=2)
    assert new is not None and new.endswith("-000001")
    assert snap.resolve_alias(aliases, "write") == os.path.abspath(new)
    # same meta (analyzer/BM25 config carries over), empty doc set
    from kafka_connect_opensearch_spark.operators.segments import (
        SegmentStore,
    )

    assert SegmentStore(new).meta() == SegmentStore(d).meta()
    assert SegmentStore(new).global_stats()[0] == 0
    # a second rollover only fires once the new index fills up
    assert snap.rollover_index(aliases, "write", max_docs=2) is None
    docs = spark.createDataFrame(
        [(10, "delta epsilon"), (11, "delta zeta"), (12, "delta eta")],
        "doc_id long, text string")
    from kafka_connect_opensearch_spark.operators.indexer import (
        build_index as _build,
    )

    _build(spark, docs, new, cfg, content_col="text", doc_id_col="doc_id")
    newer = snap.rollover_index(aliases, "write", max_docs=2)
    assert newer is not None and newer.endswith("-000002")


def test_reindex_rebuilds_live_docs_only(spark, tmp_path):
    """_reindex analog: the destination contains exactly the docs LIVE
    in the source index (deletes respected), rebuilt under a different
    config, with identical query results."""
    rows = [(1, "alpha beta"), (2, "alpha gamma"), (3, "beta gamma")]
    d, cfg = _mk_index(spark, tmp_path / "src", rows)
    deletes = spark.createDataFrame([("2",)], "doc_key string")
    merge_segments(spark, d, cfg, delete_doc_keys=deletes)

    source = spark.createDataFrame(rows, "doc_id long, text string")
    cfg2 = EngineConfig(num_segments=2, salt_partitions=2,
                        shuffle_partitions=2, index_positions=True)
    dst = str(tmp_path / "dst")
    metrics = snap.reindex(spark, d, source, dst, cfg2,
                           content_col="text", id_col="doc_id")
    assert metrics.docs_indexed == 2          # doc 2 deleted in src
    r_src, r_dst = IndexReader(spark, d), IndexReader(spark, dst)
    assert r_dst.doc_count() == r_src.doc_count() == 2
    a = r_src.search("alpha beta", k=10).collect()
    b = r_dst.search("alpha beta", k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # and the new config took effect (positions now available)
    from kafka_connect_opensearch_spark.operators.positions import (
        PositionsReader,
    )

    assert PositionsReader(spark, dst).phrase_match_ids("alpha beta") == [1]


def test_search_across_rollover_generations(spark, tmp_path):
    """Index-pattern search over rollover generations: per-index stats
    (query_then_fetch), one global top-k; results equal the per-index
    searches merged by (score, index, doc_id)."""
    from kafka_connect_opensearch_spark.operators.bm25 import search_across

    d1, _ = _mk_index(spark, tmp_path / "logs-000001",
                      [(1, "alpha beta"), (2, "alpha gamma")])
    d2, _ = _mk_index(spark, tmp_path / "logs-000002",
                      [(10, "alpha alpha beta"), (11, "delta")])
    got = search_across(
        spark, {"logs-000001": d1, "logs-000002": d2}, "alpha", k=10
    ).collect()
    merged = []
    for name, d in [("logs-000001", d1), ("logs-000002", d2)]:
        for r in IndexReader(spark, d).score_matches("alpha").collect():
            merged.append((name, r["doc_id"], r["score"]))
    merged.sort(key=lambda t: (-t[2], t[0], t[1]))
    assert [tuple(r) for r in got] == merged[:10]
    assert {r["index"] for r in got} == {"logs-000001", "logs-000002"}


def test_dfs_search_across_equals_combined_index(spark, tmp_path):
    """dfs_query_then_fetch invariant: two split indices searched with
    merged global statistics return EXACTLY the (doc_id, score) set one
    combined index over the union of docs returns — bit-identical
    scores, since tf/dl are per-doc and (N, avgdl, df) are pooled."""
    from kafka_connect_opensearch_spark.operators.bm25 import search_across

    rows_a = [(1, "alpha beta"), (2, "alpha gamma delta")]
    rows_b = [(10, "alpha alpha beta"), (11, "beta epsilon")]
    da, _ = _mk_index(spark, tmp_path / "a", rows_a)
    db, _ = _mk_index(spark, tmp_path / "b", rows_b)
    dc, _ = _mk_index(spark, tmp_path / "c", rows_a + rows_b)

    got = search_across(
        spark, {"a": da, "b": db}, "alpha beta", k=10,
        search_type="dfs_query_then_fetch",
    ).collect()
    want = IndexReader(spark, dc).search("alpha beta", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
        [(r["doc_id"], r["score"]) for r in want]

    # and the default query_then_fetch genuinely differs (local idf)
    local = search_across(spark, {"a": da, "b": db}, "alpha beta",
                          k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in local] != \
        [(r["doc_id"], r["score"]) for r in want]


def test_snapshot_consistent_under_live_writer(spark, tmp_path):
    """Stress the ADVICE-r4 fix: snapshots taken WHILE a writer commits
    new batches must each restore to a consistent prefix — every
    snapshot's doc_count equals one of the commit points that existed
    during its copy, and every restored index answers queries."""
    import threading

    d = str(tmp_path / "live")
    cfg = EngineConfig(num_segments=1, salt_partitions=2,
                       shuffle_partitions=2)
    build_index(spark, spark.createDataFrame(
        [(1, "alpha beta")], "doc_id long, text string"),
        d, cfg, content_col="text", doc_id_col="doc_id")

    counts_seen = {1}
    stop = threading.Event()

    def writer():
        n = 2
        while not stop.is_set() and n < 8:
            docs = spark.createDataFrame(
                [(n * 10, f"alpha tok{n}")], "doc_id long, text string")
            build_index(spark, docs, d, cfg, content_col="text",
                        doc_id_col="doc_id")
            counts_seen.add(n)
            n += 1

    t = threading.Thread(target=writer)
    t.start()
    try:
        for i in range(4):
            sd = str(tmp_path / f"snap{i}")
            snap.snapshot_index(d, sd)
            rd = str(tmp_path / f"rest{i}")
            snap.restore_index(sd, rd)
            r = IndexReader(spark, rd)
            n = r.doc_count()
            assert 1 <= n <= 7
            # the snapshot is a working index at its commit point
            assert r.match_count("alpha", "or") == n
    finally:
        stop.set()
        t.join(120)
    assert counts_seen  # writer made progress alongside the snapshots


def test_snapshot_of_bulk_index_is_self_contained(spark, tmp_path):
    """A snapshot of a BULK-layout index must not reference the source
    index's files: its pinned manifests carry snapshot-relative paths,
    so queries keep working after the source index is deleted (r5 ADVICE
    #1 — previously the copied seg=<name> partitions were never read and
    the snapshot silently tracked the source)."""
    import shutil

    from kafka_connect_opensearch_spark.operators.indexer import (
        build_index_bulk,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma"), (3, "beta gamma")],
        "doc_id long, text string",
    )
    cfg = EngineConfig(num_segments=2, salt_partitions=2,
                       shuffle_partitions=2)
    d = str(tmp_path / "bulk_idx")
    build_index_bulk(spark, docs, d, cfg, content_col="text",
                     doc_id_col="doc_id")
    assert IndexReader(spark, d).match_count("alpha", "or") == 2

    snap_dir = str(tmp_path / "snap")
    snap.snapshot_index(d, snap_dir)
    shutil.rmtree(d)  # source gone — the snapshot must stand alone

    r = IndexReader(spark, snap_dir)
    assert r.match_count("alpha", "or") == 2
    assert r.doc_count() == 3

    restored = snap.restore_index(snap_dir, str(tmp_path / "restored"))
    shutil.rmtree(snap_dir)  # restored copy must not track the snapshot
    r2 = IndexReader(spark, restored)
    assert r2.match_count("alpha", "or") == 2
    assert r2.doc_count() == 3
