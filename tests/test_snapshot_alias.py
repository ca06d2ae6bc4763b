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
    # simulate a live writer: a fully-written segment dir whose manifest
    # commit hasn't happened yet, plus a stray scratch file
    segs = os.listdir(os.path.join(d, "segments"))
    src_seg = os.path.join(d, "segments", segs[0])
    shutil.copytree(src_seg, os.path.join(d, "segments", "inflight_seg"))
    with open(os.path.join(d, "scratch.tmp"), "w") as f:
        f.write("writer scratch")

    info = snap.snapshot_index(d, str(tmp_path / "snap"))
    sd = str(tmp_path / "snap")
    assert not os.path.exists(os.path.join(sd, "segments", "inflight_seg"))
    assert not os.path.exists(os.path.join(sd, "scratch.tmp"))
    # pinned manifests are byte-identical to the live commit set
    live = sorted(os.listdir(os.path.join(d, "manifest")))
    snapm = sorted(os.listdir(os.path.join(sd, "manifest")))
    assert live == snapm
    for fn in snapm:
        with open(os.path.join(d, "manifest", fn)) as f:
            a = json.load(f)
        with open(os.path.join(sd, "manifest", fn)) as f:
            b = json.load(f)
        assert a == b
    assert info["segments"] >= 1 and info["batches"] >= 1
    # the snapshot is a fully-functional index
    r = IndexReader(spark, sd)
    assert r.doc_count() == 2
