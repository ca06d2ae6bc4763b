"""Dedup + similarity operators against hand-computed / numpy oracles."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_connect_opensearch_spark.functions.analysis import tokenize_py
from kafka_connect_opensearch_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "completely different content about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (5, "spark engines about completely different content"),  # reorder of 3
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = {r["digest"]: (r["keep_id"], r["n_dupes"])
           for r in dedup.exact_dedup(docs, "text", "doc_id").collect()}
    d1 = hashlib.sha256(b"the quick brown fox jumps over the lazy dog").hexdigest()
    assert out[d1] == (1, 2)  # doc 4 deduped onto doc 1
    assert len(out) == 4


def test_hash64_portable(spark):
    df = spark.createDataFrame([("hello",)], "s string")
    got = df.select(dedup.hash64("s", "x:").alias("h")).collect()[0]["h"]
    want = int(hashlib.md5(b"x:hello").hexdigest()[:15], 16)
    assert got == want


def test_ngram_jaccard_pairs(spark, docs):
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(
               docs, "text", "doc_id", n=3, threshold=0.3).collect()}
    assert out[(1, 4)] == 1.0  # exact dup
    # docs 1/2: 7 distinct shingles each, 6 shared → 6/8
    assert (1, 2) in out and abs(out[(1, 2)] - 0.75) < 1e-6
    assert (1, 3) not in out


def test_ngram_jaccard_hot_shingle_cap(spark, docs):
    """max_shingle_df: a cap above the corpus max df is a no-op; a cap of 1
    drops every shared shingle, so no pair can have a positive
    intersection (the 100 TB hot-shingle guard)."""
    base = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(
                docs, "text", "doc_id", n=3, threshold=0.3).collect()}
    capped_hi = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in dedup.ngram_jaccard_pairs(
                     docs, "text", "doc_id", n=3, threshold=0.3,
                     max_shingle_df=100).collect()}
    assert capped_hi == base
    assert dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.3, max_shingle_df=1
    ).count() == 0


def test_short_docs_survive_shingling(spark):
    """Docs with < n tokens must yield empty shingle arrays, not throw
    (sequence(1,0) is [1,0] in Spark — the descending-array trap)."""
    rows = [
        (1, ""),                 # zero tokens
        (2, "one"),              # 1 token
        (3, "one two"),          # 2 tokens (< n=3)
        (4, "one two three"),    # exactly n
        (5, "alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["id"]: r["shingles"]
          for r in dedup.with_shingles(df, "text", "doc_id", n=3).collect()}
    assert sh[1] == [] and sh[2] == [] and sh[3] == []
    assert sh[4] == ["one two three"]
    assert len(sh[5]) == 2
    # the full pipelines must not throw on short docs, and short docs
    # (empty shingle sets) can never pair with anything
    pairs = dedup.ngram_jaccard_pairs(df, "text", "doc_id", n=3,
                                      threshold=0.1).collect()
    assert all(r["id_a"] >= 4 and r["id_b"] >= 4 for r in pairs)
    dedup.minhash_lsh_dedup(df, "text", "doc_id", threshold=0.1).collect()


def test_minhash_lsh_finds_near_dups(spark, docs):
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.minhash_lsh_dedup(
               docs, "text", "doc_id", threshold=0.3).collect()}
    assert out[(1, 4)] == 1.0        # identical docs always collide in LSH
    for (a, b), j in out.items():
        assert a < b and j >= 0.3


def test_simhash_properties(spark, docs):
    out = {r["id"]: r["simhash"] for r in
           dedup.simhash(docs, "text", "doc_id").collect()}
    assert out[1] == out[4]                    # identical docs → same hash
    assert out[3] == out[5]                    # bag-of-words (order-free)
    d12 = bin(out[1] ^ out[2]).count("1")
    d13 = bin(out[1] ^ out[3]).count("1")
    assert d12 < d13                           # near-dup closer than unrelated


def test_simhash_matches_numpy_oracle(spark, docs):
    rows = docs.collect()
    want = {}
    for r in rows:
        votes = np.zeros(60)
        toks = tokenize_py(r["text"])
        from collections import Counter

        for term, tf in Counter(toks).items():
            h = int(hashlib.md5(f"sh:{term}".encode()).hexdigest()[:15], 16)
            for b in range(60):
                votes[b] += tf * (((h >> b) & 1) * 2 - 1)
        want[r["doc_id"]] = sum(1 << b for b in range(60) if votes[b] > 0)
    got = {r["id"]: r["simhash"] for r in
           dedup.simhash(docs, "text", "doc_id").collect()}
    assert got == want


def test_simhash_banded_pairs_equal_bruteforce(spark, docs):
    """Pigeonhole banding must return EXACTLY the all-pairs result."""
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.simhash_near_dup_pairs(
               docs, "text", "doc_id", max_distance=20).collect()}
    sh = {r["id"]: r["simhash"]
          for r in dedup.simhash(docs, "text", "doc_id").collect()}
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(sh[a] ^ sh[b]).count("1")
            if d <= 20:
                want[(a, b)] = d
    assert got == want and len(want) >= 2  # 1~4 and 3~5 are exact twins


def test_hamming_distance(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    got = df.select(
        dedup.hamming_distance(F.col("a"), F.col("b")).alias("d")
    ).collect()[0]["d"]
    assert got == 2


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal(8)
    rows = [(0, [float(x) for x in base])]
    for i in range(1, 20):
        noise = rng.standard_normal(8) * (0.05 if i < 5 else 1.5)
        rows.append((i, [float(x) for x in base + noise]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_near_dup_pairs_precision_and_recall(spark, vectors):
    """Scale-path cosine near-dup: every emitted pair must be a true pair
    (exact verify ⇒ precision 1.0), and tight near-dups (vec_ids 0-4 share
    a base vector with 5% noise, cosine ≈ 0.999) must be recalled — the
    LSH collision probability at that angle is ~1 per plane."""
    threshold = 0.9
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.lsh_near_dup_pairs(
            vectors, threshold, dim=8, n_planes=8, probe_radius=2
        ).collect()
    }
    rows = vectors.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in rows}
    brute = {}
    for a in sorted(vecs):
        for b in sorted(vecs):
            if a < b:
                c = round(
                    float(vecs[a] @ vecs[b]
                          / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))),
                    6,
                )
                if c >= threshold:
                    brute[(a, b)] = c
    assert set(got) <= set(brute)          # precision: no false pairs
    for pair, cos in got.items():
        assert cos == brute[pair]          # exact verified cosines
    tight = {(a, b) for (a, b) in brute if a < 5 and b < 5}
    assert tight <= set(got)               # recall on true near-dups


def test_banded_near_dup_precision_recall_and_contract_fixture(spark,
                                                               vectors):
    """Banded (AND-OR) sign-LSH near-dup — the contract recipe since
    round 5 (the brute-force crossJoin lives ONLY here, as the recall
    oracle): precision 1.0 (exact verify), tight near-dups recalled, and
    on the contract fixture (sf0.001 embeddings at the contract
    threshold) measured recall must hold the pinned floor AND beat the
    radius-2 probe twin."""
    threshold = 0.9
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.lsh_banded_near_dup_pairs(
            vectors, threshold, dim=8, n_planes=8, band_bits=2
        ).collect()
    }
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in vectors.collect()}
    brute = {}
    for a in sorted(vecs):
        for b in sorted(vecs):
            if a < b:
                c = round(
                    float(vecs[a] @ vecs[b]
                          / (np.linalg.norm(vecs[a])
                             * np.linalg.norm(vecs[b]))), 6,
                )
                if c >= threshold:
                    brute[(a, b)] = c
    assert set(got) <= set(brute)          # precision: no false pairs
    for pair, cos in got.items():
        assert cos == brute[pair]          # exact verified cosines
    tight = {(a, b) for (a, b) in brute if a < 5 and b < 5}
    assert tight <= set(got)               # recall on true near-dups

    # contract fixture: recall floor + strictly better than radius probing
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    e = importlib.import_module("__spark_entry__")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    banded = set(
        (r["id_a"], r["id_b"])
        for r in e.queries()["embedding_near_dup"](
            spark, "/root/testdata/sf0.001").collect()
    )
    probe = set(
        (r["id_a"], r["id_b"])
        for r in similarity.lsh_near_dup_pairs(
            emb, e.COSINE_PAIR_THRESHOLD, dim=e.ANN_DIM,
            n_planes=e.ANN_PLANES, probe_radius=e.NEARDUP_RADIUS,
        ).collect()
    )
    ev = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    ids = sorted(ev)
    exhaustive = set()
    for i, a in enumerate(ids):           # pytest-only brute force
        for b in ids[i + 1:]:
            c = round(float(ev[a] @ ev[b] / (np.linalg.norm(ev[a])
                                             * np.linalg.norm(ev[b]))), 6)
            if c >= e.COSINE_PAIR_THRESHOLD:
                exhaustive.add((a, b))
    assert banded <= exhaustive and probe <= exhaustive   # precision 1.0
    recall = len(banded) / len(exhaustive)
    assert recall >= 0.5, f"banded recall {recall:.2f} under pinned floor"
    assert len(banded) >= len(probe)      # OR-amplification ≥ radius probe


def test_brute_force_topk_matches_numpy(spark, vectors):
    rows = vectors.collect()
    q = np.array(rows[0]["embedding"])
    sims = {}
    for r in rows[1:]:
        v = np.array(r["embedding"])
        sims[r["vec_id"]] = round(
            float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), 6
        )
    want = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [
        (r["vec_id"], r["cosine"])
        for r in similarity.brute_force_topk(
            vectors.filter(F.col("vec_id") > 0), q, k=5
        ).collect()
    ]
    assert got == want


def test_lsh_topk_high_recall_on_near_vectors(spark, vectors):
    rows = vectors.collect()
    q = np.array(rows[0]["embedding"])
    got = {
        r["vec_id"]
        for r in similarity.lsh_bucketed_topk(
            vectors.filter(F.col("vec_id") > 0), q, k=4,
            n_planes=8, probe_radius=2,
        ).collect()
    }
    # the 4 tight neighbors (ids 1-4) live near q; multi-probe LSH must
    # recover most of them
    assert len(got & {1, 2, 3, 4}) >= 3


def test_lsh_bucket_column_matches_driver_side(spark):
    """The integer-quantized bucket function must agree bit-for-bit between
    the Spark column expression and the driver-side Python — the invariant
    the DuckDB oracle (a third implementation) also relies on."""
    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.uniform(-1, 1, 12).astype(np.float32)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = similarity.int_hyperplanes(12, 9)
    got = {r["vec_id"]: r["bucket"]
           for r in similarity.with_lsh_bucket(df, planes).collect()}
    want = {i: similarity.query_bucket(v, planes) for i, v in rows}
    assert got == want


def test_shingle_stream_equals_array_shingles(spark):
    """posexplode+lead stream must produce the same distinct shingle sets
    as the array-HOF formulation (incl. short docs)."""
    rows = [
        (1, "a b c d e a b c"),
        (2, "x"), (3, ""), (4, "p q"),
        (5, "one two three two three one two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    via_arrays = {
        r["id"]: set(r["shingles"])
        for r in dedup.with_shingles(df, "text", "doc_id").collect()
    }
    via_stream = {}
    for r in dedup.shingle_stream(df, "text", "doc_id").collect():
        via_stream.setdefault(r["id"], set()).add(r["s"])
    for i, want in via_arrays.items():
        assert via_stream.get(i, set()) == want


def test_ivf_topk_recall_and_pruning(spark, vectors, tmp_path):
    """IVF: nearest-centroid partitioning + nprobe probing recovers the
    tight neighbors; the probe reads only the probed partitions."""
    from kafka_connect_opensearch_spark import plans

    corpus = vectors.filter(F.col("vec_id") > 0)
    cents = similarity.ivf_centroids(corpus, k=6)
    d = str(tmp_path / "ivf")
    similarity.materialize_ivf(corpus, cents, d)
    rows = vectors.collect()
    q = rows[0]["embedding"]
    centroid_rows = [(r["centroid_id"], list(r["centroid"]))
                     for r in cents.collect()]
    out = similarity.ivf_table_topk(spark, d, q, centroid_rows, k=4, nprobe=2)
    assert plans.has_partition_filter(out, "centroid_id")
    got = {r["vec_id"] for r in out.collect()}
    assert len(got & {1, 2, 3, 4}) >= 3  # tight neighbors recovered


def test_knn_join_ranks(spark, vectors):
    probes = vectors.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    corpus = vectors.filter(F.col("vec_id") >= 2)
    out = similarity.knn_join(corpus, probes, k=3).collect()
    by_probe = {}
    for r in out:
        by_probe.setdefault(r["probe_id"], []).append(r["rank"])
    assert set(by_probe) == {0, 1}
    assert sorted(by_probe[0]) == [1, 2, 3]


def test_minhash_release_cache_drops_persisted_frames(spark, docs):
    """release_cache=True must leave no persisted RDDs behind (the default
    keeps the shingle/candidate caches as the repeat-call warm path)."""
    jsc = spark.sparkContext._jsc  # noqa: SLF001
    before = jsc.getPersistentRDDs().size()  # other tests may hold caches
    out = dedup.minhash_lsh_dedup(
        docs, "text", "doc_id", threshold=0.3, release_cache=True
    )
    rows = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 4) in rows
    # the eager localCheckpoint of `out` itself is the only NEW storage
    # (k-pair result, GC-released with the handle) — both input caches gone
    assert jsc.getPersistentRDDs().size() <= before + 1


def test_lsh_near_dup_recall_vs_allpairs_by_radius(spark):
    """Measured recall of the LSH scale path vs the all-pairs baseline on a
    seeded corpus, across probe_radius ∈ {1, 2, 3}: precision is always
    1.0 (exact cosine verify), recall must be monotone in the radius and
    ≥ a pinned floor at the default radius=2 — the radius/planes
    trade-off documented by measurement, not docstring."""
    rng = np.random.default_rng(42)
    dim, n_planes, threshold = 16, 8, 0.8
    rows = []
    vid = 0
    for c in range(24):
        base = rng.standard_normal(dim)
        for j in range(4):
            scale = (0.05, 0.15, 0.35, 1.2)[j]
            v = base + rng.standard_normal(dim) * scale
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    vecs = {i: np.array(v) for i, v in rows}
    brute = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            c = round(float(vecs[a] @ vecs[b]
                            / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))), 6)
            if c >= threshold:
                brute.add((a, b))
    assert len(brute) >= 30  # the fixture really exercises recall
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    recalls = {}
    for radius in (1, 2, 3):
        got = {(r["id_a"], r["id_b"])
               for r in similarity.lsh_near_dup_pairs(
                   df, threshold, dim=dim, n_planes=n_planes,
                   probe_radius=radius).collect()}
        assert got <= brute  # precision 1.0: every pair cosine-verified
        recalls[radius] = len(got & brute) / len(brute)
    print(f"RECALLS {recalls} brute={len(brute)}")
    assert recalls[1] <= recalls[2] <= recalls[3]
    assert recalls[2] >= 0.90   # pinned floor at the default radius
    assert recalls[3] >= 0.95
