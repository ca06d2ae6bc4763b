"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Dot products run as Catalyst ``zip_with``/``aggregate`` expressions
  (whole-stage codegen; the query vector is a literal folded into the plan,
  no Python). Top-k plans as TakeOrderedAndProject — no global sort.
- ``knn_join``: exact k-NN for a *set* of query vectors via a broadcast
  join + window rank — the "small probe set vs huge corpus" shape.
- ``materialize_lsh_buckets`` + ``lsh_table_topk``: the scale path —
  integer-deterministic sign-LSH buckets (md5-derived planes over
  floor(x*1000)-quantized vectors, so bucket membership is reproducible in
  any engine, including the DuckDB oracle) written ONCE as a
  bucket-partitioned table; a probe's multi-probe ``bucket IN (...)``
  prunes to a handful of partitions regardless of corpus size.
- ``lsh_bucketed_topk``: same candidate semantics over an unbucketed frame
  (inline hash — one-shot / baseline use only).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_connect_opensearch_spark.functions.vectors import cosine_similarity


def _vec_lit(vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def brute_force_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k of ``query_vec`` against every row (baseline)."""
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), _vec_lit(query_vec)), round_to).alias(
            "cosine"
        ),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def knn_join(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    probe_id: str = "probe_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact k-NN of each probe vector against the corpus.

    Probe set is broadcast (small side); per-probe top-k via window rank —
    one shuffle on probe_id, no cartesian materialization beyond the
    broadcast nested loop the optimizer picks.
    """
    p = probes.select(
        F.col(probe_id), F.col(vec_col).alias("_probe_vec")
    )
    joined = corpus.join(F.broadcast(p))
    scored = joined.select(
        probe_id,
        corpus_id,
        F.round(
            cosine_similarity(F.col(vec_col), F.col("_probe_vec")), round_to
        ).alias("cosine"),
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, corpus_id, "cosine", "rank")
    )


# --- sign-LSH with integer-deterministic buckets -----------------------------
#
# Bucket membership must be reproducible by ANY engine (the DuckDB oracle,
# a future re-shard job, a different Spark version), so the hyperplanes are
# small integers derived from md5 and the vectors are quantized with
# floor(x * 1000) before the dot product — the sign test is then exact
# integer arithmetic with no FP-summation-order hazard. Quantization at 1e-3
# granularity perturbs each hyperplane margin by < 0.1%, which is far below
# sign-LSH's intrinsic noise, so recall is unaffected.

QUANT_SCALE = 1000
_PLANE_SPAN = 7  # plane components uniform in [-3, 3]


def int_hyperplanes(dim: int, n_planes: int = 10) -> list[list[int]]:
    """Deterministic integer hyperplanes (md5-derived, engine-portable)."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"plane:{i}:{j}".encode()).hexdigest()[:8], 16)
            % _PLANE_SPAN
            - _PLANE_SPAN // 2
            for j in range(dim)
        ]
        for i in range(n_planes)
    ]


def quantize_vec(col: F.Column) -> F.Column:
    """array<float> → array<long> via floor(x*1000): exact in any engine."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * QUANT_SCALE).cast("long")
    )


def int_bucket_col(vec_col: str, planes: list[list[int]]) -> F.Column:
    """Packed sign-LSH bucket over the quantized vector — pure integer
    column expressions (codegen'd; order-independent, hence portable)."""
    qi = quantize_vec(F.col(vec_col))
    acc = None
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(qi, F.array(*[F.lit(p) for p in plane]), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda s, x: s + x,
        )
        bit = F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
        acc = bit if acc is None else acc + bit
    return acc.cast("int")


def with_lsh_bucket(
    df: DataFrame,
    planes: list[list[int]],
    vec_col: str = "embedding",
    out: str = "bucket",
) -> DataFrame:
    """Attach the integer sign-LSH bucket id. At 100 TB this runs once at
    ingest (see :func:`materialize_lsh_buckets`), never per query."""
    return df.withColumn(out, int_bucket_col(vec_col, planes))


def materialize_lsh_buckets(
    df: DataFrame,
    out_dir: str,
    dim: int,
    n_planes: int = 10,
    vec_col: str = "embedding",
) -> None:
    """Write the corpus partitioned by bucket (Hive ``bucket=N`` dirs).

    This is the scale path the probe side depends on: a query's
    ``bucket IN (...)`` prunes to a handful of partitions instead of
    scanning (and re-hashing) the full corpus per query."""
    planes = int_hyperplanes(dim, n_planes)
    with_lsh_bucket(df, planes, vec_col).write.partitionBy("bucket").mode(
        "overwrite"
    ).parquet(out_dir)


def _hamming_neighbors(bucket: int, n_planes: int, radius: int) -> list[int]:
    """All buckets within Hamming distance ``radius`` of ``bucket`` —
    arbitrary radius (callers asking for radius ≥ 3 get exactly that,
    not a silent radius-2 cap)."""
    import itertools

    out = [bucket]
    for r in range(1, radius + 1):
        for combo in itertools.combinations(range(n_planes), r):
            m = 0
            for i in combo:
                m |= 1 << i
            out.append(bucket ^ m)
    return out


def query_bucket(query_vec, planes: list[list[int]]) -> int:
    """Driver-side bucket of the probe vector (same integer math)."""
    import math

    qi = [math.floor(float(x) * QUANT_SCALE) for x in query_vec]
    b = 0
    for i, plane in enumerate(planes):
        if sum(a * p for a, p in zip(qi, plane, strict=True)) > 0:
            b |= 1 << i
    return b


def _seq_cosine(va, vb):
    """Cosine with the exact left-to-right fp64 fold the JVM
    zip_with/aggregate expressions use — bit-identical reference for
    rounding-boundary pairs."""
    import math

    dot = 0.0
    na = 0.0
    nb_ = 0.0
    for x, y in zip(va, vb, strict=True):
        dot = dot + x * y
    for x in va:
        na = na + x * x
    for y in vb:
        nb_ = nb_ + y * y
    denom = math.sqrt(na) * math.sqrt(nb_)
    return dot / denom if denom != 0.0 else float("nan")


def _cosine_pairs_dense(ids_a, Xa, ids_b, Xb, prefilter, round_to):
    """(id_a < id_b) cross pairs with cosine ≥ prefilter as numpy arrays
    (ids_a/ids_b int64, Xa/Xb row-major float64): one BLAS gram block,
    zero-vector rows yield NaN (dropped by the prefilter like the JVM
    NULL), and pairs within 1e-6·10^-round_to of a round-half boundary
    are recomputed with :func:`_seq_cosine` so the Spark-side round()
    matches the zip_with formulation bit-for-bit."""
    import numpy as np

    na = np.sqrt(np.einsum("ij,ij->i", Xa, Xa))
    nb_ = np.sqrt(np.einsum("ij,ij->i", Xb, Xb))
    G = Xa @ Xb.T
    denom = na[:, None] * nb_[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(denom != 0.0, G / denom, np.nan)
    ia, ib = np.nonzero(
        (cos >= prefilter) & (ids_a[:, None] < ids_b[None, :])
    )
    raw = cos[ia, ib]
    if raw.size:
        scaled = raw * (10.0 ** round_to)
        frac = np.abs(scaled - np.floor(scaled) - 0.5)
        for j in np.nonzero(frac < 1e-6)[0]:
            raw[j] = _seq_cosine(Xa[ia[j]].tolist(), Xb[ib[j]].tolist())
    return ids_a[ia], ids_b[ib], raw


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 8,
    probe_radius: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: sign-LSH bucket candidates
    (pairs whose integer buckets differ in ≤ ``probe_radius`` bits) +
    exact rounded-cosine verify ≥ ``threshold``.

    The all-pairs crossJoin is O(n²) and exists only as a correctness
    baseline; this is the 100 TB path: one bucket projection, a neighbor
    expansion bounded by C(n_planes, ≤radius) rows per vector, and a
    shuffle keyed on the PROBED bucket — never a cartesian product. The
    verify runs per probed-bucket group in ``applyInPandas`` (one BLAS
    gram block of probers × members, boundary pairs re-folded in JVM
    order — see :func:`_cosine_pairs_dense`); the former formulation
    pushed every candidate with both vector payloads through a JVM join
    + pair dedup, which did not finish one sf1.0 run in 10 minutes.
    Precision is exact (every candidate is cosine-verified); recall is
    the sign-LSH collision probability (rising with probe_radius).
    Buckets are integer-deterministic (md5 planes over quantized
    vectors), so a SQL oracle reproduces the candidate set
    bit-identically. A pair (a < b) is emitted exactly once — by the
    unique probe mask a ⊕ b of the a-probes-b direction."""
    import numpy as np
    import pandas as pd

    planes = int_hyperplanes(dim, n_planes)
    b = with_lsh_bucket(df, planes, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), "bucket"
    )
    masks = _hamming_neighbors(0, n_planes, probe_radius)  # XOR masks
    probers = b.select(
        "id", "vec", "bucket",
        F.explode(F.array(*[F.lit(m) for m in masks])).alias("m"),
        F.lit(0).alias("side"),
    ).select(
        "id", "vec", F.col("bucket").bitwiseXOR(F.col("m")).alias("g"),
        "side",
    )
    members = b.select(
        "id", "vec", F.col("bucket").alias("g"), F.lit(1).alias("side")
    )
    both = probers.unionByName(members)

    eps = 1e-8
    prefilter = threshold - 10.0 ** (-round_to) - eps

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "raw": pd.Series([], dtype="float64")}
        )
        side = pdf["side"].to_numpy()
        pm = pdf[side == 0]
        mm = pdf[side == 1]
        if not len(pm) or not len(mm):
            return empty
        ids_a = pm["id"].to_numpy(dtype=np.int64)
        ids_b = mm["id"].to_numpy(dtype=np.int64)
        Xa = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pm["vec"]]
        )
        Xb = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in mm["vec"]]
        )
        ia, ib, raw = _cosine_pairs_dense(
            ids_a, Xa, ids_b, Xb, prefilter, round_to
        )
        if ia.size == 0:
            return empty
        return pd.DataFrame({"id_a": ia, "id_b": ib, "raw": raw})

    return (
        both.groupBy("g")
        .applyInPandas(bucket_pairs, "id_a long, id_b long, raw double")
        .select(
            "id_a", "id_b",
            F.round(F.col("raw"), round_to).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )

def lsh_banded_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 8,
    band_bits: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """OR-amplified (banded) sign-LSH near-dup pairs: the ``n_planes``
    bucket bits split into ``n_planes // band_bits`` bands; a pair is a
    candidate iff it agrees on EVERY bit of ANY band (the minhash-LSH
    AND-OR scheme applied to sign-LSH), then every candidate is
    exact-cosine-verified ≥ ``threshold``.

    The verify runs per (band, key) bucket inside ``applyInPandas``: one
    BLAS gram matrix per bucket replaces the former candidate self-join,
    which materialized every bucket collision WITH both 64-dim vector
    payloads through the JVM join + a pair-dedup shuffle (~10^8 rows ×
    ~1 KB at sf1.0 — the r6 A/B could not finish one run in 19 min; this
    shape takes seconds). Results are bit-identical to the
    zip_with/aggregate formulation: pairs whose cosine lies within 1e-8
    of a round-half or threshold boundary — the only ones where BLAS
    summation order could flip the rounded value — are recomputed with
    the JVM fold's exact left-to-right order, and rounding + the
    threshold cut stay in Spark. Never a cartesian product; cross-band
    duplicate finds collapse in one distinct over identical rows.
    """
    import numpy as np
    import pandas as pd

    planes = int_hyperplanes(dim, n_planes)
    n_bands = n_planes // band_bits
    mask = (1 << band_bits) - 1
    b = with_lsh_bucket(df, planes, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), "bucket"
    )
    keys = F.array(*[
        F.shiftright(F.col("bucket"), i * band_bits).bitwiseAND(F.lit(mask))
        for i in range(n_bands)
    ])
    bands = b.select(
        "id", "vec", F.posexplode(keys).alias("band", "key")
    )

    # margin below which a rounded comparison could differ across
    # summation orders (double ulp at cos≈1 is ~2e-16; 1e-8 is overkill)
    eps = 1e-8
    prefilter = threshold - 10.0 ** (-round_to) - eps

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "raw": pd.Series([], dtype="float64")}
        )
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf["id"].to_numpy(dtype=np.int64)
        X = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
        )
        ia, ib, raw = _cosine_pairs_dense(
            ids, X, ids, X, prefilter, round_to
        )
        if ia.size == 0:
            return empty
        return pd.DataFrame({"id_a": ia, "id_b": ib, "raw": raw})

    verified = (
        bands.groupBy("band", "key")
        .applyInPandas(bucket_pairs, "id_a long, id_b long, raw double")
        .select(
            "id_a", "id_b",
            F.round(F.col("raw"), round_to).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
    return verified

def lsh_bucketed_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    n_planes: int = 10,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Approximate cosine top-k over an *unbucketed* frame: computes buckets
    inline (full-corpus hash — correctness baseline / one-shot use). For
    repeated queries use :func:`materialize_lsh_buckets` +
    :func:`lsh_table_topk`, where the bucket filter prunes partitions."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = int_hyperplanes(q.size, n_planes)
    probes = _hamming_neighbors(query_bucket(query_vec, planes), n_planes,
                                probe_radius)
    cands = with_lsh_bucket(df, planes, vec_col).filter(
        F.col("bucket").isin(probes)
    )
    return brute_force_topk(cands, query_vec, k, id_col, vec_col, round_to)


# --- IVF (inverted-file) ANN -------------------------------------------------
#
# The second scale path beside sign-LSH: vectors are assigned to their
# nearest centroid ONCE at ingest and stored partitioned by centroid; a
# probe reranks only the nprobe nearest centroid partitions. Centroids are
# a deterministic corpus sample (IVF random-sampling init) so the DuckDB
# oracle reproduces the assignment; swap in Lloyd-iterated centroids on a
# real deployment and nothing downstream changes.


def ivf_centroids(
    df: DataFrame,
    k: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic FIXED-k sampled centroids: the k vectors with the
    smallest portable (md5-derived) hash of their id — IVF
    random-sampling init with a reproducible PRNG, so the DuckDB oracle
    selects the identical set.

    k is independent of corpus size (the round-2 stride sampling grew
    linearly and was collected driver-side — a scale-killer at 100 TB);
    the plan is TakeOrderedAndProject over (hash, id), never a full sort.
    Swap in Lloyd/k-means‖ iterations on a real deployment and nothing
    downstream changes."""
    from kafka_connect_opensearch_spark.operators.dedup import hash64

    h = hash64(F.col(id_col).cast("string"), seed="ivf:")
    return (
        df.select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid"),
            h.alias("_h"),
        )
        .orderBy("_h", "centroid_id")
        .limit(k)
        .drop("_h")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (small) centroid table,
    argmax by rounded cosine (ties → lowest centroid id, so the assignment
    is reproducible in any engine).

    The argmax is ``max_by`` over a ``groupBy(id)`` — a declarative
    aggregate with a partial (map-side) stage, so the corpus×k rows
    collapse to one row per vector BEFORE the shuffle. The previous
    ``row_number()`` window shuffled all corpus×k rows to sort them."""
    sim = F.round(
        cosine_similarity(F.col(vec_col), F.col("centroid")), round_to
    )
    # struct order: highest sim, then highest -centroid_id = lowest id
    ordkey = F.struct(
        sim.alias("s"), (-F.col("centroid_id")).alias("c")
    )
    return (
        df.join(F.broadcast(centroids))
        .groupBy(id_col)
        .agg(
            F.max_by("centroid_id", ordkey).alias("centroid_id"),
            F.first(vec_col).alias(vec_col),
        )
        .select(id_col, vec_col, "centroid_id")
    )


def materialize_ivf(
    df: DataFrame,
    centroids: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Write the corpus partitioned by centroid (Hive ``centroid_id=N``)."""
    ivf_assign(df, centroids, id_col, vec_col).write.partitionBy(
        "centroid_id"
    ).mode("overwrite").parquet(out_dir)


def ivf_table_topk(
    spark,
    table_dir: str,
    query_vec,
    centroid_rows: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF probe: pick the query's nprobe nearest centroids driver-side
    (tiny list), read only those partitions, exact cosine re-rank."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    scored = []
    for cid, cvec in centroid_rows:
        c = np.asarray(cvec, dtype=np.float64)
        sim = round(float(c @ q / (np.linalg.norm(c) * qn)), round_to)
        scored.append((-sim, cid))
    probes = [cid for _, cid in sorted(scored)[:nprobe]]
    cands = spark.read.parquet(table_dir).filter(
        F.col("centroid_id").isin(probes)
    )
    return brute_force_topk(cands, query_vec, k, id_col, vec_col, round_to)


def lsh_table_topk(
    spark,
    table_dir: str,
    query_vec,
    k: int = 10,
    n_planes: int = 10,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """ANN top-k against a materialized bucket-partitioned corpus: the
    ``bucket IN (probes)`` predicate is a *partition filter* — the scan
    touches |probes| directories, independent of corpus size."""
    planes = int_hyperplanes(len(query_vec), n_planes)
    probes = _hamming_neighbors(query_bucket(query_vec, planes), n_planes,
                                probe_radius)
    cands = spark.read.parquet(table_dir).filter(F.col("bucket").isin(probes))
    return brute_force_topk(cands, query_vec, k, id_col, vec_col, round_to)
