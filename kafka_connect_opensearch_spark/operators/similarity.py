"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Dot products run as Catalyst ``zip_with``/``aggregate`` expressions
  (whole-stage codegen; the query vector is a literal folded into the plan,
  no Python). Top-k plans as TakeOrderedAndProject — no global sort.
- ``knn_join``: exact k-NN for a *set* of query vectors via a broadcast
  join + window rank — the "small probe set vs huge corpus" shape.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH buckets
  shrink the candidate set to the probe's bucket (with multi-probe over
  Hamming-adjacent buckets), then exact cosine re-rank inside buckets.
  At 100 TB the bucketed table is written partitioned by bucket so a probe
  touches a few partitions instead of the full corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_connect_opensearch_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
)


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


def random_hyperplanes(dim: int, n_planes: int = 12, seed: int = 7) -> np.ndarray:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def with_lsh_bucket(
    df: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    out: str = "bucket",
) -> DataFrame:
    """Sign-LSH bucket id: bit_i = <v, plane_i> > 0, packed to an int.

    Pure column expressions — each dot product is a codegen'd aggregate;
    n_planes of them per row. At 100 TB this runs once at ingest and the
    result is partitioned by bucket.
    """
    bits = [
        F.when(dot_product(F.col(vec_col), _vec_lit(p)) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        for i, p in enumerate(planes)
    ]
    acc = bits[0]
    for b2 in bits[1:]:
        acc = acc + b2
    return df.withColumn(out, acc.cast("long"))


def _hamming_neighbors(bucket: int, n_planes: int, radius: int) -> list[int]:
    out = [bucket]
    if radius >= 1:
        out += [bucket ^ (1 << i) for i in range(n_planes)]
    if radius >= 2:
        out += [
            bucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return out


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    n_planes: int = 12,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Approximate cosine top-k: multi-probe sign-LSH candidate filter +
    exact re-rank. The bucket IN-filter is pushed into the scan when the
    bucketed table is stored partitioned/sorted by bucket."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = random_hyperplanes(q.size, n_planes, seed)
    qbucket = 0
    for i, p in enumerate(planes):
        if float(p @ q) > 0:
            qbucket |= 1 << i
    probes = _hamming_neighbors(qbucket, n_planes, probe_radius)
    bucketed = with_lsh_bucket(df, planes, vec_col)
    cands = bucketed.filter(F.col("bucket").isin(probes))
    return brute_force_topk(cands, query_vec, k, id_col, vec_col, round_to)
