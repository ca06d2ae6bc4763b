"""Training-data sequence packing: map a document corpus onto fixed
token windows (the GPT-style concat-then-chunk layout) and deterministic
stratified sampling for data mixing.

These are the operations a large-scale LLM training pipeline runs right
after dedup/quality filtering: every document needs its span in the
concatenated token stream (which chunks it lands in, where it starts)
and corpora are mixed by sampling each stratum at its own rate.

Scale design:

- :func:`sequence_chunk_spans` needs a GLOBAL prefix sum over token
  counts in doc_id order. The naive plan — ``sum().over(Window.orderBy
  (id))`` — funnels the entire corpus through ONE task (Catalyst plans
  an un-partitioned running window as a single-partition sort), a
  non-starter at 100 TB. Instead: deterministic range bucketing on
  doc_id (a pure function of the id against driver-computed bounds — no
  sampling, so every job sees identical buckets), per-bucket partial
  sums (one tiny aggregate, k rows to the driver), and a broadcast
  prefix-offset joined back per bucket with the within-bucket running
  sum as a bucket-PARTITIONED window (sort-based and spill-safe — a
  bucket never has to fit in one task's memory). Three narrow jobs, no
  corpus-sized sort or single-partition exchange anywhere. Plan-pinned
  (tests/test_plans.py).
- :func:`stratified_sample` is a pure per-row hash threshold (the
  md5-derived ``hash64`` already used for doc identity), so the sample
  is reproducible on any cluster at any partitioning, needs no state,
  and composes with pushdown. The SQL oracle reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kafka_connect_opensearch_spark.functions.analysis import tokenize
from kafka_connect_opensearch_spark.operators.dedup import hash64

N_BUCKETS = 256  # prefix-sum range buckets (≈ executor-count scale)


def sequence_chunk_spans(
    docs: DataFrame,
    window: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Each doc's span in the concatenated fixed-window token stream.

    Documents are concatenated in ``id_col`` order and split into
    ``window``-token chunks; returns one row per non-empty doc:
    ``(doc_id, n_tokens, start_off, first_chunk, last_chunk)`` where
    ``start_off`` is the doc's global token offset and
    ``first_chunk``/``last_chunk`` = the chunk ids of its first/last
    token (``floor(off / window)``).

    Empty-after-analysis docs occupy no tokens and are omitted (they'd
    have no chunk). Deterministic for any partitioning."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize(F.col(text_col))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    # id bounds come from the RAW table (column-pruned scan of the id
    # only — no tokenize): bounds of a superset are valid bucket bounds,
    # so the analyzer runs exactly twice overall (totals pass + final
    # pass), the floor without materializing the token-count projection
    bounds = docs.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return spark.createDataFrame(
            [], "doc_id long, n_tokens long, start_off long, "
                "first_chunk long, last_chunk long"
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = max(hi - lo + 1, 1)
    # deterministic range bucket: pure function of doc_id and the fixed
    # (lo, span) bounds — identical across the partial-sum job and the
    # cumsum job, unlike sampled repartitionByRange boundaries.
    # Float-first: (doc_id-lo)·n_buckets overflows int64 for 60-bit hash
    # ids; float64 division is monotone non-decreasing in doc_id (all
    # that bucketing needs) and clamped to [0, n_buckets-1]
    bucket = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col("doc_id") - F.lit(lo)).cast("double")
                / F.lit(float(span)) * F.lit(n_buckets)
            ).cast("long"),
        ),
    )
    with_b = toks.withColumn("bucket", bucket)

    # k-row partial sums → driver prefix offsets → broadcast join back
    totals = (
        with_b.groupBy("bucket").agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    sums = {int(r["bucket"]): int(r["t"]) for r in totals}
    prefix, acc = {}, 0
    for b in range(n_buckets):
        prefix[b] = acc
        acc += sums.get(b, 0)
    offsets = spark.createDataFrame(
        [(b, prefix[b]) for b in sorted(sums)], "bucket long, prefix long"
    )

    # within-bucket running sum as a PARTITIONED window (sort-based,
    # spill-safe — a bucket never materializes in one task's memory the
    # way an applyInPandas cumsum would); the global component is the
    # broadcast per-bucket prefix. No single-partition exchange anywhere.
    from pyspark.sql.window import Window

    w_run = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        with_b.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "start_off",
            F.col("prefix") + F.sum("n_tokens").over(w_run)
            - F.col("n_tokens"),
        )
        .select("doc_id", "n_tokens", "start_off")
    )
    # integer `div`, not double division: a 100 TB corpus's token
    # offsets exceed 2^53, where float division would mis-bucket
    w = int(window)
    return spans.select(
        "doc_id",
        "n_tokens",
        "start_off",
        F.expr(f"start_off div {w}").alias("first_chunk"),
        F.expr(f"(start_off + n_tokens - 1) div {w}").alias("last_chunk"),
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum sampling (training-mix weights): keep a
    row iff ``hash64(salt:stratum:id) % denom < fraction·denom``. Strata
    absent from ``fractions`` are dropped (explicit mix only). Pure
    per-row math — reproducible on any cluster/partitioning, no sampling
    state, SQL-oracle-exact."""
    frac_col = F.create_map(
        *[x for k, v in sorted(fractions.items())
          for x in (F.lit(k), F.lit(float(v)))]
    )[F.col(stratum_col)]
    h = F.pmod(
        hash64(
            F.concat_ws(
                ":", F.lit(salt), F.col(stratum_col),
                F.col(id_col).cast("string"),
            )
        ),
        F.lit(denom),
    )
    return docs.filter(
        frac_col.isNotNull() & (h < (frac_col * F.lit(denom)).cast("long"))
    )
