"""spark-submit entry point: build (or resume) an index on a cluster.

The north-star deployment shape — the package ships to executors via
``--py-files`` and the driver script stays dependency-free::

    cd /root/repo && zip -qr /tmp/kcos.zip kafka_connect_opensearch_spark
    spark-submit --master <cluster> --py-files /tmp/kcos.zip \
        scripts/submit_build.py SOURCE_PARQUET INDEX_DIR \
        [--mode bulk|incremental] [--segments N] [--content-col NAME] \
        [--id-cols a,b,c] [--doc-id-col NAME]

Prints one JSON line of build metrics (docs indexed, postings written,
segments built/merged, wall seconds) — the north rule's build metrics.
On resume, committed batches are skipped (contiguous-prefix lineage).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("source", help="input parquet path")
    ap.add_argument("index_dir", help="index output directory")
    ap.add_argument("--mode", choices=["bulk", "incremental"], default="bulk")
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--content-col", default="content")
    ap.add_argument("--id-cols", default="repo,path,commit")
    ap.add_argument("--doc-id-col", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument(
        "--positions", action="store_true",
        help="index token positions (phrase/NEAR/phrase-prefix queries)",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("kcos-index-build").getOrCreate()
    # imported AFTER getOrCreate so --py-files zips are already on the path
    from kafka_connect_opensearch_spark.config import EngineConfig
    from kafka_connect_opensearch_spark.operators.indexer import (
        build_index,
        build_index_bulk,
    )

    shuffle = args.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cfg = EngineConfig(
        num_segments=args.segments,
        shuffle_partitions=shuffle,
        index_positions=args.positions,
    )
    source = spark.read.parquet(args.source)
    build = build_index_bulk if args.mode == "bulk" else build_index
    metrics = build(
        spark,
        source,
        args.index_dir,
        cfg,
        id_cols=tuple(args.id_cols.split(",")),
        content_col=args.content_col,
        doc_id_col=args.doc_id_col,
    )
    print(
        json.dumps(
            {
                "docs_indexed": metrics.docs_indexed,
                "postings_written": metrics.postings_written,
                "segments_built": metrics.segments_built,
                "segments_merged": metrics.segments_merged,
                "batches_skipped": metrics.batches_skipped,
                "wall_secs": round(metrics.wall_secs, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
