"""Driver-side catalog helpers (reference S4-S6: idempotent DDL + memoized
existence checks, OpenSearchClient.java:222-258, OpenSearchSinkTask.java:
147-155, 263-269)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


class IndexCatalog:
    """Memoizes index/table existence the way the task memoizes
    ``indexCache``/``existingMappings`` — pure driver-side dicts."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._index_cache: set[str] = set()
        self._mapping_cache: dict[str, str] = {}

    def index_exists(self, index_dir: str) -> bool:
        if index_dir in self._index_cache:
            return True
        exists = os.path.exists(os.path.join(index_dir, "meta.json"))
        if exists:
            self._index_cache.add(index_dir)
        return exists

    def table_exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(name)

    def register_parquet_views(self, sf_dir: str, tables: list[str]) -> None:
        """Register the driver testdata parquet files as temp views."""
        for t in tables:
            self.spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")) \
                .createOrReplaceTempView(t)
