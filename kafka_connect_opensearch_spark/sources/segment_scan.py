"""DataSourceV2 relation over the segment store (Spark Python Data
Source API): ONE ``BatchScan`` node serves the postings / positions rows
of a pinned segment snapshot, with ``term IN (...)`` absorbed into the
scan (shown as ``PushedFilters`` in the plan, applied as a pyarrow
predicate with row-group pruning on the term-sorted files) and segment
pruning done at partition planning time.

This replaces the per-call ``spark.read.parquet`` + post-filter union
that the distributed query paths used before round 5: many-segment
stores paid dataset discovery per query and the plan carried one scan
node per layout with a residual Filter. It is the Spark-native analog of
the per-segment term-dictionary lookup the reference delegates to Lucene
behind ``_search`` (helper/OpenSearchHelperClient.java:106-109).

Design notes (100 TB lens):

- The **driver pins the snapshot**: the caller resolves the committed
  manifest once and passes the explicit (seg, file) list in the scan
  options, so a scan never races a concurrent commit and never re-lists
  directories on executors.
- **One InputPartition per data file** — at full scale each segment's
  postings are multiple row-group-pruned files, so scan parallelism
  tracks the file count, and tasks read only the row groups whose
  [min,max] term range intersects the query terms (the packer writes
  term-sorted files precisely for this).
- **Arrow end-to-end**: partitions yield pyarrow RecordBatches straight
  from the parquet reader — no Python row materialization.
- Requires ``spark.sql.python.filterPushdown.enabled=true`` (runtime
  settable); callers fall back to the classic union read when the conf
  cannot be enabled.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
)

POSTINGS_DDL = (
    "term string, seg string, df bigint, max_tf bigint, "
    "doc_ids binary, tfs binary, dls binary, block_max binary"
)
POSITIONS_DDL = (
    "term string, seg string, part bigint, n_docs bigint, "
    "doc_ids binary, pos_counts binary, positions binary, "
    "blk_max_doc binary, blk_lens binary"
)
_DDL = {"postings": POSTINGS_DDL, "positions": POSITIONS_DDL}

FILES_PER_TASK = 8  # partition granularity: files bundled per scan task


def segment_files(store, metas, kind: str) -> list[tuple[str, str]]:
    """(seg_name, parquet_file) pairs for the pinned segment metas —
    driver-side discovery, cacheable by the caller (file sets of
    committed segments are immutable)."""
    import pyarrow.dataset as pads

    out: list[tuple[str, str]] = []
    for m in metas:
        root = (
            f"{m.path}/{kind}.parquet/seg={m.name}"
            if m.path
            else f"{store.segment_path(m.name)}/{kind}.parquet"
        )
        try:
            dset = pads.dataset(root, format="parquet")
        except FileNotFoundError:
            continue  # e.g. positions-off segment
        out.extend((m.name, f) for f in dset.files)
    return out


class _SegmentScanReader(DataSourceReader):
    def __init__(self, options):
        self.kind = options["kind"]
        self.files: list[tuple[str, str]] = json.loads(options["files"])
        self.terms: list[str] | None = None

    def _restrict_terms(self, values: list[str]) -> None:
        # successive term predicates intersect (term = 'x' AND term IN
        # (...)): claiming both while keeping only the last would return
        # rows the dropped predicate excludes
        if self.terms is None:
            self.terms = list(values)
        else:
            keep = set(values)
            self.terms = [t for t in self.terms if t in keep]

    def pushFilters(self, filters):  # noqa: N802 (API name)
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("term",):
                self._restrict_terms([f.value])
            elif isinstance(f, In) and f.attribute == ("term",):
                self._restrict_terms(list(f.value))
            elif isinstance(f, EqualTo) and f.attribute == ("seg",):
                self.files = [p for p in self.files if p[0] == f.value]
            elif isinstance(f, In) and f.attribute == ("seg",):
                keep = set(f.value)
                self.files = [p for p in self.files if p[0] in keep]
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self):
        # bundle a segment's files into one partition (capped at
        # FILES_PER_TASK) — scan tasks are not free, and a query's rows
        # per file are row-group-pruned anyway; big segments still split
        # across tasks for parallelism
        by_seg: dict[str, list[str]] = {}
        for seg, path in self.files:
            by_seg.setdefault(seg, []).append(path)
        parts = []
        for seg, paths in sorted(by_seg.items()):
            for i in range(0, len(paths), FILES_PER_TASK):
                parts.append(
                    InputPartition(
                        (seg, paths[i:i + FILES_PER_TASK], self.terms)
                    )
                )
        return parts or [InputPartition(("", [], self.terms))]

    def read(self, partition) -> Iterator:
        import pyarrow as pa
        import pyarrow.dataset as pads

        seg, paths, terms = partition.value
        if not paths:
            return
        cols = [c.strip().split(" ")[0]
                for c in _DDL[self.kind].split(",")]
        dset = pads.dataset(paths, format="parquet")
        flt = pads.field("term").isin(terms) if terms is not None else None
        have_seg = "seg" in dset.schema.names
        read_cols = cols if have_seg else [c for c in cols if c != "seg"]
        for b in dset.to_batches(columns=read_cols, filter=flt):
            if not have_seg:
                b = pa.RecordBatch.from_arrays(
                    list(b.columns)
                    + [pa.array([seg] * b.num_rows, type=pa.string())],
                    names=read_cols + ["seg"],
                )
            # normalize column order to the declared schema
            yield pa.RecordBatch.from_arrays(
                [b.column(b.schema.get_field_index(c)) for c in cols],
                names=cols,
            )


class SegmentScanDataSource(DataSource):
    """``spark.read.format("kcos_segments")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "kcos_segments"

    def schema(self) -> str:
        return _DDL[self.options["kind"]]

    def reader(self, schema) -> _SegmentScanReader:
        return _SegmentScanReader(self.options)


def scan_df(spark, kind: str, files: list[tuple[str, str]]):
    """Build the one-scan-node DataFrame over the given pinned file set.
    Raises if the Python-datasource pushdown conf cannot be enabled —
    callers catch and fall back to the classic union read."""
    conf = "spark.sql.python.filterPushdown.enabled"
    if spark.conf.get(conf, "false") != "true":
        spark.conf.set(conf, "true")
    spark.dataSource.register(SegmentScanDataSource)
    return (
        spark.read.format("kcos_segments")
        .option("kind", kind)
        .option("files", json.dumps(files))
        .load()
    )
