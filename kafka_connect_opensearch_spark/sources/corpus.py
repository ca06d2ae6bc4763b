"""Deterministic synthetic source-code corpus (BASELINE.json input_hint).

Schema: ``(repo string, path string, commit string, lang string,
content string)`` — one row per file version. Content is a seeded token
stream mixing (a) Zipfian stopword-heavy code tokens (``return``, ``import``,
``def`` …) that exercise term-frequency skew, and (b) long-tail identifiers
``ident_{k}`` for selective queries (FIXTURES.md §A).

Generation is **distributed and partition-independent**: each row is a pure
function of its index ``i`` (a counter-free PCG stream seeded by ``i``), so
the same (sf, i) yields the same row on any executor under any partitioning.
This is how a 10^12-row corpus would be generated on a real cluster —
``spark.range`` + ``mapInPandas``, no driver materialization.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)

# Zipfian head: stopword-ish code tokens, heavily skewed.
STOPWORD_TOKENS = [
    "return", "import", "def", "class", "self", "public", "void", "if",
    "else", "for", "while", "int", "string", "new", "null", "true", "false",
    "static", "function", "var", "let", "const", "this", "print",
]
LANGS = ["py", "java", "js", "go", "rs", "md"]
LANG_WEIGHTS = np.array([0.30, 0.22, 0.20, 0.12, 0.08, 0.08])
LANG_EXT = {"py": "py", "java": "java", "js": "js", "go": "go", "rs": "rs", "md": "md"}

N_IDENTIFIERS = 5000  # long-tail vocabulary size: ident_0 .. ident_4999
STOPWORD_PROB = 0.7   # share of tokens drawn from the Zipfian head


def _gen_row(i: int) -> tuple[str, str, str, str, str]:
    """Row ``i`` of the corpus — pure, deterministic, partition-independent."""
    rng = np.random.default_rng(np.uint64(0x5EED_0000) + np.uint64(i))
    repo = f"org{i % 37}/repo{i % 101}"
    lang = LANGS[int(rng.choice(len(LANGS), p=LANG_WEIGHTS))]
    depth = int(rng.integers(1, 4))
    dirs = "/".join(f"d{int(rng.integers(0, 20))}" for _ in range(depth))
    path = f"{dirs}/file{i}.{LANG_EXT[lang]}"
    version = int(rng.integers(0, 3))
    commit = hashlib.sha1(f"{repo}/{path}/{version}".encode()).hexdigest()
    n_tokens = int(rng.integers(50, 2001))
    # Zipfian ranks over the stopword head; uniform long tail of identifiers.
    is_stop = rng.random(n_tokens) < STOPWORD_PROB
    zipf_ranks = np.minimum(
        rng.zipf(1.3, size=n_tokens) - 1, len(STOPWORD_TOKENS) - 1
    )
    ident_ids = rng.integers(0, N_IDENTIFIERS, size=n_tokens)
    toks = [
        STOPWORD_TOKENS[zipf_ranks[j]] if is_stop[j] else f"ident_{ident_ids[j]}"
        for j in range(n_tokens)
    ]
    return repo, path, commit, lang, " ".join(toks)


def generate_corpus(
    spark: SparkSession, n_docs: int, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = [_gen_row(int(i)) for i in batch["id"]]
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    numparts = partitions or max(1, min(64, n_docs // 256 or 1))
    return spark.range(0, n_docs, numPartitions=numparts).mapInPandas(
        gen, schema=CORPUS_SCHEMA
    )


def generate_corpus_pandas(n_docs: int) -> pd.DataFrame:
    """Driver-side twin of :func:`generate_corpus` for numpy oracles."""
    rows = [_gen_row(i) for i in range(n_docs)]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def corpus_schema(spark: SparkSession) -> StructType:
    return spark.createDataFrame([], CORPUS_SCHEMA).schema
