"""Vector math over array<float|double> columns — JVM built-ins only.

Used by the similarity-search and embedding near-dup operators. All three
helpers compile to Catalyst ``aggregate``/``zip_with`` expressions (no Python
in the hot path); the brute-force ANN baseline therefore runs fully inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in float64 (zip_with + aggregate, codegen'd)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ in float64."""
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b); null-safe for zero vectors (returns NULL like DuckDB)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)
