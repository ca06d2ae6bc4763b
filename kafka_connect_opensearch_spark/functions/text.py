"""Topic→index/data-stream name normalization (P8/P9) as column expressions.

Reference semantics: ``OpenSearchSinkTask.convertTopicToIndexName``
(OpenSearchSinkTask.java:200-220): lowercase; truncate to 255 bytes; strip a
leading ``-`` or ``_``; an all-dots name (``.`` / ``..``) becomes ``dot`` /
``dotdot``. Data streams (OpenSearchSinkTask.java:231-243):
``{type}-{dataset}-{topic}`` lowercased and truncated to 100 chars.

Everything is built-in string functions — whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def convert_topic_to_index_name(topic: Column | str) -> Column:
    """OpenSearchSinkTask.java:200-220 re-expressed as one column expression."""
    t = F.col(topic) if isinstance(topic, str) else topic
    name = F.lower(t)
    name = F.substring(name, 1, 255)
    # strip ONE leading '-' or '_' (the reference strips a single prefix char)
    name = F.when(
        name.rlike("^[-_].*"), F.expr(f"substring({_sql(name)}, 2)")
    ).otherwise(name)
    # '.' and '..' are invalid index names → spelled out
    name = (
        F.when(name == ".", F.lit("dot"))
        .when(name == "..", F.lit("dotdot"))
        .otherwise(name)
    )
    return name


def _sql(col: Column) -> str:
    # Render a column back to SQL text for use inside F.expr. Spark 4 exposes
    # this via the private _jc; keep it contained here.
    return col._jc.toString()  # noqa: SLF001


def convert_topic_to_index_name_sql(topic_sql: str) -> str:
    """Same normalization as a plain SQL expression (usable in DuckDB too)."""
    base = f"substring(lower({topic_sql}), 1, 255)"
    # substring comparison, not LIKE: '_' is a LIKE wildcard and escape
    # syntax differs between engines (DuckDB has no default escape char)
    stripped = (
        f"(CASE WHEN substring({base}, 1, 1) IN ('-', '_') "
        f"THEN substring({base}, 2) ELSE {base} END)"
    )
    return (
        f"(CASE WHEN {stripped} = '.' THEN 'dot' "
        f"WHEN {stripped} = '..' THEN 'dotdot' ELSE {stripped} END)"
    )


def convert_topic_to_data_stream_name(
    topic: Column | str, ds_type: str, dataset: str
) -> Column:
    """OpenSearchSinkTask.java:231-243: lowercase the topic, truncate *the
    topic* to 100 chars, THEN prefix ``{type}-{dataset}-`` (the reference
    never truncates the concatenated result; type is lowercased, dataset is
    validated lowercase at config time)."""
    t = F.col(topic) if isinstance(topic, str) else topic
    truncated = F.substring(F.lower(t), 1, 100)
    return F.concat_ws(
        "-", F.lit(ds_type.lower()), F.lit(dataset), truncated
    )


def convert_topic_to_data_stream_name_sql(
    topic_sql: str, ds_type: str, dataset: str
) -> str:
    """DuckDB/ANSI twin of :func:`convert_topic_to_data_stream_name`."""
    return (
        f"('{ds_type.lower()}' || '-' || '{dataset}' || '-' || "
        f"substring(lower({topic_sql}), 1, 100))"
    )
