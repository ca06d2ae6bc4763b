"""Column-level function library (all JVM-side built-ins or Arrow UDFs)."""

from kafka_connect_opensearch_spark.functions.analysis import (  # noqa: F401
    term_frequencies,
    tokenize,
    tokenize_expr,
)
from kafka_connect_opensearch_spark.functions.text import (  # noqa: F401
    convert_topic_to_data_stream_name,
    convert_topic_to_index_name,
)
from kafka_connect_opensearch_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
