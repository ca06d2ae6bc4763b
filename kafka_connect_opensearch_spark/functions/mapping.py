"""Schema → index-mapping translation (reference S5/D8: Mapping.java).

``opensearch_mapping`` re-expresses ``Mapping.buildMapping``
(Mapping.java:63-153) over Spark ``StructType``: the type table of
Mapping.java:226-249, the ``text`` + ``keyword``/``ignore_above:256``
multi-field for strings (:106-118), MAP → object with properties.key/value
(:120-137), and default values as ``null_value`` (:170-202, not supported
for text/binary :196-199). The dict is what gets persisted as the index's
mapping metadata; the inverse of the table lives in SURVEY.md §1.2a.

``infer_schema_of_json`` is the dynamic-mapping path (schema.ignore=true,
OpenSearchSinkConnectorConfig.java:180-189): OpenSearch infers mappings
from raw JSON; here Spark infers a StructType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

KEYWORD_IGNORE_ABOVE = 256  # Mapping.java:117

_PRIMITIVES: list[tuple[type, str]] = [
    (T.BooleanType, "boolean"),
    (T.ByteType, "byte"),
    (T.ShortType, "short"),
    (T.IntegerType, "integer"),
    (T.LongType, "long"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.BinaryType, "binary"),
    (T.DateType, "date"),
    (T.TimestampType, "date"),
    (T.TimestampNTZType, "date"),
]


class MappingError(ValueError):
    pass


def _field_mapping(dtype: T.DataType, default=None) -> dict:
    if isinstance(dtype, T.StringType):
        # text + keyword multi-field (Mapping.java:106-118); strings cannot
        # carry null_value defaults (:196-199)
        if default is not None:
            raise MappingError("default values are not supported for text fields")
        return {
            "type": "text",
            "fields": {
                "keyword": {
                    "type": "keyword",
                    "ignore_above": KEYWORD_IGNORE_ABOVE,
                }
            },
        }
    if isinstance(dtype, T.DecimalType):
        out = {"type": "double"}  # Decimal → double (Mapping.java:217-218)
        if default is not None:
            out["null_value"] = float(default)
        return out
    for py_t, os_t in _PRIMITIVES:
        if isinstance(dtype, py_t):
            out = {"type": os_t}
            if default is not None and os_t not in ("binary",):
                out["null_value"] = default
            return out
    if isinstance(dtype, T.ArrayType):
        # arrays are implicit in OpenSearch: element mapping (Mapping.java:92-93)
        return _field_mapping(dtype.elementType)
    if isinstance(dtype, T.MapType):
        # object with properties.key / properties.value (Mapping.java:120-137)
        return {
            "properties": {
                "key": _field_mapping(dtype.keyType),
                "value": _field_mapping(dtype.valueType),
            }
        }
    if isinstance(dtype, T.StructType):
        return {
            "properties": {
                f.name: _field_mapping(
                    f.dataType, (f.metadata or {}).get("default")
                )
                for f in dtype.fields
            }
        }
    raise MappingError(f"unsupported type for mapping: {dtype.simpleString()}")


def opensearch_mapping(schema: T.StructType | None) -> dict:
    """StructType → mapping dict (raises on None like Mapping.java:64-66)."""
    if schema is None:
        raise MappingError("schema cannot be null")
    return _field_mapping(schema)


def infer_schema_of_json(
    spark: SparkSession, df: DataFrame, json_col: str, sample: int = 1000
) -> T.StructType:
    """Dynamic-mapping path (schema.ignore=true): infer the schema from the
    JSON payload column, driver-side over a bounded sample."""
    sample_rows = [
        r[0] for r in df.select(json_col).limit(sample).collect() if r[0]
    ]
    return spark.read.json(
        spark.sparkContext.parallelize(sample_rows)
    ).schema
