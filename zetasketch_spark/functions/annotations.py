"""Sketch-column annotations: the warehouse-discovery surface.

The reference tags proto fields that carry serialized aggregators with a
`(zetasketch.aggregator)` option so analysis tools can recognize them
(`proto/annotation.proto:17-36`, `proto/unique-stats.proto`). The
Spark-native analog is column metadata: it rides on the StructField,
survives a parquet round trip (Spark persists field metadata in the
parquet schema), and is visible to any reader of the table — which is the
whole point of the annotation.

* ``annotate_sketch_column(df, col, ...)`` — tag a binary column as a
  serialized aggregator (type + value_type + precision).
* ``sketch_columns(df_or_schema)`` — discovery: every annotated column
  with its parsed annotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

ANNOTATION_KEY = "zetasketch.aggregator"

# AggregatorType / DefaultOpsType numbers from proto/aggregator.proto
HYPERLOGLOG_PLUS_UNIQUE = 112
VALUE_TYPE_NAMES = {
    7: "UINT32", 8: "UINT64", 9: "FLOAT", 10: "DOUBLE",
    11: "BYTES_OR_UTF8_STRING",
}


def annotate_sketch_column(df: DataFrame, col: str,
                           aggregator_type: int = HYPERLOGLOG_PLUS_UNIQUE,
                           value_type: int = 0,
                           precision: int | None = None) -> DataFrame:
    """Attach the sketch annotation to ``col`` (binary serialized states).
    Custom value types use their registry id (> 1000)."""
    meta = {"type": aggregator_type, "value_type": value_type}
    if precision is not None:
        meta["precision"] = precision
    return df.withMetadata(col, {ANNOTATION_KEY: meta})


def sketch_columns(schema_or_df) -> dict[str, dict]:
    """Discover annotated sketch columns: {column name: annotation dict}."""
    schema: StructType = (schema_or_df.schema
                          if isinstance(schema_or_df, DataFrame)
                          else schema_or_df)
    out: dict[str, dict] = {}
    for f in schema.fields:
        md = f.metadata or {}
        if ANNOTATION_KEY in md:
            out[f.name] = dict(md[ANNOTATION_KEY])
    return out
