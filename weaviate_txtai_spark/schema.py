"""Index schema definition + validation (SURVEY §2.1 S1/S2).

Reference parity: the Weaviate backend validates that an index schema
declares a ``docid`` int property and uses cosine distance, raising on
violation (``/root/reference/weaviate_txtai/ann/weaviate.py:97-118``;
tests ``tests/ann/test_weaviate.py:75-85,116-125``). We keep the same
config shape (a Weaviate-style dict) so a reference user can hand us
their schema unchanged, and map it onto a Spark ``StructType``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Mirrors the reference's DEFAULT_SCHEMA shape
# (/root/reference/weaviate_txtai/ann/weaviate.py:23-27): one class with a
# docid int property, cosine metric.
DEFAULT_SCHEMA: dict[str, Any] = {
    "class": "Document",
    "properties": [{"name": "docid", "dataType": ["int"]}],
    "vectorIndexConfig": {"distance": "cosine"},
}

# Weaviate property dataType -> Spark type (SURVEY §1.2).
_TYPE_MAP = {
    "int": LongType(),
    "number": DoubleType(),
    "text": StringType(),
    "string": StringType(),
    "blob": BinaryType(),
}


class SchemaValidationError(ValueError):
    """Raised when an index schema fails validation (parity with the
    reference's ``ValueError("Invalid schema")``, weaviate.py:115-118)."""


def is_valid_schema(schema: dict[str, Any]) -> bool:
    """True iff the schema declares a ``docid`` int property and (if a
    metric is declared) cosine distance.

    Parity: ``_is_valid_schema`` accepts a schema when it has a docid/int
    property and its vectorIndexConfig distance is cosine (or the schema
    matches the default), rejecting everything else
    (weaviate.py:97-110).
    """
    props = schema.get("properties", [])
    has_docid = any(
        p.get("name") == "docid" and "int" in p.get("dataType", []) for p in props
    )
    distance = schema.get("vectorIndexConfig", {}).get("distance", "cosine")
    return has_docid and distance == "cosine"


def validate_schema(schema: dict[str, Any]) -> None:
    if not is_valid_schema(schema):
        raise SchemaValidationError(f"Invalid schema: {schema}")


def to_struct_type(schema: dict[str, Any], vector_dim: int | None = None) -> StructType:
    """Map a Weaviate-style class schema onto the Spark row schema the
    index stores: uuid + declared properties + vector (SURVEY §1.1).
    """
    fields = [StructField("uuid", StringType(), nullable=False)]
    for prop in schema.get("properties", []):
        dtypes = prop.get("dataType", ["string"])
        spark_type = _TYPE_MAP.get(dtypes[0], StringType())
        fields.append(StructField(prop["name"], spark_type, nullable=True))
    fields.append(
        StructField("vector", ArrayType(FloatType(), containsNull=False), nullable=True)
    )
    return StructType(fields)
