"""weaviate_txtai_spark — a PySpark-native batch vector/analytics engine.

Re-expresses the query and data-processing capabilities of the reference
``hsm207/weaviate-txtai`` (a txtai ANN backend for Weaviate,
``/root/reference/weaviate_txtai/ann/weaviate.py``) as idiomatic Spark
DataFrame / SQL plans, and extends them with the batch LLM-data-pipeline
operators a 100 TB training-data pipeline needs: near-duplicate detection,
similarity joins, ANN search, text analysis, multimodal columns, and
streaming ingest.

Design rules (see SURVEY.md §4):
- Declarative DataFrame/SQL plans; Catalyst does pushdown/pruning.
- Native column expressions in the hot path; Arrow pandas_udf / mapInPandas
  only where built-ins can't express the semantics (GEMM top-k, simhash).
- Every shuffle is deliberate: broadcast small sides, partition by join key,
  AQE for skew.
"""

from weaviate_txtai_spark.cache import cache_scope, scoped_persist
from weaviate_txtai_spark.embeddings import Embeddings, rewrite_similar_sql
from weaviate_txtai_spark.index import VectorIndex, IndexNotFoundError
from weaviate_txtai_spark.workflow import Workflows
from weaviate_txtai_spark.schema import (
    DEFAULT_SCHEMA,
    SchemaValidationError,
    is_valid_schema,
    validate_schema,
)

__version__ = "0.1.0"

__all__ = [
    "cache_scope",
    "scoped_persist",
    "Embeddings",
    "Workflows",
    "rewrite_similar_sql",
    "VectorIndex",
    "IndexNotFoundError",
    "DEFAULT_SCHEMA",
    "SchemaValidationError",
    "is_valid_schema",
    "validate_schema",
]
