"""rag_document_parser_spark — a from-scratch, PySpark-native extraction engine.

Re-expresses the capabilities of the reference single-node document parser
(Saad-ISAA/RAG-document-parser) as one Iceberg/parquet-backed DataFrame job:

- input:  documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)
- output: same + spans_clean (cleaned, reading-order-sorted span sequence),
          route/success/error status columns, per-doc content hash
- side:   lineage(partition_id, doc_count, checksum, wall_ms) metrics table
          enabling checkpoint-based idempotent resume

Design principles (see SURVEY.md):
- DataFrame / Catalyst first; Python only via Arrow-vectorized kernels
  (``mapInArrow`` over whole record batches — never per-row Python).
- Salted repartitioning on ``xxhash64(doc_id)`` for skew resilience.
- Every operator has a golden-oracle contract (``corpus.py``) and, where
  SQL-expressible, a DuckDB oracle in ``__spark_entry__.py``.
"""

from rag_document_parser_spark.config import ExtractConfig
from rag_document_parser_spark.schema import (
    SPAN_STRUCT,
    INPUT_SCHEMA,
    OUTPUT_SCHEMA,
    LINEAGE_SCHEMA,
)

__all__ = [
    "ExtractConfig",
    "SPAN_STRUCT",
    "INPUT_SCHEMA",
    "OUTPUT_SCHEMA",
    "LINEAGE_SCHEMA",
]

__version__ = "0.1.0"
