from rag_document_parser_spark.sources.readers import (
    read_documents,
    read_binary_docs,
    read_csv_capped,
    write_json_results,
    export_tables_csv,
)
from rag_document_parser_spark.sources.decode import decode_text_payloads

__all__ = [
    "read_documents",
    "read_binary_docs",
    "read_csv_capped",
    "write_json_results",
    "export_tables_csv",
    "decode_text_payloads",
]
