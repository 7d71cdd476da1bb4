from rag_document_parser_spark.functions import text

__all__ = ["text"]
