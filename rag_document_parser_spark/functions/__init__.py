from rag_document_parser_spark.functions import detect, metadata, text

__all__ = ["detect", "metadata", "text"]
