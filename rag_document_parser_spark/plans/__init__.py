from rag_document_parser_spark.plans.job import run_job, chunk_giant_docs, read_lineage

__all__ = ["run_job", "chunk_giant_docs", "read_lineage"]
