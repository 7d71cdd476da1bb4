from rag_document_parser_spark.operators.extract_arrow import extract_arrow
from rag_document_parser_spark.operators.extract_catalyst import extract_catalyst
from rag_document_parser_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
)
from rag_document_parser_spark.operators.sheets import sheet_structure

__all__ = ["extract_arrow", "extract_catalyst", "hash_sample",
           "sheet_structure", "stratified_sample"]
