from sanskrit_ocr_spark.extract.pipeline import (
    EXTRACTED_SCHEMA,
    N_BUCKETS,
    extract_pages,
    lineage_rows,
)

__all__ = ["EXTRACTED_SCHEMA", "N_BUCKETS", "extract_pages", "lineage_rows"]
