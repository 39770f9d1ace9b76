from sanskrit_ocr_spark.tables.icelite import IceliteTable

__all__ = ["IceliteTable"]
