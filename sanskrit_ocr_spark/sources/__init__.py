"""Input-source readers beyond parquet/icelite (SURVEY.md §2.1 family)."""

from sanskrit_ocr_spark.sources.warclite import read_warc, write_warc

__all__ = ["read_warc", "write_warc"]
