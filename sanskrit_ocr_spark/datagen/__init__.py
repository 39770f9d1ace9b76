from sanskrit_ocr_spark.datagen.pages import (
    PAGES_SCHEMA,
    pages_df,
    pages_pandas,
)

__all__ = ["PAGES_SCHEMA", "pages_df", "pages_pandas"]
