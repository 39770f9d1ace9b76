"""sanskrit_ocr_spark — a PySpark-native main-content extraction engine.

A from-scratch rebuild of the data-processing capabilities of
KhoomeiK/sanskrit-ocr (reference at /root/reference, MIT) as an idiomatic
Spark pipeline over Common-Crawl-style page tables:

* ``kernels``   — pure-Python extraction kernels (no Spark): Devanagari
  post-processing, jusText/Boilerpipe-style HTML boilerplate stripping,
  pdfminer-style XY-cut layout analysis. These compute the golden fixtures
  and run vectorized inside pandas UDFs.
* ``datagen``   — deterministic seeded synthetic ``pages`` corpus generator
  (the inverse of the reference's render pipeline,
  ``datagen/augmentations/render_text.py``).
* ``extract``   — the Spark pipeline: ``mapInPandas`` extraction stage,
  explicit schemas, salted repartitioning, lineage aggregation.
* ``tables``    — "icelite": a minimal snapshot/commit parquet table layer
  providing append, MERGE-on-key idempotent resume, and time-travel-free
  atomic commits (Iceberg stand-in for this sandbox).
* ``ops``       — relational operator library mirroring the reference's
  dataflow operators (SURVEY.md §2) plus training-data-pipeline extras
  (dedup family, similarity search, text analysis, multimodal stubs).
"""

__version__ = "0.1.0"
