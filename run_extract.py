#!/usr/bin/env python
"""Cluster entry point for ``spark-submit --py-files dist/sanskrit_ocr_spark.zip``.

Thin shim over ``sanskrit_ocr_spark.extract.__main__`` so the job runs the
same whether launched as ``python -m sanskrit_ocr_spark.extract`` locally or
via spark-submit on a cluster (where the session master comes from the
submit command, not ``--master``).
"""

import sys

from sanskrit_ocr_spark.extract.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
