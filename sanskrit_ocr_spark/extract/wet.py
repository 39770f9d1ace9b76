"""Incremental WET export — continuous delivery of extracted text as
Common-Crawl-style ``conversion`` segments.

``--wet-dest`` re-exports the whole table every run; at a growing crawl
table the production shape is incremental: export ONLY rows added since
the last export, exactly once per url, O(new data) per run. Same design
as the incremental curation (``extract/curate.curate_table``):

* the delta comes from ``IceliteTable.read_changes`` (falls back to a
  full read across compaction/expiry boundaries);
* a sidecar icelite table of EXPORTED urls (``<root>/exported``) makes
  COMPLETED runs idempotent — the anti-join skips everything already
  shipped, so re-runs and the full-read fallback add nothing. One
  honest at-least-once window remains: a crash BETWEEN the segment
  write and the url-recording merge re-exports that delta on restart
  (the file sink is not transactional); consumers that need exact-once
  dedup on url at read time, as every MERGE-based stage here does;
* the extraction snapshot watermark rides the sidecar's commit manifest
  (``extra_meta``) atomically with the exported-url bookkeeping, and
  survives sidecar maintenance (``_carry_extra_meta``).

Segments land under ``<root>/segments`` (uuid-named, append-only,
readable back via ``read_warc(..., warc_type="conversion")``).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

EXPORTED_SCHEMA = StructType([StructField("url", StringType(), False)])


def export_wet_incremental(spark, wet_root: str, extracted) -> dict:
    """Export OK-status rows added since the last WET watermark as
    conversion segments. Returns ``{segments, records, watermark,
    exported_total}`` (zeros and an unchanged watermark when there is
    nothing new)."""
    from sanskrit_ocr_spark.sources.warclite import write_wet
    from sanskrit_ocr_spark.tables.icelite import IceliteTable

    exported = IceliteTable(spark, os.path.join(wet_root, "exported"),
                            EXPORTED_SCHEMA)

    wm = 0
    cur = exported.snapshot_id()
    while cur:
        try:
            m = exported._manifest(cur)
        except FileNotFoundError:
            break
        if "wet_watermark" in m:
            wm = m["wet_watermark"]
            break
        if m.get("full") or "files" in m:
            break
        cur = m.get("parent", 0)

    head = extracted.snapshot_id()
    if head <= wm:
        return {"segments": 0, "records": 0, "watermark": wm,
                "exported_total": exported.row_count() or 0}
    try:
        delta = extracted.read_changes(wm, head)
    except ValueError:
        # provenance below the watermark was compacted/expired: full
        # re-read — the exported-url anti-join keeps the segments
        # duplicate-free, the run is merely slower
        delta = extracted.read(head)
    ok = (delta.filter(F.col("status") == "OK")
          .select("url", "warc_ts", "text"))
    fresh = ok.join(exported.read().select("url"), "url", "left_anti")
    segs = write_wet(fresh, os.path.join(wet_root, "segments")).collect()
    n_records = int(sum(r["n_records"] for r in segs))
    if n_records:
        # record the shipped urls + watermark in ONE atomic commit: a
        # crash between write_wet and this merge re-runs the delta, and
        # the anti-join above skips the already-shipped urls
        exported.merge_on_key(ok.select("url"), "url",
                              extra_meta={"wet_watermark": head})
    return {"segments": len(segs), "records": n_records,
            "watermark": head if n_records else wm,
            "exported_total": exported.row_count() or 0}
