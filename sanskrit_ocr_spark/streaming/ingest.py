"""Structured Streaming ingestion: continuously extract newly-landed pages.

The reference's "streaming" is resumable *batch* (offset-skip resume,
``translate_bookcorpus.py:43-44,79``; SURVEY.md §2.12), and the primary
rebuild path keeps that shape (icelite MERGE — ``extract/job.py``). This
module adds the genuinely-streaming variant for deployments where page
files land continuously (the Common-Crawl dump-ingestion scenario):

* ``readStream`` file source over a pages directory (parquet), with
  ``maxFilesPerTrigger`` back-pressure;
* the SAME ``extract_pages`` mapInPandas stage — batch/streaming parity is
  free because the stage is a stateless projection;
* ``foreachBatch`` commits each micro-batch through the icelite
  MERGE-on-url, so the streaming path shares the batch path's idempotence
  and lineage (exactly-once effect via at-least-once delivery + key-level
  dedup — the standard Spark streaming sink discipline);
* checkpointing via Spark's streaming checkpoint dir (source offsets) ON
  TOP of MERGE idempotence — either alone suffices for correctness, both
  together minimize reprocessing.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import SparkSession

from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
    TimestampType,
)

from sanskrit_ocr_spark.extract.job import (
    audit_tallies,
    extracted_table,
    lineage_table,
    sync_publish_branch,
)
from sanskrit_ocr_spark.extract.pipeline import (
    PAGES_INPUT_SCHEMA,
    extract_pages,
    lineage_rows,
)

# quarantine log for audit-rejected micro-batches: one row per
# (batch, fail code) with the batch's failure rate — rejected batches
# are consumed (their offsets checkpoint; retrying a deterministic
# parse failure would loop forever) but never SILENTLY dropped
REJECTED_SCHEMA = StructType([
    StructField("batch_id", LongType(), False),
    StructField("fail_code", StringType(), False),
    StructField("fail_count", LongType(), False),
    StructField("fail_rate", DoubleType(), False),
    StructField("audited_at", TimestampType(), False),
])


def rejected_table(spark: SparkSession, root: str):
    from sanskrit_ocr_spark.tables.icelite import IceliteTable

    return IceliteTable(spark, f"{root}/rejected", REJECTED_SCHEMA)


def start_ingest(spark: SparkSession, pages_dir: str, root: str,
                 checkpoint_dir: str, max_files_per_trigger: int = 16,
                 available_now: bool = False, recrawl: bool = False,
                 on_batch_committed=None, curate_root: str | None = None,
                 audit_max_fail_rate: float | None = None,
                 publish_branch: str | None = None):
    """Start the streaming extraction job; returns the StreamingQuery.

    ``available_now=True`` drains everything currently in ``pages_dir`` and
    stops (used by tests and backfills); otherwise runs continuously.
    ``recrawl=True`` commits each micro-batch through the merge-on-read
    upsert instead of the insert-only MERGE: re-landed urls REPLACE their
    older rows (last-batch-wins, like the batch CLI's ``--recrawl``), and
    at-least-once redelivery stays harmless because replaying a batch
    re-upserts identical content under the same keys.

    **Write-audit-publish per micro-batch** (``audit_max_fail_rate`` /
    ``publish_branch``): each micro-batch's commit is STAGED, audited on
    its failure rate, and either published (the branch fast-forwards)
    or rolled back. A rejected batch is quarantined, not retried — its
    offsets still checkpoint (a deterministic parse failure would
    otherwise redeliver forever) and its tallies are logged to the
    ``{root}/rejected`` icelite table, so a poisoned crawl dump stalls
    the published corpus without poisoning it OR wedging the stream.
    """
    stream = (spark.readStream
              .schema(PAGES_INPUT_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(pages_dir))
    return _start_extract_stream(spark, stream, root, checkpoint_dir,
                                 available_now, recrawl,
                                 on_batch_committed, curate_root,
                                 audit_max_fail_rate, publish_branch)


def start_warc_ingest(spark: SparkSession, warc_dir: str, root: str,
                      checkpoint_dir: str, max_files_per_trigger: int = 16,
                      available_now: bool = False, recrawl: bool = False,
                      on_batch_committed=None,
                      curate_root: str | None = None,
                      audit_max_fail_rate: float | None = None,
                      publish_branch: str | None = None):
    """Streaming extraction straight off a WARC segment landing directory
    — the end-to-end continuous Common-Crawl shape: ``stream_warc``
    (binaryFile source + member-walking records stage) → the SAME
    ``extract_pages`` stage and MERGE-on-url committer as the batch CLI's
    ``--input-warc`` path. Unparseable records (``url IS NULL``) are
    dropped exactly as the batch path drops them."""
    from pyspark.sql import functions as F

    from sanskrit_ocr_spark.sources.warclite import stream_warc

    records = (stream_warc(spark, warc_dir,
                           max_files_per_trigger=max_files_per_trigger)
               .filter(F.col("url").isNotNull()))
    return _start_extract_stream(spark, records, root, checkpoint_dir,
                                 available_now, recrawl,
                                 on_batch_committed, curate_root,
                                 audit_max_fail_rate, publish_branch)


def _start_extract_stream(spark: SparkSession, pages_stream, root: str,
                          checkpoint_dir: str, available_now: bool,
                          recrawl: bool = False,
                          on_batch_committed=None,
                          curate_root: str | None = None,
                          audit_max_fail_rate: float | None = None,
                          publish_branch: str | None = None):
    ext = extracted_table(spark, root)
    lin = lineage_table(spark, root)
    if publish_branch is not None:
        # branch = source of truth before the stream starts: adopt a
        # pre-WAP table, and discard any staging a crash left above the
        # branch (same recovery contract as the batch job)
        sync_publish_branch(ext, publish_branch, lin=lin)

    extracted = extract_pages(pages_stream)

    def commit_batch(batch_df, batch_id: int) -> None:
        # foreachBatch hands us a normal DataFrame: reuse the batch path.
        # DISK_ONLY for the same reason as extract/job.py — the nested
        # sentences column makes the columnar cache build GC-heavy.
        from pyspark import StorageLevel

        batch_df = batch_df.persist(StorageLevel.DISK_ONLY)
        try:
            if batch_df.isEmpty():
                # an empty micro-batch (e.g. a recrawl trigger with no new
                # files) must not churn a new snapshot: committing would
                # add an empty data file, an empty equality-delete file,
                # a lineage row, and one permanent MOR anti-join to every
                # read until the next compact()
                return
            pre_sid = ext.snapshot_id()
            if recrawl:
                sid, _ = ext.merge_upsert_mor(batch_df, "url",
                                              order_col="warc_ts")
            else:
                sid, _ = ext.merge_on_key(batch_df, "url",
                                          order_col="warc_ts")
            if audit_max_fail_rate is not None:
                tallies, rate = audit_tallies(batch_df)
                if rate > audit_max_fail_rate:
                    # REJECT: erase the staged snapshot, quarantine the
                    # batch's tallies (one row per fail code), and let
                    # the offsets checkpoint — the batch is consumed,
                    # never published, never silently dropped
                    ext.rollback_to(pre_sid)
                    now = datetime.now(timezone.utc)
                    rejected_table(spark, root).append(
                        spark.createDataFrame(
                            [(int(batch_id), code, int(n), float(rate),
                              now) for code, n in sorted(tallies.items())],
                            REJECTED_SCHEMA))
                    return
            lin.append(lineage_rows(
                batch_df, snapshot_id=sid,
                committed_at=datetime.now(timezone.utc)))
            if curate_root is not None:
                # continuous curation: the crawl -> extract -> curated-
                # corpus pipeline in ONE streaming job. Incremental by
                # construction — curate_table's watermark picks up
                # exactly the snapshots this (and any missed prior)
                # batch committed, and the content-hash MERGE keeps
                # at-least-once batch replay idempotent end to end.
                # With recrawl=True the curation RETRACTS corpus rows
                # superseded by re-crawled urls (curate_table retract
                # contract: the corpus mirrors the latest crawl state,
                # never a both-versions content log).
                from sanskrit_ocr_spark.extract.curate import curate_table

                curate_table(spark, curate_root, ext)
            if publish_branch is not None:
                # accepted: publish by fast-forwarding the branch (after
                # lineage + curation so a consumer at the branch always
                # finds the matching lineage rows)
                ext.set_branch(publish_branch, sid)
            if on_batch_committed is not None:
                # test/metrics seam, invoked AFTER the table commit and
                # BEFORE Spark records the batch's offsets in the
                # streaming checkpoint — raising here simulates a crash
                # in exactly the window the MERGE-on-url idempotence
                # exists for (the batch is re-delivered on restart)
                on_batch_committed(batch_id)
        finally:
            batch_df.unpersist()

    writer = (extracted.writeStream
              .foreachBatch(commit_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
