"""WARC-style ingestion — the Common-Crawl file format, stdlib-only.

The north_star input is an Iceberg table of CC-style pages, but the table
has to come from somewhere: Common Crawl ships WARC files — a stream of
records, each compressed as its OWN gzip member and concatenated (that
per-record framing is what makes a 1 GB segment streamable and
record-seekable). This module implements the subset the pipeline needs:

* ``write_warc`` — serialize ``(url, warc_ts, html)`` rows as minimal
  WARC/1.0 ``response`` records, one gzip member each (datagen/tests);
* ``read_warc``  — a Spark reader: ``binaryFile`` source (one task per
  WARC file — a CC crawl is tens of thousands of segment files, which IS
  the parallelism) → Arrow-batched ``mapInPandas`` that walks the gzip
  members with a streaming ``zlib.decompressobj`` (O(record) memory,
  ``unused_data`` hands over the next member) and parses the WARC headers.

Scale notes: no shuffle — the reader is scan + flatMap-shaped; records
inherit the file's split. Malformed members/headers surface as rows with
``url = NULL`` rather than killing the task (the caller can count them
into lineage), mirroring the pipeline's no-silent-drops rule.
"""

from __future__ import annotations

import gzip
import io
import os
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"


def _record_bytes(url: str, warc_ts: datetime, payload: bytes,
                  warc_type: str = "response") -> bytes:
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {warc_ts.strftime(WARC_DATE_FMT)}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def write_warc(path: str, records: list[tuple[str, datetime, bytes]]) -> None:
    """Write records as concatenated one-record gzip members (the CC
    framing). Single-process — datagen/test fixture writer."""
    with open(path, "wb") as f:
        for url, warc_ts, payload in records:
            f.write(gzip.compress(_record_bytes(url, warc_ts, payload),
                                  mtime=0))


def _iter_members_spans(blob: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Decompress each concatenated gzip member in turn — O(member)
    memory — yielding ``(offset, compressed_length, decompressed_bytes)``
    so callers can build a CDX-style seek index over the members.

    A corrupt member mid-file must not discard the already-decoded prefix
    (no-silent-drops): the valid members are yielded as they decode, and
    the unreadable tail surfaces as ONE empty member (→ a NULL row the
    caller counts), after which iteration stops — resynchronizing inside
    corrupt gzip data is not possible."""
    pos = 0
    n = len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        try:
            out = d.decompress(blob[pos:])
            out += d.flush()
        except zlib.error:
            yield pos, n - pos, b""  # unreadable tail → one parse-fail row
            return
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:
            yield pos, n - pos, out
            return  # garbage tail: stop rather than loop forever
        yield pos, consumed, out
        pos += consumed


def _iter_members(blob: bytes) -> Iterator[bytes]:
    for _, _, out in _iter_members_spans(blob):
        yield out


def _parse_record(rec: bytes, warc_type: str = "response",
                  ) -> tuple[str | None, datetime | None, bytes | None]:
    try:
        head_end = rec.index(b"\r\n\r\n")
        headers = {}
        lines = rec[:head_end].decode("utf-8", "replace").split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return None, None, None
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        if headers.get("warc-type") != warc_type:
            return None, None, None
        url = headers["warc-target-uri"]
        ts = datetime.strptime(headers["warc-date"], WARC_DATE_FMT)
        length = int(headers["content-length"])
        payload = rec[head_end + 4:head_end + 4 + length]
        if len(payload) != length:
            return None, None, None
        return url, ts, payload
    except (ValueError, KeyError, IndexError):
        return None, None, None


def read_warc(spark: SparkSession, path: str,
              warc_type: str = "response") -> DataFrame:
    """WARC files under ``path`` → DataFrame ``(url, warc_ts, html)``.

    One input task per file (``binaryFile``); records explode out of the
    per-file Arrow batch. Unparseable members (or records of another
    WARC-Type) yield ``url IS NULL`` rows so ingestion failures are
    countable, never silent. ``warc_type="conversion"`` reads WET-style
    extracted-text segments (payload = UTF-8 text bytes).
    """
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc.gz")
             .load(path)
             .select("content"))
    return _records_df(files, warc_type)


def _records_df(files: DataFrame, warc_type: str) -> DataFrame:
    """``(content binary)`` file rows → exploded WARC records. Shared by
    the batch (``read_warc``) and streaming (``stream_warc``) sources —
    the record-walking stage is a stateless projection, so batch/stream
    parity is free."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, payloads = [], [], []
            for blob in pdf["content"]:
                # _iter_members keeps the valid prefix of a partially
                # corrupt segment and emits one empty member for the
                # unreadable tail — a NULL row here, never a lost prefix
                for rec in _iter_members(bytes(blob)):
                    url, ts, payload = _parse_record(rec, warc_type)
                    urls.append(url)
                    tss.append(ts)
                    payloads.append(payload)
            yield pd.DataFrame({"url": urls, "warc_ts": tss,
                                "html": payloads})

    return files.mapInPandas(
        body, schema="url string, warc_ts timestamp, html binary")


def stream_warc(spark: SparkSession, path: str,
                warc_type: str = "response",
                max_files_per_trigger: int = 16) -> DataFrame:
    """Streaming WARC source: ``readStream`` over a landing directory of
    ``*.warc.gz`` segments (the continuous Common-Crawl dump-ingestion
    scenario) with ``maxFilesPerTrigger`` back-pressure. Same record
    schema and parse behavior as ``read_warc``; each newly-landed segment
    is read exactly once per the file source's offset tracking."""
    files = (spark.readStream.format("binaryFile")
             # the binaryFile source's fixed schema, stated explicitly —
             # streaming sources refuse schema inference
             .schema("path string, modificationTime timestamp,"
                     " length long, content binary")
             .option("pathGlobFilter", "*.warc.gz")
             .option("maxFilesPerTrigger", max_files_per_trigger)
             .load(path)
             .select("content"))
    return _records_df(files, warc_type)


def build_cdx(spark: SparkSession, path: str,
              warc_type: str = "response") -> DataFrame:
    """CDX-style record index over WARC segments: one row per parseable
    record ``(url, warc_ts, segment, offset, length)`` where
    ``offset``/``length`` delimit the record's OWN gzip member inside the
    segment file — the property the per-record-gzip framing exists for.
    ``fetch_record`` then reads a single record with one ranged read + one
    member decompress, no segment scan (Common Crawl's CDX contract).

    Scale shape: same scan-only plan as ``read_warc`` (one task per
    segment, no shuffle); the index is a small table the caller sorts/
    partitions by url as needed."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc.gz")
             .load(path)
             .select("path", "content"))

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, segs, offs, lens = [], [], [], [], []
            for seg_path, blob in zip(pdf["path"], pdf["content"]):
                for off, clen, rec in _iter_members_spans(bytes(blob)):
                    url, ts, _payload = _parse_record(rec, warc_type)
                    if url is None:
                        continue  # unparseable members aren't seekable
                    urls.append(url)
                    tss.append(ts)
                    segs.append(seg_path)
                    offs.append(off)
                    lens.append(clen)
            yield pd.DataFrame({
                "url": urls, "warc_ts": tss, "segment": segs,
                "offset": pd.array(offs, dtype="int64"),
                "length": pd.array(lens, dtype="int64"),
            })

    return files.mapInPandas(
        body, schema="url string, warc_ts timestamp, segment string,"
                     " offset long, length long")


def fetch_record(segment: str, offset: int, length: int,
                 warc_type: str = "response",
                 ) -> tuple[str | None, datetime | None, bytes | None]:
    """Random access to ONE record via its CDX entry: ranged read of the
    record's gzip member, one decompress, one header parse — O(record),
    independent of segment size."""
    seg = segment
    if seg.startswith("file:"):
        seg = seg[len("file:"):]
    with open(seg, "rb") as f:
        f.seek(offset)
        member = f.read(length)
    rec = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS).decompress(member)
    return _parse_record(rec, warc_type)


def write_wet(df: DataFrame, out_dir: str, prefix: str = "wet") -> DataFrame:
    """Distributed WET-style export: ``(url, warc_ts, text)`` → one
    ``.warc.gz`` segment file PER PARTITION of ``conversion`` records
    (Common Crawl's extracted-text companion format to WARC; same
    one-gzip-member-per-record framing, so the segments are streamable
    and record-seekable, and ``read_warc(..., warc_type="conversion")``
    reads them back).

    Returns a summary DataFrame ``(path, n_records)`` — one row per
    written segment. Scale shape: a pure map over partitions (no shuffle,
    no driver data); segment count = partition count, so the caller sizes
    segments with ``repartition`` exactly like any file sink. File names
    carry a uuid: concurrent/retried tasks can never clobber each other
    (same discipline as icelite staging)."""
    import uuid as _uuid

    os.makedirs(out_dir, exist_ok=True)

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        path = None
        f = None
        n = 0
        for pdf in batches:
            if f is None and len(pdf):
                path = os.path.join(
                    out_dir, f"{prefix}-{_uuid.uuid4().hex[:12]}.warc.gz")
                f = open(path, "wb")
            for url, ts, text in zip(pdf["url"], pdf["warc_ts"],
                                     pdf["text"]):
                rec = _record_bytes(url, ts.to_pydatetime(),
                                    str(text).encode("utf-8"),
                                    warc_type="conversion")
                f.write(gzip.compress(rec, mtime=0))
                n += 1
        if f is not None:
            f.close()
            yield pd.DataFrame({"path": [path], "n_records": [n]})

    return (df.select("url", "warc_ts", "text")
            .mapInPandas(body, schema="path string, n_records long"))
