"""Hot-key first-wins dedup A/B (r4 VERDICT #1: the row_number window
straggler).

On a real crawl, parked-domain/boilerplate pages produce single texts
duplicated 10^6-10^9x. A `row_number().over(Window.partitionBy(hash,
text))` first-wins dedup has NO partial aggregation: every copy of the
hot text crosses the shuffle and the whole group lands in ONE task — a
straggler holding gigabytes at 100 TB. The r5 `keep_first`
(`ops/util.py`: groupBy(xxhash64(key), key).agg(min_by(struct(*cols),
struct(order)))) keeps identical first-wins semantics but collapses each
map task's contribution to one candidate row per key BEFORE the shuffle.

This script plants the adversarial corpus — ONE text duplicated 1M times
plus 100k unique rows — and measures both shapes:
  * wall time,
  * the max-task shuffle-read skew of the dedup stage (straggler
    evidence) via the Spark REST status API.

Run: python BENCH/hotkey_ab.py    (local[32], median of 3)
"""

import json
import os
import statistics
import sys
import time
import urllib.request

from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sanskrit_ocr_spark.conf import build_spark
from sanskrit_ocr_spark.ops.util import keep_first

HOT_COPIES = int(os.environ.get("HOTKEY_COPIES", 1_000_000))
UNIQUE_ROWS = 100_000


def corpus(spark):
    hot = (spark.range(HOT_COPIES)
           .select(F.col("id").alias("doc_id"),
                   F.lit("this domain is parked free parking courtesy of "
                         "the registrar contact sales to purchase "
                         * 4).alias("text")))
    uniq = (spark.range(HOT_COPIES, HOT_COPIES + UNIQUE_ROWS)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("unique document body number "),
                             F.col("id").cast("string"),
                             F.lit(" with some filler words appended "
                                   "to reach a plausible length "
                                   * 3)).alias("text")))
    # shuffle-mix so the hot copies are spread across input partitions,
    # as crawl segments would be
    return hot.unionAll(uniq).repartition(64, "doc_id")


def window_dedup(df):
    w = Window.partitionBy(F.xxhash64("text"), "text") \
              .orderBy(F.col("doc_id").asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def minby_dedup(df):
    return keep_first(df, "text", ["doc_id"])


def window_flag(df):
    """The keep-ALL form (sub-document dedup's kept flag). No
    WindowGroupLimit applies — every copy of the hot key crosses the
    shuffle into ONE window task."""
    w = Window.partitionBy(F.xxhash64("text"), "text") \
              .orderBy(F.col("doc_id").asc())
    return (df.withColumn("kept", F.row_number().over(w) == 1)
            .groupBy("kept").count())


def markfirst_flag(df):
    from sanskrit_ocr_spark.ops.util import mark_first
    return (mark_first(df.withColumn("__h", F.xxhash64("text")),
                       "__h", ["doc_id"])
            .groupBy("kept").count())


def max_task_skew(spark, group):
    """Straggler evidence for the dedup job: over the job group's most
    shuffle-record-heavy completed stage, max vs median shuffle-read
    RECORDS per task (records, not bytes — 10^6 copies of one identical
    string LZ4-compress away the byte skew, but every row still crosses
    the wire and must be buffered decompressed in the window task) plus
    max vs median task duration."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    jobs = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"))
    stage_ids = {sid for j in jobs if j.get("jobGroup") == group
                 for sid in j.get("stageIds", [])}
    stages = [s for s in json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"))
        if s["stageId"] in stage_ids]
    stage = max(stages, key=lambda s: s.get("shuffleReadRecords", 0))
    tasks = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages/{stage['stageId']}/"
        f"{stage['attemptId']}/taskList?length=5000"))
    recs = sorted(t.get("taskMetrics", {})
                  .get("shuffleReadMetrics", {})
                  .get("recordsRead", 0) for t in tasks)
    durs = sorted(t.get("duration", 0) for t in tasks)
    return {"stage_id": stage["stageId"],
            "stage_shuffle_read_records": stage.get(
                "shuffleReadRecords", 0),
            "n_tasks": len(tasks),
            "max_task_records": max(recs) if recs else 0,
            "med_task_records": recs[len(recs) // 2] if recs else 0,
            "max_task_ms": max(durs) if durs else 0,
            "med_task_ms": durs[len(durs) // 2] if durs else 0}


def run(spark, df, fn, label):
    times, skew = [], None
    for i in range(3):
        spark.sparkContext.setJobGroup(label, label)
        t0 = time.monotonic()
        n = fn(df).count()
        times.append(time.monotonic() - t0)
        if i == 0:
            skew = max_task_skew(spark, label)
        spark.sparkContext._jvm.System.gc()
    out = {"label": label, "rows_out": n,
           "median_s": round(statistics.median(times), 2),
           "times_s": [round(x, 2) for x in times], **skew}
    print(json.dumps(out))
    return out


def main() -> int:
    # HOTKEY_COPIES=10_000_000 needs a bigger JVM: the window form
    # buffers every copy of the hot key in ONE task (that being the
    # point under measurement), which OOMs Spark's default 1g heap
    # before it can even be timed.
    mem = os.environ.get("HOTKEY_DRIVER_MEM")
    spark = build_spark(master="local[32]", shuffle_partitions=64,
                        extra={"spark.driver.memory": mem} if mem else None)
    df = corpus(spark)
    df.persist()
    df.count()  # materialize + warm
    expected = UNIQUE_ROWS + 1
    a = run(spark, df, window_dedup, "window_row_number")
    b = run(spark, df, minby_dedup, "keep_first_min_by")
    assert a["rows_out"] == b["rows_out"] == expected, \
        (a["rows_out"], b["rows_out"], expected)
    c = run(spark, df, window_flag, "window_kept_flag")
    d = run(spark, df, markfirst_flag, "mark_first_join")
    assert c["rows_out"] == d["rows_out"] == 2, (c["rows_out"],
                                                 d["rows_out"])
    print(json.dumps({
        "filter_form_speedup": round(a["median_s"] / b["median_s"], 2),
        "flag_form_speedup": round(c["median_s"] / d["median_s"], 2),
        "window_flag_max_task_records": c["max_task_records"],
        "mark_first_max_task_records": d["max_task_records"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
