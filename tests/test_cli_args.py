"""CLI argument validation (no Spark session needed: every case must be
rejected by argparse before build_spark runs)."""

import pytest

from sanskrit_ocr_spark.extract.__main__ import main


@pytest.mark.parametrize("argv", [
    # r3 ADVICE: --stream-warc commits through an unpartitioned table and
    # its own merge path — batch-only layout/tuning flags must be rejected,
    # not silently ignored
    ["--stream-warc", "/tmp/x", "--root", "/tmp/y", "--partitioned"],
    ["--stream-warc", "/tmp/x", "--root", "/tmp/y",
     "--salt-partitions", "8"],
    ["--stream-warc", "/tmp/x", "--root", "/tmp/y",
     "--merge-prefilter-buckets", "1024"],
    # --checkpoint without --stream-warc is meaningless
    ["--rows", "10", "--root", "/tmp/y", "--checkpoint", "/tmp/c"],
    # the MOR upsert has no anti-join to prefilter
    ["--rows", "10", "--root", "/tmp/y", "--recrawl",
     "--merge-prefilter-buckets", "1024"],
    # --maintain is exclusive with ingestion sources and their tuning
    ["--maintain", "--rows", "10", "--root", "/tmp/y"],
    ["--maintain", "--root", "/tmp/y", "--recrawl"],
    ["--maintain", "--root", "/tmp/y", "--wet-dest", "/tmp/w"],
    ["--maintain", "--root", "/tmp/y", "--curate-dest", "/tmp/c"],
    # pre-existing guards still hold
    ["--rows", "0", "--root", "/tmp/y"],
    ["--root", "/tmp/y"],
])
def test_cli_rejects_invalid_combinations(argv):
    with pytest.raises(SystemExit) as exc:
        main(argv)
    assert exc.value.code != 0
