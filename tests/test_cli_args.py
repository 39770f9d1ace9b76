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
    # --history is metadata-only
    ["--history", "--root", "/tmp/y", "--curate-table", "/tmp/c"],
    ["--history", "--root", "/tmp/y", "--recrawl"],
    # --bucket-hashes shapes the --curate-table corpus only
    ["--rows", "10", "--root", "/tmp/y", "--bucket-hashes", "8"],
    ["--stream-warc", "/tmp/x", "--root", "/tmp/y",
     "--bucket-hashes", "8"],
    ["--history", "--root", "/tmp/y", "--bucket-hashes", "8"],
    ["--maintain", "--root", "/tmp/y", "--bucket-hashes", "8"],
    # --sort-ts shapes the extracted table's batch write path only
    ["--stream-warc", "/tmp/x", "--root", "/tmp/y", "--sort-ts"],
    ["--history", "--root", "/tmp/y", "--sort-ts"],
    ["--maintain", "--root", "/tmp/y", "--sort-ts"],
    # write-audit-publish gates ingestion runs only (batch or streaming)
    ["--history", "--root", "/tmp/y", "--publish-branch", "published"],
    ["--maintain", "--root", "/tmp/y", "--audit-max-fail-rate", "0.1"],
    ["--rows", "10", "--root", "/tmp/y", "--audit-max-fail-rate", "1.5"],
    ["--rows", "10", "--root", "/tmp/y", "--audit-max-fail-rate", "-0.1"],
    # --evolve-partitioning is a standalone metadata action
    ["--evolve-partitioning", "--root", "/tmp/y", "--partitioned"],
    ["--evolve-partitioning", "--root", "/tmp/y", "--rows", "10"],
    ["--evolve-partitioning", "--root", "/tmp/y", "--sort-ts"],
    ["--evolve-partitioning", "--root", "/tmp/y",
     "--publish-branch", "published"],
    # retention timestamps are --maintain actions and must parse
    ["--rows", "10", "--root", "/tmp/y", "--purge-before", "2025-01-01"],
    ["--maintain", "--root", "/tmp/y", "--purge-before", "not-a-ts"],
    ["--rows", "10", "--root", "/tmp/y",
     "--expire-older-than", "2025-01-01"],
    ["--maintain", "--root", "/tmp/y", "--expire-older-than", "nope"],
    # pre-existing guards still hold
    ["--rows", "0", "--root", "/tmp/y"],
    ["--root", "/tmp/y"],
])
def test_cli_rejects_invalid_combinations(argv):
    with pytest.raises(SystemExit) as exc:
        main(argv)
    assert exc.value.code != 0


def test_history_on_missing_table_errors_without_side_effects(tmp_path):
    """r5 review: --history on a typo'd root must error (exit 2), print
    to stderr, and create NO skeleton table tree at the bogus path."""
    import os

    bogus = str(tmp_path / "no-such-table")
    rc = main(["--history", "--root", bogus])
    assert rc == 2
    assert not os.path.exists(bogus)


def test_maintain_curate_table_missing_errors_without_side_effects(
        tmp_path):
    """r6 ADVICE: --maintain --curate-table on a typo'd corpus path must
    exit 2 BEFORE any Spark session or table construction — previously it
    mkdir'd an empty skeleton there and 'maintained' it silently."""
    import os

    bogus = str(tmp_path / "no-such-corpus")
    rc = main(["--maintain", "--root", str(tmp_path / "root"),
               "--curate-table", bogus])
    assert rc == 2
    assert not os.path.exists(bogus)


def test_maintain_accepts_curate_table(tmp_path, monkeypatch):
    """--maintain --curate-table is a VALID combination since r5 (corpus
    maintenance): argparse must accept it. Intercept at build_spark —
    actually running main() here would getOrCreate() and then STOP the
    suite's shared session (main's finally), killing every later Spark
    test."""
    import sanskrit_ocr_spark.extract.__main__ as m

    def _parsed_ok(*a, **k):
        raise RuntimeError("parsed-ok")

    monkeypatch.setattr(m, "build_spark", _parsed_ok)
    # the corpus table must EXIST to get past the r6 typo'd-path guard
    import os
    os.makedirs(str(tmp_path / "c" / "_icelite"))
    with pytest.raises(RuntimeError, match="parsed-ok"):
        m.main(["--maintain", "--root", str(tmp_path / "r"),
                "--curate-table", str(tmp_path / "c")])
