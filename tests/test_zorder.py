"""r6: z-order compaction. The measurable property under test: after a
LINEAR sort on x, a range probe on x prunes files but every file spans
y's whole range (y-probes scan everything); after a Z-ORDER rewrite on
(x, y), file-level min/max skipping prunes probes on EITHER column —
the clustering a table needs when reads come on more than one axis."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from sanskrit_ocr_spark.tables.icelite import IceliteTable

SCHEMA = StructType([
    StructField("x", LongType(), False),
    StructField("y", LongType(), False),
    StructField("payload", LongType(), False),
])

N_SIDE = 64          # 64x64 grid = 4096 rows
FILES = 16


def _grid(spark):
    # row-major grid: x varies fastest — a "natural arrival order"
    # that correlates with x but not with y
    return spark.createDataFrame(
        [(i % N_SIDE, i // N_SIDE, i) for i in range(N_SIDE * N_SIDE)],
        SCHEMA)


def _probe(t, col, lo, hi):
    """Files scanned + rows returned for a range probe via data
    skipping + the real filter."""
    df = t.read(prune={col: (lo, hi)}).filter(F.col(col).between(lo, hi))
    return len(t.read(prune={col: (lo, hi)}).inputFiles()), df.count()


def test_zorder_prunes_both_axes_linear_sort_only_one(spark, tmp_path):
    lin = IceliteTable(spark, str(tmp_path / "lin"), SCHEMA,
                       stat_cols=["x", "y"], sort_cols=["x"])
    zed = IceliteTable(spark, str(tmp_path / "zed"), SCHEMA,
                       stat_cols=["x", "y"])
    lin.append(_grid(spark))
    zed.append(_grid(spark))
    lin.compact(target_partitions=FILES)          # linear: sorted by x
    zed.compact(target_partitions=FILES, zorder=["x", "y"])
    assert len(lin.committed_files()) == FILES
    assert len(zed.committed_files()) == FILES

    want = N_SIDE * (N_SIDE // 8)                 # an eighth of the grid

    # x-probes: both layouts prune
    lin_x_files, lin_x_rows = _probe(lin, "x", 0, N_SIDE // 8 - 1)
    zed_x_files, zed_x_rows = _probe(zed, "x", 0, N_SIDE // 8 - 1)
    assert lin_x_rows == zed_x_rows == want
    assert lin_x_files <= FILES // 4
    assert zed_x_files < FILES

    # y-probes: the x-sorted table cannot skip ANY file; z-order can
    lin_y_files, lin_y_rows = _probe(lin, "y", 0, N_SIDE // 8 - 1)
    zed_y_files, zed_y_rows = _probe(zed, "y", 0, N_SIDE // 8 - 1)
    assert lin_y_rows == zed_y_rows == want
    assert lin_y_files == FILES
    assert zed_y_files <= FILES // 2

    # and the rewrite is row-preserving with identical contents
    assert sorted(map(tuple, lin.read().collect())) == \
        sorted(map(tuple, zed.read().collect()))


def test_zorder_manifest_marker_and_row_count(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "m"), SCHEMA,
                     stat_cols=["x", "y"])
    t.append(_grid(spark))
    sid = t.compact(target_partitions=4, zorder=["x", "y"])
    assert t._manifest(sid)["zordered"] == ["x", "y"]
    assert t.read().count() == N_SIDE * N_SIDE
    assert t.history()[0]["kind"] == "compact"


def test_zorder_validation(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "v"), SCHEMA)
    t.append(_grid(spark))
    with pytest.raises(ValueError):
        t.compact(zorder=["x"])                   # needs >= 2 columns
    with pytest.raises(ValueError):
        t.compact(zorder=["x", "nope"])           # unknown column
    schema_s = StructType([
        StructField("x", LongType(), False),
        StructField("s", __import__("pyspark.sql.types",
                                    fromlist=["StringType"]).StringType(),
                    False),
    ])
    ts = IceliteTable(spark, str(tmp_path / "s"), schema_s)
    ts.append(spark.createDataFrame([(1, "a"), (2, "b")], schema_s))
    with pytest.raises(ValueError):
        ts.compact(zorder=["x", "s"])             # no ordered encoding


def test_zorder_constant_column_degrades_gracefully(spark, tmp_path):
    # a constant second column contributes zero bits: the rewrite
    # degenerates to a linear x clustering, results intact
    t = IceliteTable(spark, str(tmp_path / "c"), SCHEMA,
                     stat_cols=["x"])
    t.append(spark.createDataFrame(
        [(i, 7, i) for i in range(512)], SCHEMA))
    t.compact(target_partitions=4, zorder=["x", "y"])
    files, rows = _probe(t, "x", 0, 63)
    assert rows == 64
    assert files == 1
    assert t.read().count() == 512


def test_zvalue_matches_python_reference(spark):
    """The JVM bitwise z-value equals a straight Python bit-interleave
    for random pre-scaled inputs (2 and 3 columns) — pins the shift
    arithmetic so a codegen refactor can't silently scramble the
    curve."""
    import random

    from pyspark.sql import functions as F

    from sanskrit_ocr_spark.tables.icelite import IceliteTable

    def py_z(vals, bits=16):
        z = 0
        for b in range(bits):
            for i, v in enumerate(vals):
                z |= ((v >> b) & 1) << (b * len(vals) + i)
        return z

    rng = random.Random(42)
    for ncols in (2, 3):
        rows = [tuple(rng.randrange(0, 1 << 16) for _ in range(ncols))
                for _ in range(200)]
        cols = [f"c{i}" for i in range(ncols)]
        df = spark.createDataFrame(rows, ", ".join(f"{c} long"
                                                   for c in cols))
        got = [r["z"] for r in df.select(IceliteTable._zvalue(
            [F.col(c) for c in cols]).alias("z")).collect()]
        assert got == [py_z(list(r)) for r in rows]
