"""Schema evolution (Iceberg ``ADD COLUMN`` parity): metadata-only column
adds, NULL-fill on pre-evolution files, per-snapshot schema time travel,
and schema sealing across snapshot expiry."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sanskrit_ocr_spark.tables.icelite import IceliteTable

SCHEMA_V1 = StructType([
    StructField("url", StringType(), False),
    StructField("n", LongType(), False),
])

QUALITY = StructField("quality", DoubleType(), True)


def _df(spark, rows, schema=SCHEMA_V1):
    return spark.createDataFrame(rows, schema=schema)


def test_add_column_null_fills_old_files(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "t"), SCHEMA_V1)
    sid1 = t.append(_df(spark, [("a", 1), ("b", 2)]))
    sid2 = t.add_columns([QUALITY])
    assert sid2 == sid1 + 1
    evolved = StructType(list(SCHEMA_V1.fields) + [QUALITY])
    t.append(_df(spark, [("c", 3, 0.9), ("d", 4, 0.1)], evolved))

    got = {r["url"]: (r["n"], r["quality"]) for r in t.read().collect()}
    assert got == {"a": (1, None), "b": (2, None),
                   "c": (3, 0.9), "d": (4, 0.1)}
    assert t.current_schema() == evolved

    # time travel: pre-evolution snapshot keeps the old schema (parquet
    # reads relax nullability, so compare names/types)
    old = t.read(snapshot_id=sid1)
    assert [(f.name, f.dataType) for f in old.schema.fields] \
        == [(f.name, f.dataType) for f in SCHEMA_V1.fields]
    assert old.count() == 2


def test_add_column_validation(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "t"), SCHEMA_V1)
    with pytest.raises(ValueError, match="already exists"):
        t.add_columns([StructField("url", StringType(), True)])
    with pytest.raises(ValueError, match="nullable"):
        t.add_columns([StructField("q", DoubleType(), False)])


def test_merge_on_key_after_evolution(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "t"), SCHEMA_V1)
    t.merge_on_key(_df(spark, [("a", 1), ("b", 2)]), "url")
    t.add_columns([QUALITY])
    evolved = t.current_schema()
    # a batch in the evolved schema: duplicate url 'a' must not re-insert
    sid, ins = t.merge_on_key(
        _df(spark, [("a", 9, 0.5), ("c", 3, 0.7)], evolved), "url")
    assert ins == 1
    got = {r["url"]: (r["n"], r["quality"]) for r in t.read().collect()}
    assert got == {"a": (1, None), "b": (2, None), "c": (3, 0.7)}

    # a LAGGING writer still on the old schema: its files simply lack the
    # column; reads under the evolved schema fill NULL (name resolution)
    sid, ins = t.merge_on_key(_df(spark, [("d", 4)]), "url")
    assert ins == 1
    assert t.read().filter(F.col("url") == "d").collect()[0]["quality"] is None


def test_expiry_seals_evolved_schema(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "t"), SCHEMA_V1)
    t.append(_df(spark, [("a", 1)]))
    t.add_columns([QUALITY])
    evolved = t.current_schema()
    t.append(_df(spark, [("b", 2, 0.5)], evolved))
    t.append(_df(spark, [("c", 3, 0.6)], evolved))
    # expire past the evolution commit (keep last 2 of 4 snapshots)
    expired = t.expire_snapshots(keep_last=2)
    assert expired  # the evolution commit's manifest is gone
    t2 = IceliteTable(spark, str(tmp_path / "t"), SCHEMA_V1)  # fresh handle
    assert t2.current_schema() == evolved
    got = {r["url"]: r["quality"] for r in t2.read().collect()}
    assert got == {"a": None, "b": 0.5, "c": 0.6}


def test_partitioned_table_evolution_single_scan(spark, tmp_path):
    schema = StructType(list(SCHEMA_V1.fields)
                        + [StructField("bucket", LongType(), False)])
    t = IceliteTable(spark, str(tmp_path / "t"), schema,
                     partition_cols=["bucket"])
    t.append(_df(spark, [("a", 1, 0), ("b", 2, 1)], schema))
    t.add_columns([QUALITY])
    evolved = t.current_schema()
    t.append(_df(spark, [("c", 3, 0, 0.9)], evolved))
    df = t.read()
    got = {r["url"]: r["quality"] for r in df.collect()}
    assert got == {"a": None, "b": None, "c": 0.9}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1  # still one scan post-evolution


def test_drop_column_metadata_only(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "t"), SCHEMA_V1)
    sid1 = t.append(_df(spark, [("a", 1), ("b", 2)]))
    sid2 = t.drop_columns(["n"])
    assert [f.name for f in t.current_schema().fields] == ["url"]
    assert {r["url"] for r in t.read().collect()} == {"a", "b"}
    assert "n" not in t.read().columns
    # time travel: pre-drop snapshot still projects the column
    assert {r["n"] for r in t.read(snapshot_id=sid1).collect()} == {1, 2}
    # validation
    import pytest as _pytest
    with _pytest.raises(ValueError, match="does not exist"):
        t.drop_columns(["nope"])
    with _pytest.raises(ValueError, match="every column"):
        t.drop_columns(["url"])
    # appends in the narrowed schema work; old files' extra column ignored
    t.append(spark.createDataFrame([("c",)], schema=t.current_schema()))
    assert {r["url"] for r in t.read().collect()} == {"a", "b", "c"}


def test_expiry_after_compaction_keeps_evolved_schema(spark, tmp_path):
    # append → evolve → compact → append → expire past the evolution
    # commit: the compacted manifest is the oldest retained snapshot and
    # must carry (or be sealed with) the evolved schema
    t = IceliteTable(spark, str(tmp_path / "t"), SCHEMA_V1)
    t.append(_df(spark, [("a", 1)]))
    t.add_columns([QUALITY])
    evolved = t.current_schema()
    t.append(_df(spark, [("b", 2, 0.5)], evolved))
    t.compact(target_partitions=2)
    t.append(_df(spark, [("c", 3, 0.7)], evolved))
    expired = t.expire_snapshots(keep_last=2)  # drops sids 1-3 incl. evolution
    assert expired
    t2 = IceliteTable(spark, str(tmp_path / "t"), SCHEMA_V1)
    assert [f.name for f in t2.current_schema().fields] \
        == [f.name for f in evolved.fields]
    got = {r["url"]: r["quality"] for r in t2.read().collect()}
    assert got == {"a": None, "b": 0.5, "c": 0.7}
