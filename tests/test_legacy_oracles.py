"""Building-block ops that were folded into driver composites (r3 VERDICT
#1 registry consolidation) stay oracle-pinned here: each is still compared
against its own DuckDB SQL at sf0.001 with the same normalization the
driver applies."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from sanskrit_ocr_spark.ops.relational import EXTRA_ORACLES
from sanskrit_ocr_spark.ops.textstats import LEGACY_ORACLES

ALL_ORACLES = {**LEGACY_ORACLES, **EXTRA_ORACLES}

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for tbl in ("documents", "events"):
        c.sql(f"create view {tbl} as select * from '{SF}/{tbl}.parquet'")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "fn", sorted(ALL_ORACLES, key=lambda f: f.__name__),
    ids=lambda f: f.__name__)
def test_legacy_oracle_parity(spark, con, fn):
    sdf = _norm(fn(spark, SF).toPandas())
    ddf = _norm(con.sql(ALL_ORACLES[fn]).df())
    assert list(sdf.columns) == list(ddf.columns)
    assert len(sdf) == len(ddf)
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            assert np.array_equal(a.astype(float).to_numpy(),
                                  b.astype(float).to_numpy(),
                                  equal_nan=True), f"float column {c}"
        else:
            pd.testing.assert_series_equal(
                a.astype(str), b.astype(str), check_names=False,
                obj=f"column {c}")


def test_range_join_non_vacuous_and_hash_planned(spark):
    """The range join must actually match windows (the parity test alone
    would pass vacuously on an empty result) and must plan as a granule
    hash join, never a nested-loop all-pairs."""
    import contextlib
    import io

    from sanskrit_ocr_spark.ops.relational import w4_range_join

    df = w4_range_join(spark, SF)
    assert df.count() > 100
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "NestedLoop" not in plan
    assert "hashpartitioning" in plan or "BroadcastHashJoin" in plan
