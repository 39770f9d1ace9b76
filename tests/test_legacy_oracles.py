"""Building-block ops that were folded into driver composites (r3 VERDICT
#1 registry consolidation) stay oracle-pinned here: each is still compared
against its own DuckDB SQL at sf0.001 with the same normalization the
driver applies."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from sanskrit_ocr_spark.ops.textstats import LEGACY_ORACLES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "fn", sorted(LEGACY_ORACLES, key=lambda f: f.__name__),
    ids=lambda f: f.__name__)
def test_legacy_oracle_parity(spark, con, fn):
    sdf = _norm(fn(spark, SF).toPandas())
    ddf = _norm(con.sql(LEGACY_ORACLES[fn]).df())
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
