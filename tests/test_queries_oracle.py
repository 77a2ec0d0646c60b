"""Driver-contract check run locally: every queries() entry vs its DuckDB
oracle_sql() on the same parquet tables (row count + schema-width + exact
value equality after column-name sort), mimicking CORRECTNESS_r{N}.json."""

import duckdb
import pandas as pd
import pytest

from crabspark import queries as Q
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def spark():
    return get_spark()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(4)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(Q.REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    fn, sql = Q.REGISTRY[name]
    got = normalize(fn(spark, SF_DIR).toPandas())
    want = normalize(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    # The driver hashes *stringified* values, so an int column on one side
    # and a float on the other ("1" vs "1.0") is a hash mismatch even when
    # numerically equal. Require matching dtype kind (i/u merged) per column.
    for c in got.columns:
        gk = got[c].dtype.kind.replace("u", "i")
        wk = want[c].dtype.kind.replace("u", "i")
        assert gk == wk, (
            f"{name}.{c}: dtype kind {got[c].dtype} vs {want[c].dtype} — "
            "driver string-hash would mismatch"
        )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-4)
