"""Driver-contract smoke: entry() runs on sf0.001 and the queries()/
oracle_sql() registries line up."""

import pytest

import __spark_entry__ as entrymod
from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"key", "url", "canon", "host", "hr"} <= cols
    # politeness quota honored in the flagship round
    assert all(r["hr"] <= 2 for r in rows)
    assert len(rows) <= 100  # cap trim


def test_registry_alignment():
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 20
    missing_oracle = set(qs) - set(sqls)
    # iterative ops are deliberately oracle-less (driver rows-only check);
    # anything else missing an oracle is a registration bug
    assert missing_oracle <= {"ann_ivf_kmeans"}, (
        f"queries without oracles: {missing_oracle}"
    )
