"""Priority-key totality: the '/'-separated hex keys must stay unique and
monotone for arbitrarily wide pages (ranks beyond 0xffff widen via the
'z'-prefix scheme instead of silently truncating)."""

import pytest
from pyspark.sql import functions as F

from crabspark import frontier
from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_seed_priority_monotone_across_width():
    ks = [frontier.seed_priority(i) for i in
          [0, 1, 0xFFFE, 0xFFFF, 0x10000, 0x10001, 0xFFFFF, 0x100000]]
    assert ks == sorted(ks)
    assert len(set(ks)) == len(ks)
    assert ks[3] == "ffff" and ks[4] == "z10000"


def test_child_priority_monotone_across_width(spark):
    ranks = [0, 1, 0xFFFE, 0xFFFF, 0x10000, 0x10001, 0xABCDE, 0x100000]
    df = spark.createDataFrame([(r,) for r in ranks], "rank long")
    got = (
        df.withColumn("k", frontier.child_priority(F.lit("0000"), F.col("rank")))
        .orderBy("rank")
        .collect()
    )
    keys = [row["k"] for row in got]
    assert keys == sorted(keys)
    assert len(set(keys)) == len(keys)
    assert keys[3] == "0000/ffff" and keys[4] == "0000/z10000"
    # block-op suffix '~b' must still sort after every child key
    assert all(k < "0000/~b" for k in keys)


def test_python_and_spark_widening_agree(spark):
    ranks = [5, 0xFFFF, 0x10000, 0x12345, 0xFEDCBA]
    df = spark.createDataFrame([(r,) for r in ranks], "rank long")
    got = [
        row["k"]
        for row in df.withColumn(
            "k", frontier.child_priority(F.lit("p"), F.col("rank"))
        ).orderBy("rank").collect()
    ]
    want = ["p/" + frontier._extend_hex(format(r, "x")) for r in sorted(ranks)]
    assert got == want


def test_top_k_by_priority_matches_global_sort(spark):
    """Ranged top-k (range partition + per-partition counts + boundary
    rank) returns exactly the k smallest priorities, across partition
    boundaries and for k >= total."""
    import random

    from crabspark.frontier import top_k_by_priority

    rnd = random.Random(7)
    keys = [f"{rnd.randrange(16**8):08x}" for _ in range(5000)]
    keys = list(dict.fromkeys(keys))  # unique
    df = spark.createDataFrame([(k,) for k in keys], "priority string").repartition(16)
    want = sorted(keys)
    for k in (1, 37, 1500, len(keys), len(keys) + 10):
        got = sorted(
            r["priority"]
            for r in top_k_by_priority(df, k, ranged_min=0).collect()
        )
        assert got == want[:k], f"k={k}: {len(got)} rows"
    # and the TakeOrdered small path agrees
    got_small = sorted(
        r["priority"] for r in top_k_by_priority(df, 37).collect()
    )
    assert got_small == want[:37]
