"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship: one full frontier-scheduling round (canonicalize
                 -> first-observer dedup -> seen anti-join -> per-host
                 politeness rank -> cap trim) over sf0.001.
queries()     -> every SQL-expressible operator from SURVEY.md §2 plus the
                 training-data pipeline ops (crabspark/queries.py).
oracle_sql()  -> matching DuckDB SQL per query.

The crawl engine itself (multi-round BSP loop, bloom seen-set, robots,
completion fixpoint, resume) is exercised end-to-end against the sequential
oracle in tests/test_engine_parity.py — it is stateful/iterative and not
one-shot-SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crabspark import queries as _queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one scheduling round of the URL frontier at sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    urls = _queries._urls(spark, sf_dir)
    canon = urls.select(
        "key", "url",
        F.expr(_queries._CANON_SPARK).alias("canon"),
        F.expr(_queries._HOST_SPARK).alias("host"),
    )
    # first-observer dedup on the canonical key (U1/U2)
    w_first = Window.partitionBy("canon").orderBy("key")
    deduped = (
        canon.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    # seen-set anti-join (J2)
    seen = deduped.filter(F.col("key") % 3 == 0).select("canon")
    unseen = deduped.join(seen, "canon", "left_anti")
    # per-host politeness quota (window rank), then global cap trim (F6)
    w_host = Window.partitionBy("host").orderBy("key")
    batch = (
        unseen.withColumn("hr", F.row_number().over(w_host))
        .filter(F.col("hr") <= 2)
        .orderBy("key")
        .limit(100)
        .select("key", "url", "canon", "host", "hr")
    )
    return batch


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries.queries()


def oracle_sql() -> dict[str, str]:
    return _queries.oracle_sql()
