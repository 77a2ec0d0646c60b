"""Round-7 equivalence harness: run registered queries on Spark AND their
DuckDB oracle SQL at an arbitrary scale factor and diff exact values (the
same normalize-and-compare as tests/test_queries_oracle.py, which runs at
sf0.001 only). Used to prove plan restructurings kept results identical at
the driver's measurement scale before shipping them.

Usage: python bench/verify_oracle.py [--sf-dir /root/testdata/sf0.1]
                                     [--queries a,b,c] [--cpus 16]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from crabspark import queries as Q  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(4)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default="")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    args = ap.parse_args()
    names = (
        [n.strip() for n in args.queries.split(",") if n.strip()]
        or list(Q.REGISTRY)
    )

    from bench import get_spark

    spark = get_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name in names:
        fn, sql = Q.REGISTRY[name]
        if sql is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            got = normalize(fn(spark, args.sf_dir).toPandas())
            want = normalize(con.execute(sql).df())
            assert list(got.columns) == list(want.columns), (
                f"columns {list(got.columns)} vs {list(want.columns)}"
            )
            assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, atol=1e-4
            )
            print(f"{name}: OK ({len(got)} rows)")
        except Exception as e:  # noqa: BLE001 - report-and-continue harness
            failures += 1
            print(f"{name}: FAIL — {str(e)[:500]}")
        sys.stdout.flush()
    print(f"DONE failures={failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
