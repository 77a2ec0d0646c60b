"""Itemize the per-executor FIXED cost on local-cluster (round-5 judge
directive #6): where do the constant seconds go when an executor joins,
and are they app code or Spark infrastructure?

Measures, in a fresh process per executor count (1x2 vs 4x2 cores):
  t_session    SparkSession build (executor JVM launch + registration)
  t_ship       ship_package (zip build + addPyFile broadcast)
  t_first_udf  first pandas-UDF stage (executor-side: fetch the shipped
               zip, extract, start the pyspark daemon + worker pool,
               import crabspark) — minus t_warm_udf = the one-time cost
  t_warm_udf   the SAME stage again (pool warm; pure compute+overhead)
  t_commit     one small parquet write+commit (driver commit fan-in vs
               executor count at fixed data)
  t_noop_job   an empty-ish JVM-only job (scheduler floor)

Usage: python bench/exec_fixed_cost.py ; writes BENCH/exec_fixed_cost.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
n_exec = int(sys.argv[1])

t0 = time.monotonic()
from pyspark.sql import SparkSession, functions as F
spark = (
    SparkSession.builder.master(f"local-cluster[{{n_exec}},2,1024]")
    .appName("exec-fixed-cost")
    .config("spark.executor.memory", "800m")
    .config("spark.driver.memory", "4g")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config(
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
t_session = time.monotonic() - t0

t0 = time.monotonic()
spark.range(1000, numPartitions=8).agg(F.sum("id")).collect()
t_noop_job = time.monotonic() - t0

t0 = time.monotonic()
from crabspark.shipping import ship_package
ship_package(spark)
t_ship = time.monotonic() - t0

import pandas as pd
from pyspark.sql.functions import pandas_udf

@pandas_udf("long")
def _probe(s: pd.Series) -> pd.Series:
    import crabspark.urlkit  # executor-side package import cost
    return s * 2

def udf_stage():
    t0 = time.monotonic()
    spark.range(8000, numPartitions=8).select(_probe("id")).agg(
        F.sum("_probe(id)")
    ).collect()
    return time.monotonic() - t0

t_first_udf = udf_stage()
t_warm_udf = min(udf_stage(), udf_stage())

import tempfile, shutil
d = tempfile.mkdtemp()
def commit_leg():
    t0 = time.monotonic()
    spark.range(100_000, numPartitions=8).withColumn(
        "v", F.col("id") * 2
    ).write.mode("overwrite").parquet(os.path.join(d, "t"))
    return time.monotonic() - t0
commit_leg()
t_commit = min(commit_leg(), commit_leg())
shutil.rmtree(d, ignore_errors=True)

print(json.dumps({{
    "n_exec": n_exec, "t_session": round(t_session, 2),
    "t_noop_job": round(t_noop_job, 2), "t_ship": round(t_ship, 2),
    "t_first_udf": round(t_first_udf, 2), "t_warm_udf": round(t_warm_udf, 2),
    "udf_one_time": round(t_first_udf - t_warm_udf, 2),
    "t_commit": round(t_commit, 2),
}}))
spark.stop()
"""


def main() -> None:
    res = {}
    for n in (1, 4):
        out = subprocess.run(
            [sys.executable, "-c", WORKER.format(repo=REPO), str(n)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        res[n] = json.loads(line)
        print(f"execs={n}: {json.dumps(res[n])}", flush=True)
    with open(os.path.join(REPO, "BENCH", "exec_fixed_cost.json"), "w") as f:
        json.dump(res, f, indent=1)
    print("wrote BENCH/exec_fixed_cost.json")


if __name__ == "__main__":
    main()
