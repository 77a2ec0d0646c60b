"""spark-submit entry point for a crawl run.

  spark-submit --py-files crabspark.zip bin/crawl_job.py \
      -c crawl.json --pages <pages parquet> --robots <robots parquet> \
      --workdir <state dir> [--fresh-seen]

Mirrors the reference's CLI (-c config path, reference src/tools.rs:198-206);
the extra flags name the Common-Crawl-style input snapshot and the
checkpoint directory. Exit report matches the reference's (visited /
completed counts + elapsed, reference src/main.rs:100-104).
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from crabspark.config import Config
from crabspark.engine import Engine


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default="")
    ap.add_argument("--pages", required=True)
    ap.add_argument("--robots", default=None)
    ap.add_argument("--assets", default=None,
                    help="image-fetch responses parquet (url, content_type, bytes)")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--fresh-seen", action="store_true",
                    help="reference process-restart semantics: drop the "
                         "seen set, keep visited/is_complete (Q5 resume)")
    ap.add_argument("--max-rounds", type=int, default=None)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("crabspark-crawl")
        # committer v2 at session build (see crabspark/tables.py Catalog)
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        )
        .getOrCreate()
    )
    cfg = Config.new(args.config)
    eng = Engine(
        spark, cfg, args.workdir,
        pages_path=args.pages, robots_path=args.robots,
        assets_path=args.assets,
        fresh_seen=args.fresh_seen,
    )
    t0 = time.monotonic()
    res = eng.run(max_rounds=args.max_rounds)
    elapsed = time.monotonic() - t0

    visited = eng.read_visited()
    total = visited.count()
    completed = visited.filter(F.col("is_complete")).count()
    print(f"Visited {res['visited']} URLs this run over {res['rounds']} rounds "
          f"in {elapsed:.1f}s ({res['visited'] / max(elapsed, 1e-9):.1f} URLs/s)")
    print(f"Total Rows: {total}")
    print(f"Completed Rows: {completed}")


if __name__ == "__main__":
    main()
