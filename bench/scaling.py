"""Scaling-efficiency evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the N -> 4N executor criterion is
evidenced by running the IDENTICAL crawl job on the IDENTICAL input at two
local parallelism levels (default local[2] vs local[8], i.e. N and 4N
cores), reporting throughput at both plus efficiency

    eff = T(4N) / (4 * T(N))        (T in URLs/sec)

and checking the runs produce IDENTICAL outputs: same visit ordering
(round, priority, url), same seen set, byte-identical extracted text per url.

Each measurement runs in its own subprocess (one SparkSession per master).
Results land in BENCH/BASELINE.md.

Usage:
  python bench/scaling.py                 # full run (generates fixture once)
  python bench/scaling.py --pages 50000   # smaller/faster
  python bench/scaling.py --pair 8,32     # different core pair
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# worker: one crawl at one parallelism level
# ---------------------------------------------------------------------------

def run_worker(cpus: int, fxdir: str, out_path: str, cap: int) -> None:
    from pyspark.sql import SparkSession

    from crabspark.config import Config
    from crabspark.engine import Engine
    from fixtures import gen_pages

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"crabspark-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cfg = Config.new()
    cfg.free_crawl = True
    cfg.seeds = [gen_pages.SEED_URL]
    cfg.scheduling = "throughput"
    cfg.per_host_quota = None
    cfg.max_urls_to_visit = cap
    cfg.respect_robots = True
    cfg.collect_images = True
    cfg.bloom_capacity = 4_000_000

    # warm-up: a tiny throwaway crawl on the same input so JIT/codegen,
    # python UDF workers, and file listings are hot before measurement
    # (standard steady-state benchmarking; applied identically to both
    # parallelism levels)
    import copy

    warm_cfg = copy.deepcopy(cfg)
    warm_cfg.max_urls_to_visit = 40
    warm_work = tempfile.mkdtemp(prefix=f"crabspark-warm-{cpus}-")
    try:
        Engine(
            spark, warm_cfg, warm_work,
            pages_path=os.path.join(fxdir, "pages.parquet"),
            robots_path=os.path.join(fxdir, "robots.parquet"),
        ).run()
    finally:
        shutil.rmtree(warm_work, ignore_errors=True)

    work = tempfile.mkdtemp(prefix=f"crabspark-scale-{cpus}-")
    try:
        eng = Engine(
            spark, cfg, work,
            pages_path=os.path.join(fxdir, "pages.parquet"),
            robots_path=os.path.join(fxdir, "robots.parquet"),
        )
        t0 = time.monotonic()
        res = eng.run()
        wall = time.monotonic() - t0

        # output-identity digests
        order_md5 = hashlib.md5()
        for row in eng.visit_log().select("round", "priority", "url").collect():
            order_md5.update(
                f"{row['round']}|{row['priority']}|{row['url']}\n".encode()
            )
        seen_rows = sorted(r["url"] for r in eng.read_seen().collect())
        seen_md5 = hashlib.md5("\n".join(seen_rows).encode()).hexdigest()
        texts = sorted(
            (r["url"], hashlib.md5(r["text"].encode()).hexdigest())
            for r in eng.catalog.read("fetched").select("url", "text").collect()
        )
        text_md5 = hashlib.md5(json.dumps(texts).encode()).hexdigest()
        metrics = [row.asDict() for row in
                   eng.catalog.read("metrics").orderBy("round").collect()]
        result = {
            "cpus": cpus,
            "visited": res["visited"],
            "rounds": res["rounds"],
            "wall_s": round(wall, 2),
            "urls_per_sec": round(res["visited"] / wall, 2),
            "order_md5": order_md5.hexdigest(),
            "seen_md5": seen_md5,
            "text_md5": text_md5,
            "round_walls": [round(m["wall_s"], 2) for m in metrics],
            "batch_sizes": [m["batch_n"] for m in metrics],
        }
        with open(out_path, "w") as f:
            json.dump(result, f)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--fxdir")
    ap.add_argument("--out")
    ap.add_argument("--cap", type=int, default=10_000_000)
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--body-scale", type=int, default=4)
    ap.add_argument("--branching", type=int, default=16)
    ap.add_argument("--pair", default="2,8")
    args = ap.parse_args()

    if args.worker:
        run_worker(args.cpus, args.fxdir, args.out, args.cap)
        return

    n1, n2 = (int(x) for x in args.pair.split(","))
    assert n2 == 4 * n1, "pair must be N,4N"

    from fixtures import gen_pages

    fxdir = os.path.join(
        REPO, ".bench_data",
        f"scalefx-p{args.pages}-b{args.branching}-s{args.body_scale}",
    )
    if not os.path.exists(os.path.join(fxdir, "pages.parquet")):
        print(f"generating fixture {fxdir} ...", file=sys.stderr)
        t0 = time.monotonic()
        gen_pages.write(fxdir, n_pages=args.pages, seed=42,
                        branching=args.branching, body_scale=args.body_scale)
        print(f"fixture generated in {time.monotonic()-t0:.0f}s", file=sys.stderr)

    results = {}
    for cpus in (n1, n2):
        out = os.path.join(tempfile.gettempdir(), f"scale-{cpus}.json")
        print(f"running crawl at local[{cpus}] ...", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--cpus", str(cpus), "--fxdir", fxdir, "--out", out,
             "--cap", str(args.cap)],
            check=True,
        )
        with open(out) as f:
            results[cpus] = json.load(f)

    r1, r2 = results[n1], results[n2]
    eff = r2["urls_per_sec"] / (4 * r1["urls_per_sec"])
    identical = (
        r1["order_md5"] == r2["order_md5"]
        and r1["seen_md5"] == r2["seen_md5"]
        and r1["text_md5"] == r2["text_md5"]
    )
    report = {
        "pages": args.pages,
        "pair": [n1, n2],
        "runs": results,
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": identical,
    }
    print(json.dumps(report, indent=1))
    write_markdown(report)


def write_markdown(rep: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    n1, n2 = rep["pair"]
    runs = {int(k): v for k, v in rep["runs"].items()} if all(
        isinstance(k, str) for k in rep["runs"]
    ) else rep["runs"]
    r1, r2 = runs[n1], runs[n2]
    md = f"""# BENCH — scaling evidence (N -> 4N cores)

Protocol per BASELINE.md: identical crawl job + identical input at
`local[{n1}]` and `local[{n2}]` (N and 4N cores), synthetic Common-Crawl-style
fixture of {rep['pages']:,} pages (shallow fan-out tree, host-skewed, robots
enforced, politeness quota off for raw throughput).

| metric | local[{n1}] | local[{n2}] |
|---|---|---|
| URLs visited | {r1['visited']:,} | {r2['visited']:,} |
| rounds | {r1['rounds']} | {r2['rounds']} |
| wall (s) | {r1['wall_s']} | {r2['wall_s']} |
| throughput (URLs/sec) | {r1['urls_per_sec']} | {r2['urls_per_sec']} |

**Scaling efficiency T({n2})/(4 x T({n1})) = {rep['scaling_efficiency']}**

Output identity across parallelism levels (north-rule invariants):
- visit ordering (round, priority, url): {'IDENTICAL' if rep['outputs_identical'] else 'MISMATCH'} (md5 {r1['order_md5'][:12]}…)
- seen set: md5 {r1['seen_md5'][:12]}… == {r2['seen_md5'][:12]}…
- extracted text per url: md5 {r1['text_md5'][:12]}… == {r2['text_md5'][:12]}…

Per-round batch sizes: {r1['batch_sizes']}
Per-round walls local[{n1}]: {r1['round_walls']}
Per-round walls local[{n2}]: {r2['round_walls']}

## Extrapolation to the 10^10 frontier

Per-round fixed overhead (job scheduling, snapshot commits, bloom
broadcast) is independent of batch size; all per-URL work (extract,
resolve, hash, dedup joins, window rank) lives in executor tasks that
partition by url_sha1/host. At 10^10-URL scale each round's batch is
10^6-10^8 rows, so the fixed overhead measured here amortizes to noise and
efficiency approaches the per-task compute scaling observed above. Nothing
driver-resident grows with frontier size (bloom bits are fixed-size;
counters are scalars; robots rules are bounded by the round's distinct
hosts).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
