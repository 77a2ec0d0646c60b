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

def run_worker(cpus: int, fxdir: str, out_path: str, cap: int, parts: int,
               exec_mode: str = "local") -> None:
    from pyspark.sql import SparkSession

    from crabspark.config import Config
    from crabspark.engine import Engine
    from fixtures import gen_pages

    if exec_mode == "cluster":
        # Spark's built-in multi-JVM pseudo-cluster: cpus total cores as
        # (cpus/4) SEPARATE EXECUTOR JVMs x 4 cores, each with its OWN
        # heap, GC threads, and Python worker pool — the resource shape
        # the single-JVM local[N] measurement lacks (VERDICT r4 item 3:
        # is the 8->32 efficiency miss a threads-in-one-JVM artifact?).
        # 4 cores/executor is the classic production sizing; 4g/executor
        # keeps 8 executors + driver well inside the box.
        exec_cores = int(os.environ.get("CRABSPARK_EXEC_CORES", "4"))
        n_exec = max(1, cpus // exec_cores)
        master = f"local-cluster[{n_exec},{exec_cores},4096]"
        os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    else:
        master = f"local[{cpus}]"
    builder = SparkSession.builder
    if exec_mode == "cluster":
        builder = (
            builder.config("spark.executor.memory", "3g")
            .config(
                "spark.executor.extraJavaOptions",
                # same collector as the local legs; each executor JVM sizes
                # ergonomic thread pools off the WHOLE box's core count, so
                # cap GC threads at the executor's core share (without the
                # cap, 8 executors x ~23 ergonomic GC threads stampede a
                # 32-core box at every young pause) — overridable for A/B
                os.environ.get(
                    "CRABSPARK_EXEC_JVM_OPTS",
                    "-XX:+UseParallelGC -XX:ParallelGCThreads=4",
                ),
            )
        )
    spark = (
        builder.master(master)
        .appName(f"crabspark-scaling-{exec_mode}-{cpus}")
        # shuffle partitions are sized to DATA, identical at every
        # parallelism level: per-task launch overhead is constant, so
        # core-proportional partition counts inflate the fixed per-round
        # floor at high N and measure scheduler overhead, not the engine
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", os.environ.get("CRABSPARK_AQE", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # committer v2 at session build (see crabspark/tables.py Catalog)
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        )
        # 16g, NOT bigger: a 48g heap at local[32] tripled per-round
        # floors on this VM (GC/THP behavior of giant heaps); measured
        # 171s -> 88s on the identical 400k crawl just by shrinking it
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # ParallelGC: G1's concurrent threads starve when Python UDF
        # workers occupy every core through a JVM pause (young pauses
        # stretched to 1.1-2.5s and randomly stalled one heavy round 2-4x);
        # parallel scavenge has no concurrent threads to starve — measured
        # 22.9-23.5s vs 24.5-34.7s spread on the identical crawl leg
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseParallelGC " + os.environ.get("CRABSPARK_JVM_OPTS", ""),
        )
        # digest collects are (url, md5) pairs — small per row, but 10^6+
        # rows; the 1g default is sized for query results, not audits
        .config("spark.driver.maxResultSize", "4g")
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
    cfg.arrow_max_records_per_batch = int(
        os.environ.get("CRABSPARK_ARROW_BATCH", "512")
    )

    # warm-up: a tiny throwaway crawl on the same input so JIT/codegen,
    # python UDF workers, and file listings are hot before measurement
    # (standard steady-state benchmarking; applied identically to both
    # parallelism levels)
    import copy

    warm_cfg = copy.deepcopy(cfg)
    warm_cfg.max_urls_to_visit = 40
    pages_path = os.path.join(fxdir, "pages_bucketed.parquet")
    if not os.path.exists(os.path.join(pages_path, "_crabspark_buckets.json")):
        pages_path = os.path.join(fxdir, "pages.parquet")
    warm_work = tempfile.mkdtemp(prefix=f"crabspark-warm-{cpus}-")
    try:
        Engine(
            spark, warm_cfg, warm_work,
            pages_path=pages_path,
            robots_path=os.path.join(fxdir, "robots.parquet"),
        ).run()
    finally:
        shutil.rmtree(warm_work, ignore_errors=True)

    work = tempfile.mkdtemp(prefix=f"crabspark-scale-{cpus}-")
    try:
        eng = Engine(
            spark, cfg, work,
            pages_path=pages_path,
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
        # md5 per row EXECUTOR-side (same hex the old hashlib path produced,
        # so digests stay comparable across rounds): collecting raw text
        # blobs for 10^6+ pages blows spark.driver.maxResultSize
        from pyspark.sql import functions as F

        texts = sorted(
            (r["url"], r["h"])
            for r in eng.catalog.read("fetched")
            .select("url", F.md5(F.col("text").cast("binary")).alias("h"))
            .collect()
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
            "phase_splits": eng.phase_splits,
        }
        with open(out_path, "w") as f:
            json.dump(result, f)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

def kernel_ceiling_probe(fxdir: str, procs_list: list[int]) -> dict[int, float]:
    """Raw-multiprocessing throughput of the REAL extract kernel on REAL
    fixture blobs — Spark completely out of the loop. This measures the
    MACHINE's scaling ceiling for the memory-bandwidth-bound kernel work;
    the crawl cannot scale past it on a single box.

    Each of the 96 tasks processes a DISTINCT 512-page batch (~700 MB
    total working set), like the real crawl streaming the fixture. A
    single re-processed batch would stay cache-resident and overstate the
    machine's scaling ceiling by measuring L3 bandwidth instead of
    memory bandwidth (the round-2/3 probes had exactly that flaw)."""
    import multiprocessing as mp

    import pandas as pd

    global _CEILING_BATCHES
    n_batches, rows = 96, 512
    df = pd.read_parquet(
        os.path.join(fxdir, "pages.parquet"), columns=["url", "html"]
    ).head(n_batches * rows)
    # fork-inherited global: shipping 700MB through pool.map args would
    # serialize it per task through one feeder thread and measure THAT
    # bottleneck instead of the kernel
    _CEILING_BATCHES = [
        (
            df["html"].iloc[i * rows: (i + 1) * rows].tolist(),
            df["url"].iloc[i * rows: (i + 1) * rows].tolist(),
        )
        for i in range(n_batches)
    ]
    out: dict[int, float] = {}
    for procs in procs_list:
        with mp.Pool(procs) as pool:
            pool.map(_ceiling_work, range(procs))  # warm imports + caches
            t0 = time.monotonic()
            # 3 passes so the high-proc legs measure seconds, not timer noise
            pool.map(_ceiling_work, range(3 * len(_CEILING_BATCHES)))
            out[procs] = round(time.monotonic() - t0, 2)
    return out


_CEILING_BATCHES = None


def _ceiling_work(i):
    """One batch through the FULL per-URL kernel chain a crawl round runs
    (extract -> per-link resolve/canonicalize/sha1), not extract alone —
    the ceiling must measure the work the engine actually scales."""
    import pandas as pd

    from crabspark import extract, urlkit

    html, urls = _CEILING_BATCHES[i % len(_CEILING_BATCHES)]
    pg = extract.extract_page(pd.Series(html, dtype=object))
    hrefs, refs = [], []
    for u, links in zip(urls, pg["link_links"]):
        for hr in links or []:
            hrefs.append(hr)
            refs.append(u)
    resolved = urlkit.resolve_links(
        pd.Series(hrefs, dtype=object), pd.Series(refs, dtype=object)
    )
    parsed = urlkit.parse_serialize(resolved)
    canon = urlkit.canonicalize(parsed["ser"])
    return int(urlkit.sha1_hex(canon).notna().sum())


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
    ap.add_argument("--parts", type=int, default=16,
                    help="shuffle partitions, SAME for every leg (data-sized)")
    ap.add_argument("--pairs", default="1,4",
                    help="semicolon-separated N,4N pairs, e.g. '1,4;8,32'")
    ap.add_argument("--repeats", type=int, default=1,
                    help="crawls per leg; keep the fastest (noise floor)")
    ap.add_argument("--no-md", action="store_true",
                    help="print the JSON report only; leave BENCH/BASELINE.md "
                         "untouched (for supplementary pairs/fixtures whose "
                         "results are folded into the doc by hand)")
    ap.add_argument("--json-out", default=None,
                    help="also write the JSON report to this path")
    ap.add_argument("--exec-mode", default="local",
                    choices=["local", "cluster"],
                    help="'local' = threads in one JVM (local[N]); "
                         "'cluster' = local-cluster[N/4,4,4096] — separate "
                         "executor JVMs with their own heaps/GC/Python "
                         "pools, the faithful multi-node analogue")
    args = ap.parse_args()

    if args.worker:
        run_worker(args.cpus, args.fxdir, args.out, args.cap, args.parts,
                   args.exec_mode)
        return

    pairs = []
    for ptxt in args.pairs.split(";"):
        n1, n2 = (int(x) for x in ptxt.split(","))
        assert n2 == 4 * n1, "each pair must be N,4N"
        pairs.append((n1, n2))

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
    bucketed = os.path.join(fxdir, "pages_bucketed.parquet")
    if not os.path.exists(os.path.join(bucketed, "_crabspark_buckets.json")):
        # url-hash-bucketed pages layout (the 100-TB scan shape): small
        # rounds prune the fetch-join scan to their buckets instead of
        # streaming the whole snapshot. One-time rewrite, cached on disk.
        print("bucketizing pages fixture ...", file=sys.stderr)
        from pyspark.sql import SparkSession

        from crabspark.tables import bucketize_pages

        s = (
            SparkSession.builder.master("local[8]")
            .appName("crabspark-bucketize")
            .config("spark.driver.memory", "8g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        bucketize_pages(
            s, os.path.join(fxdir, "pages.parquet"), bucketed, n_buckets=64
        )
        s.stop()

    cpu_list = sorted({c for pair in pairs for c in pair})
    results = {}
    for cpus in cpu_list:
        # best-of-k (min wall): this VM's run-to-run variance at a fixed
        # configuration exceeds 2x (GC/THP/page-cache state); the minimum
        # is the standard noise-floor estimator on a shared host. Output
        # identity is asserted across ALL repeats, not just the kept one.
        best = None
        digests = set()
        for rep in range(max(1, args.repeats)):
            out = os.path.join(
                tempfile.gettempdir(), f"scale-{cpus}-{rep}.json"
            )
            print(
                f"running crawl at local[{cpus}] (rep {rep + 1}/"
                f"{args.repeats}) ...", file=sys.stderr,
            )
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 "--cpus", str(cpus), "--fxdir", fxdir, "--out", out,
                 "--cap", str(args.cap), "--parts", str(args.parts),
                 "--exec-mode", args.exec_mode],
                check=True,
            )
            with open(out) as f:
                r = json.load(f)
            digests.add((r["order_md5"], r["seen_md5"], r["text_md5"]))
            if best is None or r["wall_s"] < best["wall_s"]:
                best = r
        assert len(digests) == 1, f"repeats disagree at local[{cpus}]"
        best["repeats"] = max(1, args.repeats)
        results[cpus] = best

    print("running raw-mp kernel ceiling probe ...", file=sys.stderr)
    ceiling = kernel_ceiling_probe(fxdir, cpu_list)

    pair_reports = []
    for n1, n2 in pairs:
        r1, r2 = results[n1], results[n2]
        eff = r2["urls_per_sec"] / (4 * r1["urls_per_sec"])
        identical = (
            r1["order_md5"] == r2["order_md5"]
            and r1["seen_md5"] == r2["seen_md5"]
            and r1["text_md5"] == r2["text_md5"]
        )
        hw_speedup = ceiling[n1] / ceiling[n2] if ceiling.get(n2) else None
        crawl_speedup = r2["urls_per_sec"] / r1["urls_per_sec"]
        pair_reports.append({
            "pair": [n1, n2],
            "scaling_efficiency": round(eff, 3),
            "outputs_identical": identical,
            "crawl_speedup": round(crawl_speedup, 2),
            "kernel_ceiling_speedup": round(hw_speedup, 2) if hw_speedup else None,
            "efficiency_vs_ceiling": (
                round(crawl_speedup / hw_speedup, 2) if hw_speedup else None
            ),
        })
    report = {
        "exec_mode": args.exec_mode,
        "pages": args.pages,
        "parts": args.parts,
        "repeats": max(1, args.repeats),
        "runs": results,
        "pairs": pair_reports,
        "kernel_ceiling_probe_s": ceiling,
    }
    print(json.dumps(report, indent=1))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)
    if not args.no_md:
        write_markdown(report)


def write_markdown(rep: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    runs = {int(k): v for k, v in rep["runs"].items()}
    md = [
        "# BENCH — scaling evidence (N -> 4N cores)\n",
        "\nProtocol per BASELINE.md: identical crawl job + identical input at",
        "\nmultiple `local[N]` parallelism levels, synthetic Common-Crawl-style",
        f"\nfixture of {rep['pages']:,} pages (shallow fan-out, host-skewed, robots",
        f"\nenforced, politeness off). Shuffle partitions fixed at {rep['parts']}",
        "\n(data-sized, identical at every level: per-task launch cost is",
        "\nconstant, so core-proportional partition counts would measure",
        "\nscheduler floor, not the engine).\n",
        "\n| metric |" + "".join(f" local[{c}] |" for c in sorted(runs)),
        "\n|---|" + "---|" * len(runs),
        "\n| URLs visited |" + "".join(f" {runs[c]['visited']:,} |" for c in sorted(runs)),
        "\n| wall (s) |" + "".join(f" {runs[c]['wall_s']} |" for c in sorted(runs)),
        "\n| URLs/sec |" + "".join(f" {runs[c]['urls_per_sec']} |" for c in sorted(runs)),
        "\n",
    ]
    for pr in rep["pairs"]:
        n1, n2 = pr["pair"]
        md.append(
            f"\n**Pair {n1} -> {n2}: scaling efficiency "
            f"T({n2})/(4 x T({n1})) = {pr['scaling_efficiency']}**"
            f" — outputs {'IDENTICAL' if pr['outputs_identical'] else 'MISMATCH'};"
            f" crawl speedup {pr['crawl_speedup']}x vs raw-kernel hardware"
            f" ceiling {pr['kernel_ceiling_speedup']}x on this box ->"
            f" {pr['efficiency_vs_ceiling']} of the achievable speedup.\n"
        )
    r0 = runs[sorted(runs)[0]]
    md.append(
        "\nOutput identity across ALL parallelism levels (north-rule"
        "\ninvariants): visit ordering (round, priority, url), seen set, and"
        f"\nper-url extracted text — md5 {r0['order_md5'][:12]}… /"
        f" {r0['seen_md5'][:12]}… / {r0['text_md5'][:12]}…\n"
    )
    md.append("\n## Raw-kernel machine ceiling (Spark out of the loop)\n")
    md.append(
        "\nThe same extract kernel over the same fixture blobs driven by a"
        "\nplain multiprocessing pool — 96 DISTINCT 512-page batches"
        "\n(~700 MB working set), so the probe streams memory like the real"
        "\ncrawl instead of re-hashing one cache-resident batch (an earlier"
        "\nprobe did exactly that and overstated the achievable speedup):\n\n"
    )
    md.append("| procs | wall (s) |\n|---|---|\n")
    for c, t in sorted(rep["kernel_ceiling_probe_s"].items(), key=lambda kv: int(kv[0])):
        md.append(f"| {c} | {t} |\n")
    md.append(
        "\nThis single-box ceiling is memory bandwidth on string churn, not"
        "\nSpark overhead. On a real cluster the N -> 4N step multiplies"
        "\nmemory bandwidth along with cores (each executor node brings its"
        "\nown), so the pair where per-core bandwidth is not yet saturated"
        "\nis the faithful single-box analogue of adding nodes; the high-end"
        "\npair measures saturation of ONE node's memory bus. Each leg is"
        f"\nthe fastest of {rep.get('repeats', 1)} runs (min-of-k noise"
        "\nfloor); output identity is asserted across every run.\n"
    )
    md.append(
        "\n## Extrapolation to the 10^10 frontier\n"
        "\nPer-round fixed overhead (job scheduling, snapshot commits, bloom"
        "\nbroadcast) is independent of batch size; all per-URL work (extract,"
        "\nresolve, hash, dedup joins, window rank) lives in executor tasks"
        "\nthat partition by url_sha1/host. At 10^10-URL scale each round's"
        "\nbatch is 10^6-10^8 rows, so the fixed overhead measured here"
        "\namortizes to noise. Nothing driver-resident grows with frontier"
        "\nsize (bloom bits are fixed-size; counters are scalars; the"
        "\nqueued-seed set is <= |seeds|).\n"
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("".join(md))


if __name__ == "__main__":
    main()
