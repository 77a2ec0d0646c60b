"""Graph-operator scale evidence: PageRank + degrees over a synthetic
10M-edge web graph at two parallelism levels.

The edge list is generated JVM-side (spark.range + hash transforms — no
Python in the data path) with a power-law-ish out-degree (hub residues fan
out more) so the shuffle sees realistic key skew. Each measurement runs in
its own subprocess (fresh JVM per master, same protocol as bench/scaling.py);
outputs are checksummed so both parallelism levels are pinned identical.

Usage:
  python bench/graph_scale.py                   # 10M edges, local[8] vs local[32]
  python bench/graph_scale.py --edges 1000000   # smaller/faster
  python bench/graph_scale.py --pair 1,4
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from crabspark.graph import node_degrees, pagerank_scores

cpus = int(sys.argv[1]); n_edges = int(sys.argv[2]); iters = int(sys.argv[3])
spark = (
    SparkSession.builder.master(f"local[{{cpus}}]")
    .appName("graph-scale")
    .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# Deterministic synthetic web graph, all JVM-side:
#   src = xxhash64(i) folded into 2^20 nodes, biased so low residues are
#   hubs (power-law-ish out-degree); dst = independent fold of i.
N_NODES = 1 << 20
e = (
    spark.range(n_edges)
    .select(
        (F.pmod(F.xxhash64(F.col("id")), F.lit(N_NODES))
         * F.pmod(F.xxhash64(F.col("id")), F.lit(N_NODES))
         / F.lit(N_NODES)).cast("long").alias("src"),
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(N_NODES)).alias("dst"),
    )
    .filter(F.col("src") != F.col("dst"))
    .distinct()
)
e = e.repartition(max(cpus, 8), "src").persist()
n = e.count()  # materialize once; excluded from the op timings

t0 = time.monotonic()
deg = node_degrees(e)
drow = deg.agg(
    F.count("*").alias("nodes"), F.sum("indeg").alias("isum"),
    F.sum(F.col("is_dangling")).alias("dang"),
).first()
t_deg = time.monotonic() - t0

t0 = time.monotonic()
pr = pagerank_scores(e, iters=iters)
prow = pr.agg(
    F.round(F.sum("pr"), 2).alias("mass"),
    F.round(F.max("pr"), 6).alias("mx"),
    F.count("*").alias("n"),
).first()
t_pr = time.monotonic() - t0

print(json.dumps({{
    "edges": n, "nodes": drow["nodes"], "dangling": drow["dang"],
    "indeg_sum": drow["isum"], "pr_mass": prow["mass"],
    "pr_max": prow["mx"], "pr_nodes": prow["n"],
    "t_degrees_s": round(t_deg, 2), "t_pagerank_s": round(t_pr, 2),
}}))
spark.stop()
"""


def run_leg(cpus: int, n_edges: int, iters: int) -> dict:
    script = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(n_edges), str(iters)],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--pair", default="8,32")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.pair.split(","))

    res = {}
    for cpus in (lo, hi):
        t0 = time.monotonic()
        leg = run_leg(cpus, args.edges, args.iters)
        leg["wall_s"] = round(time.monotonic() - t0, 1)
        res[cpus] = leg
        print(f"local[{cpus}]: {json.dumps(leg)}", flush=True)

    # identical outputs across parallelism levels: integer invariants
    # exactly; float aggregates with a tolerance (summation order differs
    # across partition counts, so a value landing on a rounding boundary
    # can flip the last rounded digit — round-5 advisor finding)
    for k in ("edges", "nodes", "dangling", "indeg_sum"):
        assert res[lo][k] == res[hi][k], (k, res[lo][k], res[hi][k])
    for k, tol in (("pr_mass", 0.02), ("pr_max", 1e-5)):
        a, b = res[lo][k], res[hi][k]
        assert abs(a - b) <= tol * max(1.0, abs(a)), (k, a, b)

    ratio = hi / lo
    t_lo = res[lo]["t_pagerank_s"]
    t_hi = res[hi]["t_pagerank_s"]
    eff = (t_lo / t_hi) / ratio
    summary = {
        "edges": res[lo]["edges"],
        "iters": args.iters,
        "pair": f"{lo}->{hi}",
        "pagerank_s": {str(lo): t_lo, str(hi): t_hi},
        "degrees_s": {str(lo): res[lo]["t_degrees_s"],
                      str(hi): res[hi]["t_degrees_s"]},
        "speedup": round(t_lo / t_hi, 2),
        "efficiency": round(eff, 3),
        "outputs_identical": True,
    }
    print(json.dumps(summary))
    out_path = os.path.join(REPO, "BENCH", "graph_scale.json")
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "legs": {str(k): v for k, v in res.items()}}, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
