"""Extra benchmark harness (guide §1.1/§1.4): per-query noop-sink timing
isolation + `.explain("formatted")` capture for the optimization round.

This is NOT the graded bench — bench.py is frozen for measurement. This
harness exists so individual operators can be measured and re-measured
quickly while iterating, with the same session config, warm-then-time
protocol and noop sink as bench.py.

Usage:
  python bench_extra.py [--queries a,b,c] [--sf-dir DIR] [--repeat N]
                        [--explain-dir plans/r07] [--suffix _before]

Prints one JSON line: {"queries": {name: best_sec}, "samples": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import get_spark, _force  # noqa: E402
from crabspark import queries as Q  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf1.0")
    )
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--no-time", action="store_true",
                    help="capture explains only; skip execution")
    args = ap.parse_args()

    names = (
        [n.strip() for n in args.queries.split(",") if n.strip()]
        or list(Q.REGISTRY)
    )
    spark = get_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.queries()
    out: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = reg[name]
        df = fn(spark, args.sf_dir)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            p = os.path.join(args.explain_dir, f"{name}{args.suffix}.txt")
            with open(p, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"{name}: warm")
        _force(df)  # warm: plan + codegen + file listing
        ts = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name}: timed {i}")
            t0 = time.monotonic()
            _force(fn(spark, args.sf_dir))
            ts.append(round(time.monotonic() - t0, 3))
        out[name] = min(ts)
        samples[name] = ts
        print(f"# {name}: {ts}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf_dir, "queries": out,
                      "samples": samples}))


if __name__ == "__main__":
    main()
