"""Streaming near-dup gate scaling curve (VERDICT r4 item 8).

The gate's scale-sensitive path is the per-micro-batch join of the
arriving batch's LSH band keys against the ACCUMULATED signature store
(`sig_bands` / `sig_shingles` grow O(corpus)). This harness measures one
micro-batch's wall clock at store sizes 10k -> 1M docs and records the
curve in BENCH/streaming_gate.md.

Protocol: for each store size S
  1. a fresh catalog is seeded with 2,000 REAL document signatures (the
     gate itself ingests them, so store rows are exactly what production
     batches write), then PADDED to S docs with synthetic rows of the
     same schema and statistics (distinct band keys, 60-element int64
     shingle arrays) appended directly — padding via the gate would cost
     O(S) ingest work per size and measure fixture construction;
  2. one batch of 2,000 fresh docs streams through `start_neardup_gate`
     (availableNow, one file = one micro-batch); 2% of them are exact
     text twins of seeded docs, so the candidate+verify joins are
     exercised, not vacuous;
  3. the batch's wall is the streaming query's start->termination time,
     which includes the constant query-machinery overhead (~seconds) —
     reported as-is, so the curve shows TOTAL per-batch latency.

Usage: python bench/streaming_gate.py [--sizes 10000,100000,1000000]
Prints one JSON line; also writes BENCH/streaming_gate.md unless --no-md.
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


def _docs_df(spark, start_id: int, n: int, twin_of: int | None = None,
             twin_every: int = 50):
    """Deterministic word-soup documents. With ``twin_of`` set, every
    ``twin_every``-th doc is an exact text twin of the corresponding doc
    in the [twin_of, twin_of+n) id range (Jaccard 1.0 — guaranteed past
    any verify threshold)."""
    from pyspark.sql import functions as F

    base = spark.range(start_id, start_id + n).withColumnRenamed("id", "doc_id")
    # 80 words drawn from a 5000-word vocab; xxhash64(seed, j) word choice
    # so cross-doc shingle collisions are chance-level — a linear
    # congruential choice here made 2-gram runs collide across docs and
    # flagged ~2 dups per doc, swamping the intended 2% twin rate
    text_for = (
        "concat_ws(' ', transform(sequence(0, 79), "
        "j -> concat('w', pmod(xxhash64({seed}, j), 5000))))"
    )
    own = F.expr(text_for.format(seed="doc_id"))
    if twin_of is not None:
        twin_seed = f"(doc_id - {start_id} + {twin_of})"
        text = F.when(
            F.col("doc_id") % twin_every == 0,
            F.expr(text_for.format(seed=twin_seed)),
        ).otherwise(own)
    else:
        text = own
    return base.select(
        "doc_id",
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.lit("bench").alias("source"),
    )


def _pad_store(spark, catalog, n_pad: int, first_id: int) -> None:
    """Synthetic store rows with production statistics: 3 distinct band
    keys per doc ('k:h1:h2:h3:h4' — same shape/width the gate writes) and
    a 60-element int64 hashed-shingle array. Appended directly because
    the measurement is the per-batch JOIN cost against an S-doc store,
    not the cost of building one."""
    from pyspark.sql import functions as F

    ids = spark.range(first_id, first_id + n_pad).withColumnRenamed(
        "id", "doc_id"
    )
    bands = ids.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":", F.lit(str(k)),
                        *[
                            F.expr(f"xxhash64(doc_id, {k * 4 + j})").cast(
                                "string"
                            )
                            for j in range(4)
                        ],
                    )
                    for k in range(3)
                ]
            )
        ).alias("bkey"),
    )
    shingles = ids.select(
        "doc_id",
        F.expr(
            "transform(sequence(0, 59), j -> xxhash64(doc_id, j + 100))"
        ).alias("sh"),
    )
    # round 0 = the seed batch's round: the catalog's per-table monotone
    # round assert allows equal rounds, and the NEXT gate batch commits
    # at round 1, so padding must not run the counter ahead of the stream
    catalog.append("sig_bands", bands, 0)
    catalog.append("sig_shingles", shingles, 0)
    catalog.commit(0)


def measure(spark, store_docs: int) -> dict:
    from crabspark.streaming import start_neardup_gate
    from crabspark.tables import Catalog

    work = tempfile.mkdtemp(prefix=f"gatebench-{store_docs}-")
    docs_dir = os.path.join(work, "docs")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(docs_dir)
    try:
        catalog = Catalog(os.path.join(work, "catalog"), spark)
        seed_n = 2_000
        _docs_df(spark, 0, seed_n).coalesce(1).write.mode("append").parquet(
            docs_dir
        )
        q = start_neardup_gate(spark, docs_dir, catalog, ckpt)
        q.awaitTermination()
        if store_docs > seed_n:
            _pad_store(spark, catalog, store_docs - seed_n, 10_000_000)
        # compact so every size measures ONE read-optimized store layout
        # (the gate itself compacts every 16 deltas; without this, store
        # delta-count would vary across sizes and pollute the curve)
        catalog.compact("sig_bands", 0)
        catalog.compact("sig_shingles", 0)

        batch_n = 2_000
        _docs_df(
            spark, 1_000_000, batch_n, twin_of=0
        ).coalesce(1).write.mode("append").parquet(docs_dir)
        t0 = time.monotonic()
        q = start_neardup_gate(spark, docs_dir, catalog, ckpt)
        q.awaitTermination()
        wall = time.monotonic() - t0

        log = catalog.read("neardup_log")
        n_flagged = log.count() if log is not None else 0
        return {
            "store_docs": store_docs,
            "batch_docs": batch_n,
            "batch_wall_s": round(wall, 2),
            "flagged_dups": n_flagged,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def write_markdown(rows: list[dict]) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = [
        "# BENCH — streaming near-dup gate: per-batch wall vs store size\n",
        "\nOne 2,000-doc micro-batch through `start_neardup_gate` against an",
        "\naccumulated signature store of S documents (store seeded with real",
        "\ngate output, padded synthetically to S, compacted to one delta;",
        "\n2% of batch docs are exact twins of stored docs so candidate and",
        "\nverify joins run non-vacuously). Wall includes the constant",
        "\nstreaming-query machinery (~seconds), i.e. TOTAL batch latency.\n",
        "\n| store docs | batch wall (s) | flagged dups |\n|---|---|---|\n",
    ]
    for r in rows:
        md.append(
            f"| {r['store_docs']:,} | {r['batch_wall_s']} |"
            f" {r['flagged_dups']} |\n"
        )
    if len(rows) >= 2:
        lo, hi = rows[0], rows[-1]
        growth = hi["batch_wall_s"] / max(lo["batch_wall_s"], 1e-9)
        ratio = hi["store_docs"] / max(lo["store_docs"], 1)
        md.append(
            f"\nStore grew {ratio:.0f}x; per-batch wall grew {growth:.2f}x"
            " — the store-side cost is a columnar parquet scan feeding a"
            " band-key hash join whose build side is the (tiny) batch, so"
            " the per-batch increment is scan bandwidth, not join blowup."
            " At true 100-TB store scale the same plan shape holds with"
            " the store bucketed by band key, pruning the scan to the"
            " batch's buckets.\n"
        )
    with open(os.path.join(REPO, "BENCH", "streaming_gate.md"), "w") as f:
        f.write("".join(md))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,100000,300000,1000000")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--no-md", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("crabspark-gate-bench")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = [measure(spark, int(s)) for s in args.sizes.split(",")]
    print(json.dumps({"metric": "neardup_gate_batch_wall", "rows": rows}))
    if not args.no_md:
        write_markdown(rows)


if __name__ == "__main__":
    main()
