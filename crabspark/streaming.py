"""Structured Streaming ingest: continuous page-snapshot arrival.

The crawl loop itself is deliberately batch-incremental (SURVEY.md §7.6) —
per-round global rank-and-select + snapshot commits do not fit the
incremental streaming model. What IS a stream in a production crawl is the
*input*: new Common-Crawl-style page captures landing as parquet files.
This module tails such a directory with ``readStream`` and, per
micro-batch (``foreachBatch`` = exactly-once via the catalog's atomic
commit), appends the new captures as seed candidates:

  new pages -> canonicalize/hash (same kernels as the engine)
            -> candidates(url, canon, sha1, host, discovered_batch)

The engine can then fold ``candidates`` into its frontier at the next
round boundary (anti-joined against seen as usual). Watermark/late-data
handling is not needed: page captures are facts, not events — the only
ordering that matters is the batch id recorded per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crabspark import urlkit
from crabspark.shipping import ship_package
from crabspark.tables import Catalog


def _canon_udf():
    @F.pandas_udf("ser string, domain string, canon string, sha1 string")
    def _c(url: pd.Series) -> pd.DataFrame:
        parsed = urlkit.parse_serialize(url)
        canon = urlkit.canonicalize(parsed["ser"])
        return pd.DataFrame(
            {
                "ser": parsed["ser"],
                "domain": parsed["domain"],
                "canon": canon,
                "sha1": urlkit.sha1_hex(canon),
            }
        )

    return _c


def start_page_ingest(
    spark: SparkSession,
    pages_dir: str,
    catalog: Catalog,  # MUST be a dedicated candidates catalog, never the
    # engine's own workdir catalog: foreachBatch commits per micro-batch,
    # which would publish the engine's half-staged round deltas
    checkpoint_dir: str,
    pages_schema: str = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    ),
):
    """Tail pages_dir for new parquet files; per micro-batch, append
    canonicalized candidate rows to the catalog. Returns the
    StreamingQuery (caller: q.processAllAvailable() / q.stop())."""
    ship_package(spark)
    canon = _canon_udf()

    stream = (
        spark.readStream.schema(pages_schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent replay guard: a crash between catalog.commit and
        # Spark's checkpoint write replays the micro-batch with the same
        # batch_id — skip ids at or below the high-water mark. (Batch ids
        # are monotone within one checkpointLocation; a fresh checkpoint
        # dir therefore requires a fresh candidates catalog.)
        last = int(catalog.extra("ingest_last_batch", -1))
        if int(batch_id) <= last:
            return
        out = (
            batch_df.select("url")
            .withColumn("c", canon(F.col("url")))
            .select(
                F.col("c.ser").alias("url"),
                F.col("c.canon").alias("canon"),
                F.col("c.sha1").alias("sha1"),
                F.col("c.domain").alias("host"),
                F.lit(batch_id).alias("discovered_batch"),
            )
            .filter(F.col("url").isNotNull())
        )
        catalog.append("candidates", out, int(batch_id))
        # committed_round is monotone in the catalog; the high-water mark
        # rides the same atomic manifest write as the delta publish
        catalog.commit(int(batch_id), {"ingest_last_batch": int(batch_id)})

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
