"""Fixture SIDE-INPUT for the embedding near-dup operator.

The driver's embeddings fixture is random vectors (max organic cosine
~0.51), so any >= 0.95 near-dup query over the raw table is vacuously
empty — a green-but-untested correctness row. This module plants
deterministic near-duplicates (a +0.02 component shift of every 10th
vector, planted cosine 0.987-0.99) OUTSIDE the operator, so the operator
itself (crabspark.queries.embedding_neardup_pairs) stays pure: it reads
whatever embeddings DataFrame it is given and never manufactures input.

Two forms:
- ``augmented_df(spark, sf_dir)``: the side-input as a DataFrame (used by
  the registered driver query; the DuckDB oracle mirrors it as a WITH-CTE
  view because oracle SQL is static text over pre-registered views and
  cannot reference a generated parquet path);
- ``write_parquet(sf_dir, dest)``: the same rows as a parquet file, for
  tests that want the operator to run over a plain stored table.
"""

from __future__ import annotations

import os

PLANT_EVERY = 10
PLANT_DELTA = "0.02"  # one literal string, spliced into BOTH dialects
PLANT_ID_OFFSET = 1_000_000


def augmented_df(spark, sf_dir: str):
    from pyspark.sql import functions as F

    # spread the one-split fixture file across the cores (fixture layer:
    # the side-input is small by construction, so this is a few-MB
    # round-robin; without it every consumer's band-key computation runs
    # in the single scan task of the sub-split-size parquet file)
    base = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
                "emb"
            ),
        )
    )
    planted = base.filter(F.col("vec_id") % PLANT_EVERY == 0).select(
        (F.col("vec_id") + PLANT_ID_OFFSET).alias("vec_id"),
        F.expr(f"transform(emb, x -> x + {PLANT_DELTA}D)").alias("emb"),
    )
    return base.unionByName(planted)


# the same augmentation as a DuckDB CTE body (view name `aug`), spliced
# into the oracle SQL so both dialects see identical rows
DUCK_AUG_CTE = f"""
base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings),
aug AS (
  SELECT * FROM base
  UNION ALL
  SELECT vec_id + {PLANT_ID_OFFSET} AS vec_id,
         list_transform(emb, x -> x + {PLANT_DELTA}) AS emb
  FROM base WHERE vec_id % {PLANT_EVERY} = 0)
"""


def write_parquet(spark, sf_dir: str, dest: str) -> str:
    path = os.path.join(dest, "embeddings_aug.parquet")
    augmented_df(spark, sf_dir).write.mode("overwrite").parquet(path)
    return path
