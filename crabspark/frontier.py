"""Frontier scheduling: DFS priority keys, per-host politeness rank, cap trim.

The reference's crawl order is DFS recursion perturbed by rayon
work-stealing (src/crawl.rs:94-102) with a per-thread politeness sleep
(src/crawl.rs:49-51). The rebuild makes scheduling explicit (SURVEY.md §7.4):

- **priority key**: each frontier row carries a '/'-separated string of
  fixed-width lowercase-hex child indices ('0000/0003/0001'). Byte-wise
  lexicographic order over these prefix-coded keys IS DFS preorder ('/' <
  '0' so a child sorts after its parent and before the parent's next
  sibling). Selecting the minimum-priority row each round reproduces the
  sequential reference order exactly (dfs-parity mode, batch=1).
- **throughput mode**: per-host window rank caps each host at
  ``per_host_quota`` URLs per round (politeness: one quota unit per
  delay-tick), then a global ascending-priority trim enforces the remaining
  visit cap deterministically.
- **skew**: ranking partitions by host; the subsequent fetch/extract stages
  repartition by url_sha1 (uniform) so a mega-host's batch spreads across
  all executors regardless of host skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 4 hex digits = up to 65535 surviving links per page per parent
_WIDTH = 4


def seed_priority(i: int) -> str:
    return format(i, "04x")


def child_priority(parent_priority, child_rank):
    """parent '0000/0002' + rank 3 -> '0000/0002/0003' (rank is 0-based
    position among the page's surviving links, document order)."""
    return F.concat(
        parent_priority,
        F.lit("/"),
        F.lpad(F.lower(F.hex(child_rank)), _WIDTH, "0"),
    )


def select_batch(
    frontier: DataFrame,
    remaining_cap: int,
    scheduling: str,
    per_host_quota: int,
) -> DataFrame:
    """Pick this round's visit batch from the frontier.

    dfs-parity: the single lexicographically-smallest priority row — exact
    sequential-reference order. throughput: per-host quota rank (politeness)
    then global priority trim to the cap."""
    if scheduling == "dfs-parity":
        return frontier.orderBy("priority").limit(min(1, remaining_cap))
    w_host = Window.partitionBy("host").orderBy("priority")
    ranked = frontier.withColumn("__hr", F.row_number().over(w_host))
    quota = ranked.filter(F.col("__hr") <= per_host_quota).drop("__hr")
    # global deterministic trim (F6): TakeOrdered, no full sort materialized
    return quota.orderBy("priority").limit(remaining_cap)


def first_occurrence(
    df: DataFrame, key_cols: list[str], order_cols: list
) -> DataFrame:
    """Keep the first row per key under the given order — the distributed
    form of 'first observer wins' (seen-set insert order, src/tools.rs:146)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
