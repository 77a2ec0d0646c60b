"""Streaming page ingest: new parquet files -> canonicalized candidates."""

import os

import pytest

from crabspark.streaming import start_page_ingest
from crabspark.tables import Catalog
from fixtures import gen_pages
from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_ingest_appends_candidates(spark, tmp_path):
    data = gen_pages.generate(n_pages=25, seed=42)
    pages_dir = str(tmp_path / "incoming")
    os.makedirs(pages_dir)
    # two "arrivals"
    half = len(data["pages"]) // 2
    for i, chunk in enumerate((data["pages"][:half], data["pages"][half:])):
        chunk.to_parquet(
            f"{pages_dir}/part-{i}.parquet", index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
    cat = Catalog(str(tmp_path / "cat"), spark)
    q = start_page_ingest(spark, pages_dir, cat, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = cat.read("candidates")
    assert got is not None
    rows = got.collect()
    assert len(rows) == len(data["pages"])
    canons = {r["canon"] for r in rows}
    assert "mega1.com" in canons  # the seed page, canonicalized
    assert all(r["sha1"] and len(r["sha1"]) == 40 for r in rows)


def test_ingest_replay_guard(spark, tmp_path):
    """A replayed micro-batch id (crash between catalog commit and Spark's
    checkpoint write) must not append duplicate candidate rows."""
    data = gen_pages.generate(n_pages=10, seed=7)
    pages_dir = str(tmp_path / "incoming")
    os.makedirs(pages_dir)
    data["pages"].to_parquet(
        f"{pages_dir}/part-0.parquet", index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    cat = Catalog(str(tmp_path / "cat"), spark)
    q = start_page_ingest(spark, pages_dir, cat, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    n1 = cat.read("candidates").count()
    assert int(cat.extra("ingest_last_batch", -1)) >= 0
    # simulate the replay: fresh checkpoint dir -> Spark re-delivers batch 0
    q2 = start_page_ingest(spark, pages_dir, cat, str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert cat.read("candidates").count() == n1
