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
