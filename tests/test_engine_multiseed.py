"""Multi-seed crawl (rebuild-only extension: the reference has a single
starting_url): engine vs oracle set equality with two seeds sharing one
seen set."""

import pytest

from crabspark.config import Config
from crabspark.engine import Engine
from fixtures import gen_pages
from tests.oracle import run_oracle
from tests.sparkutil import get_spark

N_PAGES = 30


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_multiseed_set_parity(spark, tmp_path):
    data = gen_pages.generate(n_pages=N_PAGES, seed=42)
    fx = tmp_path / "fx"
    gen_pages.write(str(fx), n_pages=N_PAGES, seed=42)
    # second seed: a mid-graph page on the other mega host if present,
    # else any non-seed page
    urls = data["graph"]["urls"]
    second = next(
        (u for u in urls if u.startswith("https://mega2.net/")), urls[5]
    )
    cfg = Config.new()
    cfg.free_crawl = True
    cfg.seeds = [gen_pages.SEED_URL, second]
    cfg.max_urls_to_visit = 5000
    cfg.scheduling = "throughput"
    cfg.per_host_quota = 4

    golden = run_oracle(data["pages"], data["robots"], cfg)
    eng = Engine(
        spark, cfg, str(tmp_path / "work"),
        pages_path=f"{fx}/pages.parquet",
        robots_path=f"{fx}/robots.parquet",
    )
    eng.run()
    vis = {r["url"]: r for r in eng.read_visited().collect()}
    assert set(vis) == set(golden.visited)
    seen = {r["url"] for r in eng.read_seen().collect()}
    assert seen == golden.seen
    # both seeds actually visited
    log_urls = {r["url"] for r in eng.visit_log().collect()}
    from crabspark import urlkit
    import pandas as pd
    for s in cfg.seeds:
        assert urlkit.canonicalize(pd.Series([s + "/" if not s.endswith("/") else s])).iloc[0] in log_urls or \
               urlkit.canonicalize(pd.Series([s])).iloc[0] in log_urls
