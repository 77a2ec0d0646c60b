"""Fixture + oracle sanity: the synthetic web exercises every quirk and the
oracle reproduces the reference's observable semantics on it."""

import pandas as pd
import pytest

from crabspark.config import Config
from fixtures import gen_pages
from tests.oracle import run_oracle


@pytest.fixture(scope="module")
def fixture_data():
    return gen_pages.generate(n_pages=60, seed=42)


@pytest.fixture(scope="module")
def golden(fixture_data):
    cfg = Config.new()
    cfg.free_crawl = True
    cfg.blacklist_domains = ["evil.com"]
    cfg.max_urls_to_visit = 5000
    cfg.seeds = [gen_pages.SEED_URL]
    return run_oracle(fixture_data["pages"], fixture_data["robots"], cfg)


def canon(u):
    from crabspark import urlkit
    return urlkit.canonicalize(pd.Series([u])).iloc[0]


def test_fixture_deterministic():
    a = gen_pages.generate(n_pages=30, seed=42)
    b = gen_pages.generate(n_pages=30, seed=42)
    assert a["pages"]["url"].tolist() == b["pages"]["url"].tolist()
    assert a["pages"]["html"].tolist() == b["pages"]["html"].tolist()
    assert a["pages"]["text"].tolist() == b["pages"]["text"].tolist()


def test_oracle_deterministic(fixture_data):
    cfg = Config.new()
    cfg.free_crawl = True
    cfg.max_urls_to_visit = 100
    cfg.seeds = [gen_pages.SEED_URL]
    r1 = run_oracle(fixture_data["pages"], fixture_data["robots"], cfg)
    r2 = run_oracle(fixture_data["pages"], fixture_data["robots"], cfg)
    assert r1.visit_order == r2.visit_order
    assert r1.visited == r2.visited


def test_all_crawlable_pages_visited(fixture_data, golden):
    # with a generous cap, every reachable non-blocked page is visited
    n = fixture_data["graph"]["n_crawlable"]
    visited = {u for u, _ in golden.visit_order}
    for u in fixture_data["graph"]["urls"][:n]:
        c = canon(u)
        host = u.split("/")[2]
        if host == "evil.com":
            continue
        assert c in visited or golden.visited.get(c, {}).get("is_blocked"), u


def test_robots_quirks(golden):
    # '*' group shadowed by the Mozilla group on mega1 (google semantics)
    assert canon("https://www.mega1.com/moz-block/secret.html") not in {
        u for u, _ in golden.visit_order
    }
    assert golden.visited[canon("https://www.mega1.com/moz-block/secret.html")][
        "is_blocked"
    ]
    assert canon("https://www.mega1.com/all-block/but-allowed.html") in {
        u for u, _ in golden.visit_order
    }
    # mega2 '*' Disallow /private/ with Allow /private/open/
    assert golden.visited[canon("https://mega2.net/private/hidden.html")]["is_blocked"]
    assert canon("https://mega2.net/private/open/ok.html") in {
        u for u, _ in golden.visit_order
    }
    # malformed robots -> allowed (Q7)
    assert canon("https://badrobots.org/fine.html") in {u for u, _ in golden.visit_order}
    # disallow-all host
    assert golden.visited[canon("https://blockedall.org/anything.html")]["is_blocked"]


def test_q3_seed_revisited(golden):
    seed_c = canon(gen_pages.SEED_URL)
    n = sum(1 for u, _ in golden.visit_order if u == seed_c)
    assert n == 2  # first visit + one back-link re-visit, then seen


def test_q4_fetch_failures_visited_incomplete(golden):
    c404 = canon("https://site0.org/missing-404.html")
    assert c404 in {u for u, _ in golden.visit_order}
    assert not golden.visited[c404]["is_complete"]
    # query-twin: visited via '?x=1', fetch misses, second twin seen-dropped
    tw = canon("https://www.mega1.com/twin/only-via-query.html?x=1")
    assert tw == "mega1.com/twin/only-via-query.html"  # Q9 collapse
    assert sum(1 for u, _ in golden.visit_order if u == tw) == 1
    assert not golden.visited[tw]["is_complete"]
    assert tw not in golden.texts  # never actually fetched


def test_blacklist_and_invalid(golden):
    visited = {u for u, _ in golden.visit_order}
    assert not any("evil.com" in u for u in visited)
    assert not any("1.2.3.4" in u for u in visited)


def test_completion_with_generous_cap(golden):
    # nothing hit the cap, so every *fetched* page is complete; fetch
    # failures stay incomplete (Q4)
    seed_c = canon(gen_pages.SEED_URL)
    assert golden.visited[seed_c]["is_complete"]
    incomplete = {
        u for u, row in golden.visited.items()
        if not row["is_complete"] and not row["is_blocked"]
    }
    assert incomplete == {u for u in incomplete if u not in golden.texts}


def test_cap_poisons_ancestors_q5(fixture_data):
    cfg = Config.new()
    cfg.free_crawl = True
    cfg.max_urls_to_visit = 10
    cfg.seeds = [gen_pages.SEED_URL]
    r = run_oracle(fixture_data["pages"], fixture_data["robots"], cfg)
    assert len(r.visit_order) == 10  # increments before fetch, exact cap
    # cap-hit poisons the in-progress ancestor chain: at least one FETCHED
    # page stays incomplete (with a generous cap, all fetched pages
    # complete). Note Q10: a RE-visited page (the seed via its back-link)
    # can still be marked complete mid-crawl because its second visit sees
    # all links as seen -> zero children -> mark_url_complete fires
    # (reference src/crawl.rs:104-110) — so we do not assert on the seed.
    assert any(
        u in r.texts and not row["is_complete"] and not row["is_blocked"]
        for u, row in r.visited.items()
    )


def test_images_recorded(golden):
    assert golden.images  # img survivors recorded as metadata
    names = {t[2] for t in golden.images}
    assert any(n.endswith(".png") for n in names)
    # imgs enter seen too (Q6/U3)
    img_canons = {t[1] for t in golden.images}
    assert img_canons <= golden.seen
