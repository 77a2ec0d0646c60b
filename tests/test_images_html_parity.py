"""Image-fetch fidelity (S2/S8/F5) and html-trim (C5) parity.

The engine joins image candidates to the assets table: success requires an
asset row with Content-Type image/* (reference src/http.rs:70-76) and the
BLOB is stored (src/sqlite.rs:33-39). collect_html stores body.trim()
(src/http.rs:37). Both compared byte-for-byte against the sequential
oracle on the same fixture.
"""

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


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    out = tmp_path_factory.mktemp("fixture_img")
    d = gen_pages.write(str(out), n_pages=N_PAGES, seed=42)
    d["dir"] = str(out)
    return d


@pytest.fixture(scope="module")
def cfg():
    c = Config.new()
    c.seeds = [gen_pages.SEED_URL]
    c.max_urls_to_visit = 5000
    c.scheduling = "throughput"
    c.per_host_quota = 4
    c.collect_images = True
    c.collect_html = True
    return c


@pytest.fixture(scope="module")
def engine(spark, data, cfg, tmp_path_factory):
    eng = Engine(
        spark, cfg, str(tmp_path_factory.mktemp("work_img")),
        pages_path=f"{data['dir']}/pages.parquet",
        robots_path=f"{data['dir']}/robots.parquet",
        assets_path=f"{data['dir']}/assets.parquet",
    )
    eng.run()
    return eng


@pytest.fixture(scope="module")
def golden(data, cfg):
    return run_oracle(
        data["pages"], data["robots"], cfg, assets_df=data["assets"]
    )


def test_fixture_exercises_all_image_outcomes(data, golden):
    """The fixture must cover: image ok, missing asset, and the
    content-type reject — otherwise the predicate is untestable."""
    assert any(t[3] for t in golden.images), "no successful image"
    assert any(
        not t[3] and t[4] is None for t in golden.images
    ), "no missing-asset image"
    assert any(
        not t[3] and t[4] is not None for t in golden.images
    ), "no content-type-rejected image"


def test_image_rows_match_oracle(engine, golden, data):
    """One row per image canon; name/success/content_type/BLOB must match
    the oracle exactly. Referrer is the FIRST observer — order-dependent
    for images referenced by several pages (the engine's batched rounds
    may legitimately observe via a different page than the sequential
    DFS), so ambiguous referrers are checked against the fixture graph's
    actual referencing pages instead."""
    import pandas as pd

    from crabspark import urlkit

    imgs = engine.catalog.read("images")
    assert imgs is not None
    got = {
        r["url"]: (
            r["referrer"], r["name"], r["success"], r["content_type"],
            bytes(r["image"]) if r["image"] is not None else None,
        )
        for r in imgs.collect()
    }
    want = {url: (ref, name, ok, ct, blob)
            for ref, url, name, ok, ct, blob in golden.images}
    assert set(got) == set(want)
    # fixture-graph observer sets (canonical image -> canonical pages)
    g = data["graph"]
    srcs, refs = [], []
    for u in g["urls"]:
        for src in g["images"][u]:
            srcs.append(src)
            refs.append(u)
    rs = urlkit.resolve_links(pd.Series(srcs, dtype=object),
                              pd.Series(refs, dtype=object))
    img_canon = urlkit.canonicalize(urlkit.parse_serialize(rs)["ser"])
    ref_canon = urlkit.canonicalize(pd.Series(refs, dtype=object))
    observers: dict[str, set] = {}
    for ic, rc in zip(img_canon, ref_canon):
        if ic is not None:
            observers.setdefault(ic, set()).add(rc)
    for url, (ref, name, ok, ct, blob) in want.items():
        g_ref, g_name, g_ok, g_ct, g_blob = got[url]
        assert (g_name, g_ok, g_ct, g_blob) == (name, ok, ct, blob), url
        if len(observers.get(url, set())) <= 1:
            assert g_ref == ref, url
        else:
            assert g_ref in observers[url], url


def test_stored_html_is_trimmed(engine, golden, data):
    fetched = engine.catalog.read("fetched")
    got = {r["url"]: bytes(r["html"]) for r in fetched.collect()}
    assert set(got) == set(golden.htmls)
    for url, body in golden.htmls.items():
        assert got[url] == body, url
        assert not body[:1].isspace() and not body[-1:].isspace()
    # the trim is observable: raw fixture bodies carry the padding
    raw = data["pages"]["html"].iloc[0]
    assert raw != raw.strip()


def test_ua_rotation_recorded(engine, cfg):
    """C6: rotating mode stamps each fetched page with a determinized UA
    pick from the configured list."""
    fetched = engine.catalog.read("fetched")
    uas = {r["ua"] for r in fetched.select("ua").distinct().collect()}
    assert uas <= set(cfg.user_agents)
    assert len(uas) >= 2  # rotation actually rotates
