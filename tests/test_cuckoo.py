"""CuckooFilter: the deletable half of the north rule's "bloom/cuckoo
URL-seen" prefilter. The load-bearing property is NO FALSE NEGATIVES
while unsaturated (a false negative would false-drop a URL from the
crawl); saturation must degrade to route-everything-exact, never to
silent key loss."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from crabspark.cuckoo import CuckooFilter


def _sha1s(tag: str, n: int) -> np.ndarray:
    return np.array(
        [hashlib.sha1(f"{tag}-{i}".encode()).hexdigest() for i in range(n)],
        dtype="U40",
    )


def test_no_false_negatives_at_70pct_load():
    keys = _sha1s("a", 50_000)
    f = CuckooFilter(capacity=60_000)
    f.add_array(keys)
    assert not f.saturated
    hits = f.might_contain(pd.Series(keys))
    assert hits.all(), f"{(~hits).sum()} false negatives"


def test_false_positive_rate_is_tiny():
    f = CuckooFilter(capacity=60_000)
    f.add_array(_sha1s("a", 50_000))
    probe = pd.Series(_sha1s("other", 50_000))
    fpr = f.might_contain(probe).mean()
    # theoretical ~ 2*4/2^16 = 0.012%; allow 10x slack
    assert fpr < 0.005, fpr


def test_delete_then_probe():
    keep = _sha1s("keep", 20_000)
    drop = _sha1s("drop", 20_000)
    f = CuckooFilter(capacity=60_000)
    f.add_array(keep)
    f.add_array(drop)
    removed = f.delete_array(drop)
    assert removed == len(drop)
    # no collateral damage: every kept key still present
    assert f.might_contain(pd.Series(keep)).all()
    # dropped keys mostly gone (residual hits are fp collisions with keys
    # still stored — bounded by the false-positive rate)
    assert f.might_contain(pd.Series(drop)).mean() < 0.005


def test_saturation_degrades_to_all_true():
    f = CuckooFilter(capacity=1)  # floor geometry: 1024 buckets * 4 slots
    f.add_array(_sha1s("x", 8_000))  # ~2x the slot count
    assert f.saturated
    # saturated filter must never claim "definitely new"
    assert f.might_contain(pd.Series(_sha1s("never-inserted", 100))).all()


def test_save_load_roundtrip(tmp_path):
    keys = _sha1s("p", 10_000)
    f = CuckooFilter(capacity=60_000)
    f.add_array(keys)
    path = str(tmp_path / "filter.npy")
    f.save(path)
    g = CuckooFilter.load(path, capacity=60_000)
    assert g.nb == f.nb and not g.saturated
    assert (g.table == f.table).all()
    assert g.might_contain(pd.Series(keys)).all()
    # saturated flag survives persistence
    f.saturated = True
    f.save(path)
    assert CuckooFilter.load(path, capacity=60_000).saturated


def test_merge_same_geometry():
    a_keys = _sha1s("a", 15_000)
    b_keys = _sha1s("b", 15_000)
    a = CuckooFilter(capacity=60_000)
    b = CuckooFilter(capacity=60_000)
    a.add_array(a_keys)
    b.add_array(b_keys)
    assert a.nb == b.nb
    a.merge_table(b.table)
    assert not a.saturated
    assert a.might_contain(pd.Series(a_keys)).all()
    assert a.might_contain(pd.Series(b_keys)).all()


def test_merge_saturated_is_sticky():
    a = CuckooFilter(capacity=60_000)
    a.merge_table(np.zeros((a.nb, 4), dtype=np.uint16), other_saturated=True)
    assert a.saturated


def test_distributed_build_matches_local():
    from tests.sparkutil import get_spark

    spark = get_spark()
    keys = _sha1s("d", 20_000)
    df = spark.createDataFrame(
        pd.DataFrame({"url_sha1": keys})
    ).repartition(8)
    dist = CuckooFilter(capacity=60_000)
    dist.add_dataframe(df, sha1_col="url_sha1")
    assert not dist.saturated
    assert dist.might_contain(pd.Series(keys)).all()
    # same false-positive envelope as a locally-built filter
    probe = pd.Series(_sha1s("probe", 20_000))
    assert dist.might_contain(probe).mean() < 0.005


def test_delete_misuse_flips_saturated():
    """Round-5 advisor fix: deleting never-inserted keys would silently
    evict colliding live keys' fingerprints (false negatives). A
    legitimately-inserted key's fingerprint is always findable, so a
    MISSED delete proves misuse — the filter must flip `saturated`
    (degrade to all-True; the exact anti-join failsafe downstream stays
    correct) rather than corrupt."""
    keys = _sha1s("live", 5_000)
    never = _sha1s("ghost", 500)
    f = CuckooFilter(capacity=20_000)
    f.add_array(keys)
    assert f.n_inserted == len(keys) and f.n_deleted == 0
    f.delete_array(never)  # some ghosts will miss -> guard trips
    assert f.saturated
    # no false negatives ever: saturated answers True for everything
    assert f.might_contain(pd.Series(keys)).all()
    assert f.might_contain(pd.Series(never)).all()
    # and further deletes are no-ops on a saturated filter
    assert f.delete_array(keys[:10]) == 0


def test_delete_guard_counts_survive_save_load(tmp_path):
    keys = _sha1s("x", 1_000)
    f = CuckooFilter(capacity=10_000)
    f.add_array(keys)
    f.delete_array(keys[:100])
    path = str(tmp_path / "f.npz")
    f.save(path)
    g = CuckooFilter.load(path, capacity=10_000)
    assert (g.n_inserted, g.n_deleted) == (f.n_inserted, f.n_deleted)
    assert not g.saturated
    # a loaded filter still enforces the guard
    g.delete_array(_sha1s("ghost2", 200))
    assert g.saturated
