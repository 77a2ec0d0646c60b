"""Extraction + robots kernel tests, including the reference's own cases
(reference src/tools.rs:252-287) and the quirk corpus for robots (Q7)."""

import pandas as pd

from crabspark import extract, robots
from crabspark.config import USER_AGENTS


def links1(html: str):
    df = extract.extract_links(pd.Series([html.encode()]))
    return df["link_links"].iloc[0], df["img_links"].iloc[0]


# --- reference tests (src/tools.rs:262-278) ---

def test_extract_attributes_reference():
    a, _ = links1("<html><body><a href='https://www.cnn.com'>Link</a></body></html>")
    assert a == ["https://www.cnn.com"]


def test_extract_links_reference():
    a, imgs = links1("<html><body><a href='https://www.cnn.com'>Link</a></body></html>")
    assert a == ["https://www.cnn.com"]
    assert imgs == []


# --- extraction behaviors ---

def test_document_order_and_kinds():
    html = """
    <html><body>
      <a href="/one">1</a>
      <img src="/img/a.png">
      <A HREF=/two>2</A>
      <a class=x href="/three">3</a>
      <a name="no-href">skip</a>
      <img alt="y" src='/img/b.jpg'/>
    </body></html>"""
    a, imgs = links1(html)
    assert a == ["/one", "/two", "/three"]
    assert imgs == ["/img/a.png", "/img/b.jpg"]


def test_entities_decoded_and_script_comment_skipped():
    html = (
        "<a href=\"/s?a=1&amp;b=2\">x</a>"
        "<!-- <a href='/ghost'>no</a> -->"
        "<script>var s = \"<a href='/js'>no</a>\";</script>"
        "<style>a { color: red } /* <a href='/css'>no</a> */</style>"
    )
    a, _ = links1(html)
    assert a == ["/s?a=1&b=2"]


def test_empty_and_binary_inputs():
    df = extract.extract_links(pd.Series([b"", None, "plain text no tags".encode()]))
    assert list(df["link_links"]) == [[], [], []]
    txt = extract.extract_text(pd.Series([b"", None]))
    assert list(txt) == ["", ""]


def test_extract_text_deterministic():
    html = b"""<html><head><title>T</title><style>.x{}</style></head>
    <body><h1>Hello,&nbsp;world!</h1>
    <script>ignore();</script>
    <p>Some   text
    with   spaces &amp; entities.</p></body></html>"""
    out = extract.extract_text(pd.Series([html, html]))
    assert out.iloc[0] == out.iloc[1]
    assert "ignore" not in out.iloc[0]
    assert "&amp;" not in out.iloc[0]
    assert "  " not in out.iloc[0]
    assert out.iloc[0].startswith("T Hello,")


def test_image_name():
    names = extract.image_name(
        pd.Series(
            [
                "https://a.com/img/pic.png",
                "https://a.com/img/pic.png?v=2",
                "https://a.com/",
                "https://a.com/dir/",
            ]
        )
    )
    assert list(names) == ["pic.png", "pic.png", "", ""]


# --- robots (reference src/tools.rs:21-58 semantics) ---

ROBOTS = """
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /*.pdf$

User-agent: Mozilla
Disallow: /moz-only/
"""


def check(txt, url, uas=None):
    hr = robots.HostRules(txt, uas or USER_AGENTS)
    m = robots.blocked_mask(
        pd.Series([url]), pd.Series(["h"]), {"h": hr}
    )
    return bool(m.iloc[0])


def test_specific_group_overrides_wildcard():
    # all 7 reference UAs extract to 'Mozilla' -> the Mozilla group applies
    # and the '*' group is ignored (google semantics).
    assert check(ROBOTS, "https://h/moz-only/x")
    assert not check(ROBOTS, "https://h/private/x")  # '*' group not in effect


def test_wildcard_group_when_no_specific():
    assert check(ROBOTS, "https://h/private/x", uas=["CrabBot/1.0"])
    assert not check(ROBOTS, "https://h/private/ok/page", uas=["CrabBot/1.0"])
    assert check(ROBOTS, "https://h/doc/file.pdf", uas=["CrabBot/1.0"])
    assert not check(ROBOTS, "https://h/doc/file.pdfx", uas=["CrabBot/1.0"])  # $ anchor


def test_longest_match_wins_allow_ties():
    txt = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    assert check(txt, "https://h/a/c", uas=["X"])
    assert not check(txt, "https://h/a/b/c", uas=["X"])


def test_empty_and_missing_robots_allowed():
    assert not check("", "https://h/anything")
    m = robots.blocked_mask(pd.Series(["https://h/x"]), pd.Series(["h"]), {})
    assert not bool(m.iloc[0])


def test_malformed_robots_allowed_q7():
    garbage = "\x00\xff{{{ not robots at all ::::\nDisallow /oops\n"
    assert not check(garbage, "https://h/x")


def test_disallow_all():
    txt = "User-agent: *\nDisallow: /\n"
    assert check(txt, "https://h/")
    assert check(txt, "https://h/x?q=1")
    assert not check(txt, "https://h/robots.txt")  # robots.txt always allowed


def test_query_is_matched():
    txt = "User-agent: *\nDisallow: /*?session=\n"
    assert check(txt, "https://h/p?session=1", uas=["X"])
    assert not check(txt, "https://h/p", uas=["X"])
