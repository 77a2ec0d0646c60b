"""HTML extraction kernels (pure pandas; wrapped as pandas UDFs by the engine).

- ``extract_links``: a[href] / img[src] attribute values in document order —
  the semantics of the reference's selector walk (reference
  src/tools.rs:92-112, html5ever via scraper). The reference only ever reads
  those two attribute selectors, so a columnar regex scan over the cleaned
  markup (comments / script / style stripped, entity-unescaped values, any
  attribute order, any quoting) reproduces it on real-world markup without a
  per-row DOM build.

- ``extract_text``: the rebuild's text extraction (absent in the reference,
  which stores raw html only — reference src/http.rs:36-41; required by
  BASELINE.json input_hint: byte-identical text per url). Deterministic
  definition: drop comments/script/style, strip tags, decode entities,
  collapse all whitespace runs to single spaces, trim.

Both operate on ``html`` as *binary* (bytes, per input_hint), decoded as
UTF-8 with replacement.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

_A_HREF_RE = re.compile(
    r"""<a\b[^>]*?\shref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I | re.S
)
_IMG_SRC_RE = re.compile(
    r"""<img\b[^>]*?\ssrc\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I | re.S
)


def decode_html(html: pd.Series) -> pd.Series:
    """binary -> str, UTF-8 with replacement; passes str through."""
    def _dec(v):
        if v is None:
            return ""
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).decode("utf-8", errors="replace")
        return str(v)

    return pd.Series([_dec(v) for v in html], index=html.index, dtype=object)


def _clean(doc: pd.Series) -> pd.Series:
    doc = doc.str.replace(_COMMENT_RE, " ", regex=True)
    doc = doc.str.replace(_SCRIPT_RE, " ", regex=True)
    doc = doc.str.replace(_STYLE_RE, " ", regex=True)
    return doc


def _unescape(v: str) -> str:
    return _html.unescape(v) if "&" in v else v


def _attr_values(cleaned: pd.Series, pattern: re.Pattern) -> pd.Series:
    """All attribute values per row, document order, entity-decoded."""
    matches = cleaned.str.extractall(pattern)
    # empty captures come back as NaN from extractall; an empty href is
    # still an observed link (the reference junk-filters it downstream)
    arr = matches.to_numpy(dtype=object)
    merged = pd.Series(
        [next((v for v in row if isinstance(v, str)), "") for row in arr],
        index=matches.index,
        dtype=object,
    )
    out = pd.Series([[] for _ in range(len(cleaned))], index=cleaned.index, dtype=object)
    if len(merged):
        grouped = merged.groupby(level=0, sort=False).agg(list)
        for idx, vals in grouped.items():
            out.at[idx] = [_unescape(v) for v in vals]
    return out


def extract_links(html: pd.Series) -> pd.DataFrame:
    """Columns ``link_links`` (a[href]) and ``img_links`` (img[src]), each
    an array of raw attribute strings in document order (order matters for
    DFS parity, SURVEY.md §7.4)."""
    cleaned = _clean(decode_html(html))
    return pd.DataFrame(
        {
            "link_links": _attr_values(cleaned, _A_HREF_RE),
            "img_links": _attr_values(cleaned, _IMG_SRC_RE),
        },
        index=html.index,
    )


def extract_text(html: pd.Series) -> pd.Series:
    """Deterministic text extraction; whole chain is columnar pandas str ops
    plus a batch entity-unescape."""
    cleaned = _clean(decode_html(html))
    text = cleaned.str.replace(_TAG_RE, " ", regex=True)
    text = pd.Series(
        [_unescape(v) for v in text], index=text.index, dtype=object
    )
    text = text.str.replace(_WS_RE, " ", regex=True).str.strip()
    return text


def image_name(urls: pd.Series) -> pd.Series:
    """Image-name extraction: last path segment of the URL (reference
    src/tools.rs:78). The reference's `.unwrap_or(".jpg")` default only
    fires for non-hierarchical URLs, which http(s) never are — so the
    observable semantics is simply 'substring after the last slash of the
    path', possibly empty."""
    path = urls.str.replace(r"^[a-z]+://[^/]*", "", regex=True)
    path = path.str.replace(r"[?#].*$", "", regex=True)
    return path.str.replace(r"^.*/", "", regex=True)
