"""Pandas-UDF wrappers around the pure kernels — the engine's only Python
execution surface (north rule: vectorized Arrow UDFs, no per-row Python).

Exactly four UDF families, per SURVEY.md §2.8: link extraction, text
extraction, the resolve/validate/canonicalize chain (fused into ONE UDF so a
candidate crosses the Arrow boundary once), and the per-round robots
matcher (built against that round's broadcast host-rules)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from crabspark import extract, robots, urlkit


def extract_links_udf():
    @F.pandas_udf("link_links array<string>, img_links array<string>")
    def _extract(html: pd.Series) -> pd.DataFrame:
        return extract.extract_links(html)

    return _extract


def extract_page_udf():
    """Fused text + link extraction: the html binary crosses the Arrow
    boundary exactly once per fetched page (it is by far the widest
    column; everything downstream carries only strings/arrays)."""

    @F.pandas_udf(
        "text string, link_links array<string>, img_links array<string>"
    )
    def _page(html: pd.Series) -> pd.DataFrame:
        return extract.extract_page(html)

    return _page


def extract_text_udf():
    @F.pandas_udf("string")
    def _text(html: pd.Series) -> pd.Series:
        return extract.extract_text(html)

    return _text


def resolve_full_udf(permitted: list[str], blacklist: list[str], free_crawl: bool):
    """href × referrer -> (ser, domain, canon, sha1, valid): the whole
    per-link pipeline of filter_links (reference src/tools.rs:119-130) in
    one Arrow crossing."""
    permitted = list(permitted)
    blacklist = list(blacklist)

    @F.pandas_udf("ser string, domain string, canon string, sha1 string, valid boolean")
    def _resolve(href: pd.Series, referrer: pd.Series) -> pd.DataFrame:
        resolved = urlkit.resolve_links(href, referrer)
        parsed = urlkit.parse_serialize(resolved)
        valid = urlkit.valid_mask(parsed["domain"], permitted, blacklist, free_crawl)
        canon = urlkit.canonicalize(parsed["ser"]).where(valid, None)
        sha1 = urlkit.sha1_hex(canon)
        return pd.DataFrame(
            {
                "ser": parsed["ser"],
                "domain": parsed["domain"],
                "canon": canon,
                "sha1": sha1,
                "valid": valid.fillna(False),
            }
        )

    return _resolve


def blocked_udf(host_rules: dict[str, robots.HostRules], respect_robots: bool):
    """Per-round robots matcher over the broadcast {host: rules} map
    (J4/E4; the reference's INMEMORY_CACHE equivalent)."""

    @F.pandas_udf("boolean")
    def _blocked(ser: pd.Series, host: pd.Series) -> pd.Series:
        return robots.blocked_mask(ser, host, host_rules, respect_robots)

    return _blocked


def blocked_join_udf(user_agents: list[str], respect_robots: bool):
    """Executor-side robots matcher: candidates arrive already JOINED to
    their host's robots.txt body (candidates ⋈ robots on host), so no
    robots body ever materializes on the driver — at web scale a round can
    touch 10^6+ hosts × multi-KB bodies. Rules are parsed once per distinct
    (host) within each Arrow batch (candidates of a host cluster into the
    same batches after the join); hosts with no robots row (null body) are
    allowed, exactly like the driver-map path."""
    user_agents = list(user_agents)

    @F.pandas_udf("boolean")
    def _blocked(
        ser: pd.Series, host: pd.Series, robots_txt: pd.Series
    ) -> pd.Series:
        # cached_host_rules: a mega-host's body parses once per worker
        # process, not once per Arrow batch (post-join batches mix hosts)
        rules = robots.cached_host_rules(
            {
                h: t
                for h, t in zip(host, robots_txt)
                if isinstance(h, str) and isinstance(t, str)
            },
            user_agents,
        )
        return robots.blocked_mask(ser, host, rules, respect_robots)

    return _blocked


def _trim_body_one(b):
    """C5 body trim, Unicode-parity version. The reference stores
    body.trim() (Rust str::trim, src/http.rs:37), which trims *Unicode*
    whitespace of an always-valid-UTF-8 String. Here bodies are raw bytes:
    ASCII-strip first (cheap, byte-safe), then — only when a stripped edge
    byte is >= 0x80, i.e. could be multibyte whitespace like U+00A0/U+3000
    — decode-trim-reencode. Invalid UTF-8 keeps the byte-safe ASCII trim
    (documented deviation: a round trip would corrupt it with U+FFFD)."""
    if b is None:
        return None
    s = bytes(b).strip()
    if s and (s[0] >= 0x80 or s[-1] >= 0x80):
        try:
            s = s.decode("utf-8").strip().encode("utf-8")
        except UnicodeDecodeError:
            pass
    return s


def trim_body_udf():
    """C5 body trim without an unconditional UTF-8 round trip — see
    ``_trim_body_one`` for the Rust-``str::trim`` parity contract."""

    @F.pandas_udf("binary")
    def _trim(html: pd.Series) -> pd.Series:
        return html.map(_trim_body_one)

    return _trim


def image_name_udf():
    @F.pandas_udf("string")
    def _name(ser: pd.Series) -> pd.Series:
        return extract.image_name(ser)

    return _name


def canonicalize_udf():
    @F.pandas_udf("string")
    def _canon(url: pd.Series) -> pd.Series:
        return urlkit.canonicalize(url)

    return _canon
