"""Sequential reference-semantics crawler (the golden oracle).

A direct re-implementation of the reference's recursive loop
(crawl_website_dfs, reference src/crawl.rs:29-120 + filter_links,
src/tools.rs:115-153) in its only well-defined deterministic configuration:
max_threads=1, children visited in document order. It runs over the fixture
pages dict (no Spark) but uses the SAME batch kernels as the engine
(urlkit / extract / robots), so parity failures isolate the engine's
distributed plan rather than kernel drift.

Faithful semantics checklist (SURVEY.md §2.9):
 Q3 seen records observed links, not visits -> the seed can be re-visited
    once via a back-link (consumes 2 cap units);
 Q4 failed fetch counts as visited, returns ok, stays is_complete=0;
 Q5 cap-hit returns False and try_for_each short-circuits: remaining
    siblings are not visited and every ancestor stays incomplete;
 Q6 robots-blocked / already-completed URLs enter seen; blocked ones get a
    visited row with is_blocked=1 and are never fetched;
 Q9 canonicalization strips queries -> twins collapse onto one seen key.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import pandas as pd

from crabspark import extract, robots as robotsmod, urlkit
from crabspark.config import Config


@dataclass
class OracleResult:
    # visit events in order: (canonical_url, canonical_referrer)
    visit_order: list[tuple[str, str]] = field(default_factory=list)
    # canonical url -> row state
    visited: dict[str, dict] = field(default_factory=dict)
    seen: set[str] = field(default_factory=set)
    # canonical url -> extracted text (for fetched pages)
    texts: dict[str, str] = field(default_factory=dict)
    # canonical url -> stored (trimmed) html body, when cfg.collect_html
    htmls: dict[str, bytes] = field(default_factory=dict)
    # (referrer_canon, img_canon, name, success, content_type, image_bytes)
    images: list[tuple] = field(default_factory=list)
    edges: list[tuple[str, str]] = field(default_factory=list)  # canon parent->child


class Oracle:
    def __init__(self, pages: dict[str, bytes], robots_by_host: dict[str, str],
                 cfg: Config,
                 assets: dict[str, tuple[str, bytes]] | None = None):
        self.pages = pages
        self.assets = assets
        self.cfg = cfg
        self.rules = robotsmod.build_host_rules(robots_by_host, cfg.user_agents)
        self.r = OracleResult()
        self.visit_count = 0

    # --- sqlite-equivalent row ops (reference src/sqlite.rs:24-59) ---
    def _upsert_visit(self, canon: str, ref_canon: str) -> None:
        row = self.r.visited.setdefault(
            canon, {"referrer": ref_canon, "is_complete": False, "is_blocked": False}
        )
        row["referrer"] = ref_canon
        row["is_blocked"] = False  # insert_visited_site resets is_blocked

    def _mark_blocked(self, canon: str, ref_canon: str) -> None:
        row = self.r.visited.setdefault(
            canon, {"referrer": ref_canon, "is_complete": False, "is_blocked": True}
        )
        row["referrer"] = ref_canon
        row["is_blocked"] = True

    def _mark_complete(self, canon: str) -> None:
        if canon in self.r.visited:
            self.r.visited[canon]["is_complete"] = True

    # --- filter_links (reference src/tools.rs:115-153), document order ---
    def _filter_links(self, raw_links: list[str], referrer_ser: str,
                      kind: str) -> list[str]:
        if not raw_links:
            return []
        resolved = urlkit.resolve_links(
            pd.Series(raw_links, dtype=object),
            pd.Series([referrer_ser] * len(raw_links), dtype=object),
        )
        parsed = urlkit.parse_serialize(resolved)
        ok = urlkit.valid_mask(
            parsed["domain"], self.cfg.permitted_domains,
            self.cfg.blacklist_domains, self.cfg.free_crawl,
        )
        out: list[str] = []
        ref_canon = _canon1(referrer_ser)
        for ser, dom, valid in zip(parsed["ser"], parsed["domain"], ok):
            if not valid or ser is None:
                continue
            canon = _canon1(ser)
            if canon in self.r.seen:
                continue
            if self.r.visited.get(canon, {}).get("is_complete"):
                self.r.seen.add(canon)  # completed -> seen, drop
                continue
            if self.cfg.respect_robots and self._robots_blocked(ser, dom):
                self._mark_blocked(canon, ref_canon)
                self.r.seen.add(canon)
                continue
            self.r.seen.add(canon)
            out.append(ser)
        return out

    def _robots_blocked(self, ser: str, host: str) -> bool:
        m = robotsmod.blocked_mask(
            pd.Series([ser]), pd.Series([host]), self.rules
        )
        return bool(m.iloc[0])

    # --- crawl_website_dfs (reference src/crawl.rs:29-120) ---
    def crawl(self, target_ser: str, referrer_ser: str) -> bool:
        if self.visit_count >= self.cfg.max_urls_to_visit:
            return False  # base case: cap (F6)
        canon = _canon1(target_ser)
        ref_canon = _canon1(referrer_ser)
        self.visit_count += 1
        self._upsert_visit(canon, ref_canon)
        self.r.visit_order.append((canon, ref_canon))

        html = self.pages.get(target_ser)
        if html is None:
            return True  # Q4: fetch failure counts as ok, never complete
        self.r.texts[canon] = extract.extract_text(
            pd.Series([html], dtype=object)
        ).iloc[0]
        if self.cfg.collect_html:
            # reference stores body.trim() (src/http.rs:37)
            self.r.htmls[canon] = html.strip()

        link_df = extract.extract_links(pd.Series([html], dtype=object))
        children = self._filter_links(
            list(link_df["link_links"].iloc[0]), target_ser, "link"
        )
        img_urls = self._filter_links(
            list(link_df["img_links"].iloc[0]), target_ser, "img"
        )
        if self.cfg.collect_images:
            for img_ser in img_urls:
                name = extract.image_name(pd.Series([img_ser])).iloc[0]
                if self.assets is not None:
                    # image success = asset fetched AND Content-Type is
                    # image/* (reference src/http.rs:70-76); BLOB stored
                    ct, blob = self.assets.get(img_ser, (None, None))
                    ok = bool(ct) and ct.startswith("image/")
                    self.r.images.append(
                        (canon, _canon1(img_ser), name, ok, ct,
                         blob if ok else None)
                    )
                else:
                    self.r.images.append(
                        (canon, _canon1(img_ser), name,
                         img_ser in self.pages, None, None)
                    )

        ok = True
        for child_ser in children:
            self.r.edges.append((canon, _canon1(child_ser)))
            if not self.crawl(child_ser, target_ser):
                ok = False
                break  # try_for_each short-circuit (src/crawl.rs:96-102)
        if ok:
            self._mark_complete(canon)
        return ok


def _canon1(url: str) -> str:
    return urlkit.canonicalize(pd.Series([url], dtype=object)).iloc[0]


def run_oracle(pages_df: pd.DataFrame, robots_df: pd.DataFrame,
               cfg: Config,
               assets_df: pd.DataFrame | None = None) -> OracleResult:
    """Crawl the fixture with reference semantics; returns golden state."""
    sys.setrecursionlimit(100_000)
    pages = {r.url: r.html for r in pages_df.itertuples()}
    robots_by_host = {r.host: r.robots_txt for r in robots_df.itertuples()}
    assets = (
        {r.url: (r.content_type, r.bytes) for r in assets_df.itertuples()}
        if assets_df is not None
        else None
    )
    oracle = Oracle(pages, robots_by_host, cfg, assets=assets)
    for seed in cfg.seeds:
        # reference: crawl(seed, "STARTING_URL") (src/crawl.rs:122-124);
        # the seed URL string is parsed before the first visit (main.rs:71).
        # Multi-seed is a rebuild-only extension: a later seed already
        # visited through an earlier seed's tree is not re-visited (the
        # engine consumes a queued seed row when its canon is first
        # visited) — the reference has exactly one seed, so no reference
        # semantics constrain this.
        parsed = urlkit.parse_serialize(pd.Series([seed]))
        seed_ser = parsed["ser"].iloc[0]
        if seed_ser is None:
            continue
        if _canon1(seed_ser) in oracle.r.visited:
            continue
        oracle.crawl(seed_ser, "STARTING_URL")
    return oracle.r
