"""Deterministic synthetic Common-Crawl-style pages fixture (FIXTURES.md).

Generates the crawl input tables per BASELINE.json's input_hint:

  pages(url string, warc_ts timestamp, html binary, text string, lang string)
  robots(host string, robots_txt string)
  seeds(url string, priority string)
  assets(url string, content_type string, bytes binary)   -- image fetches

Everything is a pure function of (n_pages, seed): byte-identical across
runs. The embedded link graph exercises every branch of the reference's
resolve ladder (reference src/http.rs:88-198) and every quirk in
SURVEY.md §2.9:

- reachable tree edges use surviving href forms (absolute, protocol-
  relative, bare, './', '../'), validated against the real resolve kernel
  at generation time;
- decorative links cover the dropped forms: root-relative (Q1), clkn/rel,
  junk, pseudo-schemes;
- query-twin links 'p?x=1' / 'p?x=2' to a page reachable ONLY via them
  (Q9: same canonical key, fetch misses -> failure visit);
- links to URLs absent from pages (Q4 fetch-failure path);
- a back-link to the seed from a depth>=2 page (Q3 double-visit);
- host skew: two mega-hosts hold ~55% of pages, a long tail the rest;
- robots: wildcard disallow subtree (mega2), disallow-all host, malformed
  robots (Q7 -> allowed), and a UA-specific group on mega1 that SHADOWS the
  '*' group (google semantics: /moz-block/ blocked, /all-block/ allowed);
- img links (recorded as metadata, robots-checked and seen-inserted like
  the reference, src/tools.rs:155-165).
"""

from __future__ import annotations

import datetime
import hashlib
import os
import random
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crabspark import extract, urlkit  # noqa: E402

MEGA1 = "www.mega1.com"
MEGA2 = "mega2.net"
SEED_URL = f"https://{MEGA1}/"

ROBOTS_ROWS = [
    # '*' disallows /private/ ; applies because no Mozilla group
    (MEGA2, "User-agent: *\nDisallow: /private/\nAllow: /private/open/\n"),
    # disallow-everything host
    ("blockedall.org", "User-agent: *\nDisallow: /\n"),
    # malformed -> treated as allowed (Q7)
    ("badrobots.org", "\x00\x01{{{ not: robots ::: \nDisallow /oops\n"),
    # UA-specific group shadows '*' (all 7 reference UAs extract 'Mozilla'):
    # /moz-block/ IS blocked, /all-block/ is NOT.
    (MEGA1, "User-agent: Mozilla\nDisallow: /moz-block/\n\n"
            "User-agent: *\nDisallow: /all-block/\n"),
]

JUNK_LINKS = [
    "", "/", "#", "?page=2", "mailto:tips@example.com", "javascript:void(0)",
    "tel:+15550100", "data:image/png;base64,AAAA", "itms-apps://itunes",
    "..//", '\\"', "sms:5550100", "vbscript:beep", ":invalid-thing",
]


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big")


def _warc_ts(url: str) -> datetime.datetime:
    base = datetime.datetime(2025, 1, 15, tzinfo=datetime.timezone.utc)
    return base + datetime.timedelta(seconds=_h(url) % (86400 * 30))


def _hosts(n_pages: int) -> list[tuple[str, float]]:
    n_tail = max(3, n_pages // 50)
    tail_w = 0.45 / n_tail
    return [(MEGA1, 0.35), (MEGA2, 0.20)] + [
        (f"site{i}.org", tail_w) for i in range(n_tail)
    ]


def _page_path(rng: random.Random, host: str, i: int) -> str:
    sec = rng.randrange(1 + i // 40)
    shape = rng.randrange(4)
    if shape == 0:
        return f"/sec{sec}/art{i}.html"
    if shape == 1:
        return f"/sec{sec}/sub{sec}/page{i}.html"
    if shape == 2:
        return f"/p{i}"
    return f"/sec{sec}/"  # section index (trailing slash)


def _edge_href_candidate(rng: random.Random, parent: str, child: str) -> str:
    """Pick a deterministic candidate href form for a must-survive tree
    edge. Candidates are later batch-validated against the real resolve
    kernel (absolute fallback where a form does not round-trip)."""
    forms = [child]  # absolute
    if child.startswith("https://"):
        forms.append(child[len("https:"):])  # protocol-relative
    p_host = parent.split("/")[2]
    c_host = child.split("/")[2]
    if p_host == c_host:
        p_path = "/" + parent.split("/", 3)[3] if parent.count("/") >= 3 else "/"
        c_path = "/" + child.split("/", 3)[3] if child.count("/") >= 3 else "/"
        p_dir = p_path.rsplit("/", 1)[0] + "/"
        if c_path.startswith(p_dir) and c_path != p_dir:
            rel = c_path[len(p_dir):]
            forms.append(rel)           # bare relative
            forms.append("./" + rel)    # same-dir
        parent_dir = p_dir.rstrip("/").rsplit("/", 1)[0] + "/"
        if c_path.startswith(parent_dir) and c_path != parent_dir:
            forms.append("../" + c_path[len(parent_dir):])
    return forms[rng.randrange(len(forms))]


def _validate_edges(hrefs: list[str], parents: list[str],
                    children: list[str]) -> list[str]:
    """One batched resolve over all tree edges; any form that does not
    round-trip to its child falls back to the absolute URL."""
    out = urlkit.resolve_links(
        pd.Series(hrefs, dtype=object), pd.Series(parents, dtype=object)
    )
    ser = urlkit.parse_serialize(out)["ser"]
    return [
        h if s == c else c
        for h, s, c in zip(hrefs, ser, children)
    ]


def build_graph(n_pages: int = 2000, seed: int = 42,
                branching: int | None = None) -> dict:
    """branching=None: parents drawn uniformly from all earlier pages
    (depth ~ ln n — the parity-test shape). branching=B: parents drawn from
    the first n/B pages only, giving a shallow fan-out tree (depth ~
    log_B n) — the bench shape, where each BSP round carries a huge batch
    like a real Common-Crawl frontier."""
    rng = random.Random(seed)
    hosts = _hosts(n_pages)
    hnames = [h for h, _ in hosts]
    hweights = [w for _, w in hosts]

    urls: list[str] = [SEED_URL]
    seen_urls = {SEED_URL}
    while len(urls) < n_pages:
        i = len(urls)
        host = rng.choices(hnames, hweights)[0]
        u = f"https://{host}{_page_path(rng, host, i)}"
        if u in seen_urls:
            u = f"https://{host}/uniq/{i}.html"
        seen_urls.add(u)
        urls.append(u)

    # special quirk pages (exist in `pages`, wired below)
    twin_target = f"https://{MEGA1}/twin/only-via-query.html"
    moz_blocked = f"https://{MEGA1}/moz-block/secret.html"
    all_block = f"https://{MEGA1}/all-block/but-allowed.html"
    mega2_private = f"https://{MEGA2}/private/hidden.html"
    mega2_open = f"https://{MEGA2}/private/open/ok.html"
    bad_robots_page = "https://badrobots.org/fine.html"
    specials = [twin_target, moz_blocked, all_block, mega2_private,
                mega2_open, bad_robots_page]
    urls.extend(s for s in specials if s not in seen_urls)

    # tree edges guarantee reachability of urls[1:n_pages]
    links: dict[str, list[str]] = {u: [] for u in urls}
    e_hrefs, e_parents, e_children = [], [], []
    for i, child in enumerate(urls[1:n_pages], start=1):
        # branching=B draws parents from the first i/B pages: depth ~ log_B n
        hi = i if branching is None else max(1, min(i, i // branching + 1))
        parent = urls[rng.randrange(hi)] if i > 1 else SEED_URL
        e_hrefs.append(_edge_href_candidate(rng, parent, child))
        e_parents.append(parent)
        e_children.append(child)
    for parent, href in zip(e_parents, _validate_edges(e_hrefs, e_parents, e_children)):
        links[parent].append(href)

    # wire the quirk edges from stable early pages
    anchor = urls[min(3, len(urls) - 1)]
    links[SEED_URL].append(all_block)            # allowed despite '*' rule
    links[SEED_URL].append(moz_blocked)          # blocked by Mozilla group
    links[SEED_URL].append(mega2_private)        # blocked by '*' Disallow
    links[SEED_URL].append(mega2_open)           # Allow overrides Disallow
    links[SEED_URL].append(bad_robots_page)      # malformed robots -> allowed
    links[anchor].append(twin_target + "?x=1")   # Q9 twins: fetch will miss
    links[anchor].append(twin_target + "?x=2")   # ... second is seen-dropped
    links[anchor].append(SEED_URL)               # Q3 back-link to seed
    links[anchor].append("https://site0.org/missing-404.html")   # Q4
    links[anchor].append("https://blockedall.org/anything.html")  # robots-block
    links[anchor].append("https://evil.com/tracker")  # blacklist fixture
    links[anchor].append("http://1.2.3.4/raw-ip")     # no domain -> invalid

    # decorative links: junk, dropped forms, duplicates, cycles
    for i, u in enumerate(urls[:n_pages]):
        r = random.Random(seed * 1_000_003 + i)
        extra = []
        if r.random() < 0.6:
            extra.append(JUNK_LINKS[i % len(JUNK_LINKS)])
        if r.random() < 0.3:
            # root-relative to a real page: silently dropped (Q1)
            t = urls[r.randrange(len(urls))]
            extra.append("/" + t.split("/", 3)[3] if t.count("/") >= 3 else "/x")
        if r.random() < 0.25 and i > 0:
            extra.append(urls[r.randrange(i)])  # cycle / duplicate edge
        if r.random() < 0.15:
            extra.append(u)  # self-link
        if r.random() < 0.1:
            extra.append("clkn/rel/partner/offer")  # scheme-less (dropped)
        if r.random() < 0.1:
            extra.append("clkn/http/ads.example.net/click")  # off-tail host
        links[u].extend(extra)

    # image links: bare/absolute survive; root-relative img dropped (Q1)
    images: dict[str, list[str]] = {u: [] for u in urls}
    for i, u in enumerate(urls[:n_pages]):
        r = random.Random(seed * 7_000_003 + i)
        if r.random() < 0.5:
            images[u].append(f"img/{i % 97}.png")
        if r.random() < 0.25:
            images[u].append(f"https://cdn.{MEGA1}/assets/{i % 31}.jpg")
        if r.random() < 0.2:
            images[u].append("/static/logo.png")  # dropped (Q1)
        if r.random() < 0.05:
            images[u].append(f"https://cdn.{MEGA1}/assets/")  # empty name
    return {"urls": urls, "links": links, "images": images,
            "n_crawlable": n_pages}


def _render_html(url: str, hrefs: list[str], imgs: list[str],
                 body_scale: int = 1) -> bytes:
    h = _h(url)
    title = f"Page {h % 100000}"
    paras = []
    words = ["alpha", "beta", "gamma", "delta", "web", "crawl", "data",
             "spark", "frontier", "queue", "host", "politeness"]
    r = random.Random(h)
    for p in range((1 + h % 3) * body_scale):
        paras.append(
            "<p>" + " ".join(r.choice(words) for _ in range((8 + h % 9) * body_scale))
            + (" &amp; more" if p == 0 else "")
            + "</p>"
        )
    body = []
    for i, href in enumerate(hrefs):
        q = '"' if i % 3 else "'"
        body.append(f"<a href={q}{href}{q}>link {i}</a>")
        if i % 4 == 1 and paras:
            body.append(paras[i % len(paras)])
    for src in imgs:
        body.append(f'<img src="{src}" alt="im">')
    html = (
        # leading/trailing whitespace is deliberate: the reference stores
        # body.trim() (src/http.rs:37), so the engine's collect_html trim
        # must be observable against this fixture
        f"\n  <html><head><title>{title}</title>"
        f"<script>var page = {h % 7};</script>"
        f"<style>.c{{color:#000}}</style></head>\n"
        f"<body><!-- generated fixture -->\n<h1>{title}</h1>\n"
        + "\n".join(paras + body)
        + "\n</body></html>\n\n"
    )
    return html.encode("utf-8")


def generate(n_pages: int = 2000, seed: int = 42,
             branching: int | None = None, body_scale: int = 1) -> dict:
    g = build_graph(n_pages, seed, branching=branching)
    rows = []
    langs = ["en", "en", "en", "en", "de", "fr"]
    for u in g["urls"]:
        html = _render_html(u, g["links"][u], g["images"][u],
                            body_scale=body_scale)
        rows.append(
            {
                "url": u,
                "warc_ts": _warc_ts(u),
                "html": html,
                "lang": langs[_h(u + "lang") % len(langs)],
            }
        )
    pages = pd.DataFrame(rows)
    pages["text"] = extract.extract_text(pages["html"])
    pages = pages[["url", "warc_ts", "html", "text", "lang"]]
    robots_df = pd.DataFrame(ROBOTS_ROWS, columns=["host", "robots_txt"])
    seeds_df = pd.DataFrame({"url": [SEED_URL], "priority": ["0000"]})
    assets_df = _gen_assets(g)
    return {"pages": pages, "robots": robots_df, "seeds": seeds_df,
            "assets": assets_df, "graph": g}


def _gen_assets(g: dict) -> pd.DataFrame:
    """Image-fetch responses keyed by RESOLVED image URL: ~3/4 exist, and
    ~1/7 of those masquerade as text/html (the Content-Type reject path,
    reference src/http.rs:70-76). Bytes are deterministic sha1-seeded
    blobs (src/sqlite.rs:33-39 stores the BLOB)."""
    srcs, refs = [], []
    for u in g["urls"]:
        for src in g["images"][u]:
            srcs.append(src)
            refs.append(u)
    if not srcs:
        return pd.DataFrame(columns=["url", "content_type", "bytes"])
    resolved = urlkit.resolve_links(
        pd.Series(srcs, dtype=object), pd.Series(refs, dtype=object)
    )
    sers = sorted(
        {s for s in urlkit.parse_serialize(resolved)["ser"] if s is not None}
    )
    rows = []
    for ser in sers:
        if _h(ser + "exists") % 4 == 0:
            continue  # fetch failure: no asset row
        if _h(ser + "ct") % 7 == 0:
            ct = "text/html"  # masquerading response -> rejected (F5)
        elif ser.endswith(".png"):
            ct = "image/png"
        else:
            ct = "image/jpeg"
        blob = (hashlib.sha1(ser.encode()).digest() * 4)[: 40 + _h(ser) % 24]
        rows.append({"url": ser, "content_type": ct, "bytes": blob})
    return pd.DataFrame(rows, columns=["url", "content_type", "bytes"])


def write(outdir: str, n_pages: int = 2000, seed: int = 42,
          branching: int | None = None, body_scale: int = 1) -> dict:
    os.makedirs(outdir, exist_ok=True)
    data = generate(n_pages, seed, branching=branching, body_scale=body_scale)
    # pandas writes ns timestamps by default; Spark's reader requires us.
    # Small row groups matter: a single giant row group would make the
    # pages scan one indivisible task regardless of split size.
    data["pages"].to_parquet(
        os.path.join(outdir, "pages.parquet"),
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
        row_group_size=2048,
    )
    data["robots"].to_parquet(os.path.join(outdir, "robots.parquet"), index=False)
    data["seeds"].to_parquet(os.path.join(outdir, "seeds.parquet"), index=False)
    data["assets"].to_parquet(
        os.path.join(outdir, "assets.parquet"), index=False, row_group_size=2048
    )
    return data


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures/data"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    d = write(out, n)
    print(f"wrote {len(d['pages'])} pages to {out}")
