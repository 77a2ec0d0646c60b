"""robots.txt parsing and matching.

Reproduces the observable semantics of the reference's gatekeeper
(reference src/tools.rs:21-58), which calls the google `robotstxt` crate's
``DefaultMatcher::allowed_by_robots(robots_txt, ALL_UAS, url)`` inside a
panic guard:

- Google matcher semantics: groups of user-agent lines + allow/disallow
  rules; a group applies when its agent token is '*' or a case-insensitive
  prefix of the request UA's extracted product token; if any specific group
  applies, '*' groups are ignored; the longest-pattern rule wins; Allow wins
  length ties; no applicable rule => allowed. Patterns support '*' wildcards
  and a '$' end anchor, matched against path[?query].
- The reference checks ALL 7 configured UAs at once (src/tools.rs:41) — the
  crate then unions every matching group.
- Missing / empty robots.txt => allowed (src/tools.rs:25-33 empty fallback).
- Any parse/match error => allowed (panic guard, src/tools.rs:40-49; Q7).

The engine builds `{host: parsed rules}` from the round's distinct hosts
joined to the robots table, broadcasts it, and evaluates candidates in a
batch kernel (J4/E4 in SURVEY.md §2).
"""

from __future__ import annotations

import re

import pandas as pd

_UA_TOKEN_RE = re.compile(r"^[a-zA-Z_-]+")
_LINE_RE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$")
_PATH_QUERY_RE = re.compile(r"^[a-z]+://[^/?#]*([^#]*)")


def extract_ua_token(user_agent: str) -> str:
    """Leading [a-zA-Z_-]+ of the UA string (google ExtractUserAgent);
    all 7 reference UAs extract to 'Mozilla'."""
    m = _UA_TOKEN_RE.match(user_agent)
    return m.group(0) if m else ""


def parse_robots(robots_txt: str) -> list[dict]:
    """Parse into groups: [{'agents': [...], 'rules': [(is_allow, pattern)]}].
    Malformed lines are skipped; rules before any user-agent line are
    dropped (google semantics). Never raises on string input."""
    groups: list[dict] = []
    current: dict | None = None
    collecting_agents = False
    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0]
        m = _LINE_RE.match(line)
        if not m:
            continue
        key = m.group(1).lower()
        value = m.group(2)
        if key == "user-agent":
            if not collecting_agents:
                current = {"agents": [], "rules": []}
                groups.append(current)
                collecting_agents = True
            current["agents"].append(value)
        elif key in ("allow", "disallow"):
            collecting_agents = False
            if current is None:
                continue
            current["rules"].append((key == "allow", value))
        else:
            collecting_agents = False
    return groups


def _rules_for(groups: list[dict], ua_tokens: list[str]) -> list[tuple[bool, str]]:
    tokens = [t.lower() for t in ua_tokens]
    specific: list[tuple[bool, str]] = []
    wildcard: list[tuple[bool, str]] = []
    for g in groups:
        is_specific = False
        is_wild = False
        for agent in g["agents"]:
            a = agent.strip().lower()
            if a == "*":
                is_wild = True
            elif any(t.startswith(a) for t in tokens):
                is_specific = True
        if is_specific:
            specific.extend(g["rules"])
        elif is_wild:
            wildcard.extend(g["rules"])
    return specific if specific else wildcard


def _pattern_re(pattern: str) -> re.Pattern | None:
    if not pattern:
        return None
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


class HostRules:
    """Pre-parsed, UA-resolved rules for one host, with compiled patterns."""

    __slots__ = ("rules",)

    def __init__(self, robots_txt: str, user_agents: list[str]):
        try:
            groups = parse_robots(robots_txt or "")
            tokens = [extract_ua_token(ua) for ua in user_agents]
            self.rules = [
                (is_allow, p, _pattern_re(p))
                for is_allow, p in _rules_for(groups, tokens)
            ]
        except Exception:
            self.rules = []  # Q7: broken robots => everything allowed

    def allowed(self, path_query: str) -> bool:
        try:
            best_len, best_allow = -1, True
            for is_allow, pattern, rx in self.rules:
                if rx is None:
                    continue
                if rx.match(path_query):
                    plen = len(pattern)
                    if plen > best_len or (
                        plen == best_len and is_allow and not best_allow
                    ):
                        best_len, best_allow = plen, is_allow
            if path_query == "/robots.txt":
                return True
            return best_allow if best_len >= 0 else True
        except Exception:
            return True  # Q7


def build_host_rules(
    robots_by_host: dict[str, str], user_agents: list[str]
) -> dict[str, HostRules]:
    """Driver-side: parse once per host, broadcast the result (the analogue
    of the reference's per-run INMEMORY_CACHE, src/tools.rs:208-230)."""
    return {
        host: HostRules(txt, user_agents) for host, txt in robots_by_host.items()
    }


# Executor-process-level LRU over parsed rules. After the broadcast
# candidates⋈robots join, a popular host's multi-KB body recurs in most
# ~512-row Arrow batches (candidates are NOT clustered by host); without a
# cache it re-parses per batch. Keyed on (host, hash(body), ua set) so a
# changed body or UA config never serves stale rules.
from collections import OrderedDict  # noqa: E402

_RULES_CACHE: "OrderedDict[tuple, HostRules]" = OrderedDict()
_RULES_CACHE_MAX = 1024


def cached_host_rules(
    robots_by_host: dict[str, str], user_agents: list[str]
) -> dict[str, HostRules]:
    """Like ``build_host_rules`` but memoized per worker process."""
    ua_key = tuple(user_agents)
    out: dict[str, HostRules] = {}
    for host, txt in robots_by_host.items():
        key = (host, hash(txt), ua_key)
        hr = _RULES_CACHE.get(key)
        if hr is None:
            hr = HostRules(txt, user_agents)
            _RULES_CACHE[key] = hr
            if len(_RULES_CACHE) > _RULES_CACHE_MAX:
                _RULES_CACHE.popitem(last=False)
        else:
            _RULES_CACHE.move_to_end(key)
        out[host] = hr
    return out


def blocked_mask(
    urls: pd.Series,
    hosts: pd.Series,
    host_rules: dict[str, HostRules],
    respect_robots: bool = True,
) -> pd.Series:
    """Batch kernel: True where the URL is robots-blocked. Hosts absent from
    the map are allowed (missing robots => allowed). Candidates are grouped
    by host so each host's compiled rules run once per batch."""
    if not respect_robots or not host_rules:
        return pd.Series(False, index=urls.index)
    out = pd.Series(False, index=urls.index)
    path_query = urls.str.extract(_PATH_QUERY_RE)[0].fillna("/")
    path_query = path_query.where(path_query != "", "/")
    for host, idx in hosts.groupby(hosts, sort=False).groups.items():
        rules = host_rules.get(host)
        if rules is None or not rules.rules:
            continue
        out.loc[idx] = [not rules.allowed(pq) for pq in path_query.loc[idx]]
    return out
