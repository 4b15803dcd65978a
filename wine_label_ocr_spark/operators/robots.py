"""robots.txt politeness: parse per-host rule groups and gate crawl URLs.

The ingest-side companion of the blocklist filter: a crawl that ignores
robots.txt cannot be re-crawled politely, and CC-style pipelines carry
the verdict as a column. Semantics implemented (the core of the public
Robots Exclusion Protocol, RFC 9309):

* user-agent groups — consecutive ``User-agent:`` lines stack onto one
  group; an exact (case-insensitive) agent match outranks the ``*``
  group; with neither, everything is allowed;
* ``Allow:`` / ``Disallow:`` literal path prefixes; the LONGEST
  matching prefix wins, and on equal length Allow wins (the standard
  least-restrictive tie-break);
* an empty ``Disallow:`` value means "allow all" (the rule is void);
  a single trailing ``*`` on a prefix is redundant and stripped.
  General mid-pattern wildcards / ``$`` anchors are the documented
  out-of-scope seam (rare in practice; rules containing them are
  dropped conservatively as no-ops).

Scale shape: parsing is per-host Python (genuinely line-oriented — the
one ``mapInPandas`` here; robots files are ≤ a few KB and one per host,
so this is the small side of everything). The URL check is pure column
algebra: a host-keyed equi join (rules ≪ pages), ``startswith`` match,
and a ``max_by(struct(prefix_len, allow))`` longest-match pick — one
narrow shuffle keyed on host plus one on url.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """robots.txt → [(allow, path_prefix)] for the best-matching agent
    group. Pure function (tested directly; the Spark op maps it)."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agents = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if not in_agents:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(value.lower())
            in_agents = True
        elif field in ("allow", "disallow"):
            in_agents = False
            if not cur_agents:
                continue  # rules before any user-agent line: void
            if field == "disallow" and value == "":
                continue  # empty Disallow == allow everything (void rule)
            if value.endswith("*"):
                value = value[:-1]
            if "*" in value or "$" in value:
                continue  # wildcard seam: dropped as no-op (documented)
            cur_rules.append((field == "allow", value))
        else:
            in_agents = False
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    a = agent.lower()
    exact = [g for g in groups if a in g[0]]
    star = [g for g in groups if "*" in g[0]]
    chosen = exact or star
    return [r for g in chosen for r in g[1]]


def parse_robots_rules(robots: DataFrame, host_col: str = "host",
                       robots_col: str = "robots_txt",
                       agent: str = "*") -> DataFrame:
    """(host, robots_txt) → exploded rule rows
    ``(host, allow, prefix, prefix_len)`` via one Arrow-batched map."""
    def run(batches: Iterable) -> Iterator:
        import pandas as pd
        for pdf in batches:
            out = []
            for host, txt in zip(pdf[host_col], pdf[robots_col]):
                for allow, prefix in parse_robots(txt or "", agent):
                    out.append((host, allow, prefix, len(prefix)))
            yield pd.DataFrame(out, columns=[host_col, "allow", "prefix",
                                             "prefix_len"])

    return robots.select(host_col, robots_col).mapInPandas(
        run, schema=f"{host_col} string, allow boolean, prefix string, "
                    "prefix_len int")


def robots_allowed(urls: DataFrame, rules: DataFrame,
                   url_col: str = "url") -> DataFrame:
    """Adds an ``allowed`` column: longest-matching-prefix verdict per
    URL against the host's rules; URLs on hosts with no rules (or no
    robots row at all, or no parseable host) are allowed. Input rows
    pass through unchanged otherwise.

    The URL's host is normalized (``registrable_host``: lowercase,
    userinfo/port stripped) so ``https://h.com:443/x`` is governed by
    ``h.com``'s rules; the match target is path PLUS query (RFC 9309
    matches ``/search?q=`` rules), fragment excluded."""
    from .textops import registrable_host
    raw_path = F.regexp_extract(F.col(url_col),
                                r"^(?i:https?)://[^/?#]+([^#]*)", 1)
    # query-only URLs ('https://h.com?x=1') have an empty path: '/?x=1'
    path = F.when(raw_path == "", F.lit("/")) \
            .when(raw_path.startswith("?"), F.concat(F.lit("/"), raw_path)) \
            .otherwise(raw_path)
    probe = urls.withColumn("_host", registrable_host(F.col(url_col))) \
                .withColumn("_path", path)
    r = rules.select(F.lower(F.col(rules.columns[0])).alias("_host"),
                     "allow", "prefix", "prefix_len")
    hit = (probe.select(F.col(url_col).alias("_u"), "_host", "_path")
           .join(r, "_host")
           .filter(F.col("_path").startswith(F.col("prefix"))
                   | (F.col("prefix") == ""))
           .groupBy("_u")
           .agg(F.max_by(
               F.col("allow"),
               F.struct(F.col("prefix_len"), F.col("allow"))).alias("_verdict")))
    out = (probe.join(hit, probe[url_col] == hit["_u"], "left")
           .withColumn("allowed", F.coalesce(F.col("_verdict"), F.lit(True)))
           .drop("_u", "_verdict", "_host", "_path"))
    return out
