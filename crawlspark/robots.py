"""robots.txt parsing and cache construction from crawled pages.

The north rule's "robots.txt rule caches" are a dimension table
``(host, rules ARRAY<STRUCT<allow,path_prefix>>, crawl_delay,
fetched_ts)``. The engine consumes that table (politeness.apply_robots
— longest-prefix match, the de-facto robots precedence rule); this
module *produces* it from the pages table itself: the corpus's
``https://{host}/robots.txt`` bodies are parsed by an Arrow-batched
pandas UDF into rule rows, so the cache is crawl-derived state, not
config.

Parsing follows the de-facto standard (REP, RFC 9309 subset):

* lines are ``field: value`` with ``#`` comments stripped;
* ``User-agent`` lines open a group; consecutive agent lines share the
  following rules; matching prefers an exact agent match over ``*``;
* ``Disallow:`` with an empty value allows everything (no rule);
* ``Allow`` / ``Disallow`` values are path prefixes (the engine's
  longest-prefix evaluation implements RFC 9309 precedence for
  prefix-shaped rules; ``*``/``$`` wildcards are out of scope and
  treated literally);
* ``Crawl-delay`` (non-standard but widespread) is parsed per group.

An implicit ``allow /`` rule is appended so an empty/absent group
means allow-all, matching ``politeness.robots_allowed``'s null
semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_AGENT = "crawlspark"

RULES_TYPE = ArrayType(
    StructType(
        [
            StructField("allow", BooleanType()),
            StructField("path_prefix", StringType()),
        ]
    )
)

PARSED_TYPE = StructType(
    [
        StructField("rules", RULES_TYPE),
        StructField("crawl_delay", DoubleType()),
    ]
)


def parse_robots_txt(
    text: str | bytes | None, agent: str = DEFAULT_AGENT
) -> tuple[list[tuple[bool, str]], float | None]:
    """→ (rules, crawl_delay) for the best-matching agent group."""
    if text is None:
        return [(True, "/")], None
    if isinstance(text, (bytes, bytearray)):
        text = text.decode("utf-8", errors="replace")
    groups: list[dict] = []  # {agents: [..], rules: [...], delay: float|None}
    current: dict | None = None
    last_was_agent = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = (p.strip() for p in line.split(":", 1))
        field = field.lower()
        if field == "user-agent":
            if current is None or not last_was_agent:
                current = {"agents": [], "rules": [], "delay": None}
                groups.append(current)
            current["agents"].append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if current is None:
            continue  # rules before any user-agent line: ignored
        if field == "disallow":
            if value:
                current["rules"].append((False, value))
        elif field == "allow":
            if value:
                current["rules"].append((True, value))
        elif field == "crawl-delay":
            try:
                current["delay"] = float(value)
            except ValueError:
                pass

    agent_l = agent.lower()
    exact = [g for g in groups if any(a != "*" and a in agent_l for a in g["agents"])]
    star = [g for g in groups if "*" in g["agents"]]
    chosen = exact[0] if exact else (star[0] if star else None)
    if chosen is None:
        return [(True, "/")], None
    rules = list(chosen["rules"])
    if not any(allow and prefix == "/" for allow, prefix in rules):
        rules.append((True, "/"))  # implicit allow-all backstop
    return rules, chosen["delay"]


def robots_cache_df(pages: DataFrame, agent: str = DEFAULT_AGENT) -> DataFrame:
    """Build the robots_cache table from the pages table: scan
    ``*/robots.txt`` rows (filter pushes to the parquet scan), parse
    bodies Arrow-batched. Output is dimension-sized (one row per host
    that published a robots.txt)."""
    from crawlspark.urlnorm import host_of

    @F.pandas_udf(PARSED_TYPE)
    def parse_udf(html: pd.Series) -> pd.DataFrame:
        out = [parse_robots_txt(h, agent) for h in html]
        return pd.DataFrame(
            {
                "rules": [
                    [{"allow": a, "path_prefix": p} for a, p in rules]
                    for rules, _ in out
                ],
                "crawl_delay": [d for _, d in out],
            }
        )

    host_udf = F.pandas_udf(
        lambda urls: urls.map(host_of), StringType()
    )
    robots_pages = pages.filter(F.col("url").endswith("/robots.txt"))
    return robots_pages.select(
        host_udf(F.col("url")).alias("host"),
        parse_udf(F.col("html")).alias("_p"),
        F.col("warc_ts").alias("fetched_ts"),
    ).select("host", "_p.rules", "_p.crawl_delay", "fetched_ts")


def robots_rows_from_pages(pages: DataFrame, agent: str = DEFAULT_AGENT) -> list[dict]:
    """Collect the (dimension-sized) cache into the row-dict shape
    CrawlEngine/ReferenceSimulator take."""
    return [
        dict(
            host=r["host"],
            rules=[
                {"allow": x["allow"], "path_prefix": x["path_prefix"]}
                for x in r["rules"]
            ],
            crawl_delay=r["crawl_delay"],
            fetched_ts=r["fetched_ts"],
        )
        for r in robots_cache_df(pages, agent).collect()
    ]
