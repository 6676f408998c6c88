"""robots.txt parsing + URL admission (Robots Exclusion Protocol,
RFC 9309 subset) — the politeness gate every crawl pipeline applies
before a URL reaches the frontier.

Two stages, both shuffle-light:

* :func:`parse_robots` — ``(host, robots_txt)`` → one rule row per
  Allow/Disallow line, tagged with the user-agent group it belongs to.
  Group attribution is the classic "last group-header wins" scan,
  expressed as a window forward-fill of the agent header over line
  number (one per-host window; robots files are tiny so the per-host
  partition is a few hundred rows).
* :func:`is_allowed` — URLs × rules: RFC 9309 longest-match — among the
  agent's rules (specific agent if any rule group matches, else ``*``)
  whose path is a string prefix of the URL path, the LONGEST wins;
  Allow beats Disallow on equal length; no match ⇒ allowed.  The rules
  side is per-host and small — broadcast it; the URL side never
  shuffles.

Empty-path ``Disallow:`` lines mean "allow everything" in the RFC and
are dropped at parse time (zero-length prefix would otherwise match
everything).  Comments (#…) and unknown directives are ignored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(df: DataFrame, *, host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """``(host, agent, directive, path)`` — one row per Allow/Disallow
    rule, ``agent`` lowercased from the governing User-agent header
    (consecutive User-agent lines share the following rule block, per
    the RFC: attribution is a forward-fill that RESETS when a rule line
    separates two agent headers)."""
    lines = (df
             .select(F.col(host_col).alias("host"),
                     F.posexplode(F.split(F.col(txt_col), "\r?\n"))
                     .alias("line_no", "line"))
             .withColumn("line",
                         F.trim(F.regexp_replace("line", "#.*$", ""))))
    kv = lines.select(
        "host", "line_no",
        F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1)))
         .alias("k"),
        F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1)).alias("v"))
    kv = kv.filter(F.col("k").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("line_no")
    # a User-agent line starts a NEW group unless the previous
    # retained line was also a User-agent (consecutive headers stack)
    prev_k = F.lag("k").over(w)
    grp = F.sum(
        F.when((F.col("k") == "user-agent")
               & ((prev_k != "user-agent") | prev_k.isNull()), 1)
        .otherwise(0)).over(w)
    tagged = kv.withColumn("grp", grp)
    agents = (tagged.filter(F.col("k") == "user-agent")
              .select("host", "grp",
                      F.lower(F.col("v")).alias("agent"))
              .distinct())
    rules = (tagged.filter(F.col("k") != "user-agent")
             .filter(F.length("v") > 0)   # empty Disallow: allow-all
             .select("host", "grp", "line_no",
                     F.col("k").alias("directive"),
                     F.col("v").alias("path")))
    return (rules.join(agents, on=["host", "grp"])
            .select("host", "agent", "directive", "path", "line_no"))


def is_allowed(urls: DataFrame, rules: DataFrame, *,
               agent: str = "*", url_col: str = "url") -> DataFrame:
    """``urls`` + ``allowed`` boolean for ``agent``.

    Rule selection per RFC 9309: if the host has any rule group for the
    specific agent, ONLY that group applies; otherwise the ``*`` group;
    otherwise everything is allowed.  Longest matching path prefix
    wins; Allow beats Disallow at equal length.
    """
    from pyspark.sql.functions import broadcast

    a = agent.lower()
    u = (urls
         .withColumn("__host", F.lower(F.regexp_extract(
             F.col(url_col), r"^(?:https?://)?([^/]*)", 1)))
         .withColumn("__path", F.coalesce(
             F.nullif(F.regexp_extract(
                 F.col(url_col), r"^(?:https?://)?[^/]*(/.*)$", 1),
                 F.lit("")),
             F.lit("/"))))
    r = rules.filter(F.col("agent").isin(a, "*"))
    has_specific = (r.filter(F.col("agent") == a)
                    .select("host").distinct()
                    .withColumnRenamed("host", "__sh"))
    r = (r.join(broadcast(has_specific),
                r["host"] == has_specific["__sh"], "left")
         .filter((F.col("agent") == a)
                 | F.col("__sh").isNull())
         .select("host", "directive", "path"))
    j = (u.join(broadcast(r), u["__host"] == r["host"], "left")
         .withColumn("__m",
                     F.col("path").isNotNull()
                     & F.col("__path").startswith(F.col("path"))))
    # longest matching rule; Allow ('allow' < 'disallow') wins ties via
    # max on (len, directive=='allow')
    best = (j.groupBy(*urls.columns)
            .agg(F.max(F.when(F.col("__m"), F.struct(
                F.length("path").alias("l"),
                (F.col("directive") == "allow").alias("is_allow"))))
             .alias("__best")))
    return best.select(
        *urls.columns,
        F.coalesce(F.col("__best.is_allow"), F.lit(True))
         .alias("allowed"))
