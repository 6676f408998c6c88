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

    Scale shape: the URL side NEVER shuffles — rules are collapsed to
    one array row per host (all shuffles happen on the tiny rules
    frame), broadcast, and the longest-match is a per-row
    ``F.aggregate`` fold over that array.  A 10^12-URL frontier scan
    stays a scan.
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
    # per host: the specific agent's group when present, else '*'
    r = (rules.filter(F.col("agent").isin(a, "*"))
         .withColumn("__pref", (F.col("agent") == a).cast("int")))
    mx = r.groupBy("host").agg(F.max("__pref").alias("__mx"))
    arr = (r.join(mx, on="host")
           .filter(F.col("__pref") == F.col("__mx"))
           .groupBy("host")
           .agg(F.collect_list(F.struct(
               F.length("path").cast("int").alias("l"),
               (F.col("directive") == "allow").alias("is_allow"),
               F.col("path").alias("p"))).alias("__rules")))
    j = u.join(broadcast(arr), u["__host"] == arr["host"], "left")
    init = F.struct(F.lit(-1).cast("int").alias("l"),
                    F.lit(True).alias("is_allow"))
    empty = F.array().cast(
        "array<struct<l:int,is_allow:boolean,p:string>>")
    best = F.aggregate(
        F.coalesce(F.col("__rules"), empty), init,
        lambda acc, rr: F.when(
            F.col("__path").startswith(rr["p"])
            & ((rr["l"] > acc["l"])
               | ((rr["l"] == acc["l"]) & rr["is_allow"])),
            F.struct(rr["l"].alias("l"),
                     rr["is_allow"].alias("is_allow"))).otherwise(acc))
    return j.select(*urls.columns, best["is_allow"].alias("allowed"))
