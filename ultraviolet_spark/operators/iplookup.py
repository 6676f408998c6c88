"""IP-range lookup (GeoIP-style interval join) — enrich crawl records
with the network block that contains each address.

The naive formulation is a BETWEEN theta-join, which Spark can only
plan as a broadcast-nested-loop — O(|ips|·|ranges|) compares.  The
scale shape used here: explode each range into the /16 BUCKETS it
covers (CIDR allocations span few /16s; a /8 block becomes 256 rows —
still tiny vs the probe side), then an EQUI-join on ``bucket =
ip >> 16`` followed by the exact between filter.  The probe side
shuffles once on a uniform 16-bit key (or not at all when the
exploded range table broadcasts, the common case — GeoIP is ~3M rows).

Everything is integer Catalyst arithmetic, exactly mirrorable in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ipv4_to_long(col) -> Column:
    """Dotted-quad string → numeric value (NULL for malformed input:
    wrong octet count or out-of-range octets)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    ok = (F.size(parts) == 4) & F.forall(
        parts, lambda p: p.rlike("^[0-9]{1,3}$") & (p.cast("int") <= 255))
    val = F.aggregate(parts, F.lit(0).cast("long"),
                      lambda acc, p: acc * 256 + p.cast("long"))
    return F.when(ok, val)


def ip_range_lookup(ips: DataFrame, ranges: DataFrame, *,
                    ip_col: str = "ip", lo_col: str = "lo",
                    hi_col: str = "hi",
                    broadcast_ranges: bool = True) -> DataFrame:
    """``ips`` + every ``ranges`` column, matched where
    ``lo ≤ ip ≤ hi`` (numeric columns; parse dotted quads with
    :func:`ipv4_to_long` first).  Non-matching ips are dropped
    (inner); overlapping ranges yield one row per match."""
    span = F.explode(F.sequence(
        F.shiftright(F.col(lo_col), 16),
        F.shiftright(F.col(hi_col), 16))).alias("__bucket")
    r = ranges.select("*", span)
    if broadcast_ranges:
        r = F.broadcast(r)
    probe = ips.withColumn("__bucket", F.shiftright(F.col(ip_col), 16))
    return (probe.join(r, "__bucket")
            .filter((F.col(ip_col) >= F.col(lo_col))
                    & (F.col(ip_col) <= F.col(hi_col)))
            .drop("__bucket"))
