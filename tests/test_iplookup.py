"""IP parsing + bucketed interval join vs brute-force reference."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


def test_ipv4_to_long_parse_and_junk(spark):
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.iplookup import ipv4_to_long
    rows = [("0.0.0.0",), ("255.255.255.255",), ("10.0.0.1",),
            ("256.1.1.1",), ("1.2.3",), ("a.b.c.d",), ("1.2.3.4.5",)]
    df = spark.createDataFrame(rows, "ip string")
    got = [r[0] for r in df.select(ipv4_to_long("ip")).collect()]
    assert got == [0, 4294967295, 167772161, None, None, None, None]


def test_ip_range_lookup_matches_bruteforce(spark):
    from ultraviolet_spark.operators.iplookup import ip_range_lookup
    ips = spark.createDataFrame(
        [(i, (i * 2654435761) % (1 << 32)) for i in range(400)],
        "id long, ip long")
    ranges = spark.createDataFrame(
        [((1 << 28), (1 << 29) - 1, "r1"),        # crosses many /16s
         (0, 65535, "r2"),                        # one /16
         ((1 << 31), (1 << 31) + (1 << 20), "r3"),
         ((1 << 28) + 5, (1 << 28) + 10, "r4")],  # overlaps r1
        "lo long, hi long, net string")
    got = sorted((r["id"], r["net"])
                 for r in ip_range_lookup(ips, ranges).collect())
    want = sorted(
        (i, net)
        for i, ip in ((r["id"], r["ip"]) for r in ips.collect())
        for lo, hi, net in ((r["lo"], r["hi"], r["net"])
                            for r in ranges.collect())
        if lo <= ip <= hi)
    assert got == want and len(got) > 0
