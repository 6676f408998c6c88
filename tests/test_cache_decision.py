"""cache_decision: directive parsing edges (quoted values, case,
s-maxage/max-age disambiguation), precedence, clock-skew guards, and
missing-header behavior."""

from __future__ import annotations

import datetime as dt

from ultraviolet_spark.operators.http import cache_decision


def _row(spark, cc, *, age=0, date="2024-01-01 00:00:00",
         expires=None, lm=None, etag=None, now="2024-01-01 00:05:00"):
    ts = (lambda s: dt.datetime.fromisoformat(s) if s else None)
    df = spark.createDataFrame(
        [(cc, age, ts(date), ts(expires), ts(lm), etag, ts(now))],
        "cache_control string, age_s long, date timestamp, "
        "expires timestamp, last_modified timestamp, etag string, "
        "now timestamp")
    return cache_decision(df).head()


def test_precedence_smaxage_beats_maxage(spark):
    r = _row(spark, "max-age=60, s-maxage=900")
    assert (r.freshness_source, r.lifetime_s) == ("s-maxage", 900)
    assert r.decision == "fresh"          # age 300 < 900


def test_smaxage_never_parsed_as_maxage(spark):
    # the classic regex bug: \\bmax-age matches inside s-maxage
    r = _row(spark, "s-maxage=9")
    assert (r.freshness_source, r.lifetime_s) == ("s-maxage", 9)
    r2 = _row(spark, "max-age=700")
    assert (r2.freshness_source, r2.lifetime_s) == ("max-age", 700)


def test_quoted_and_case_insensitive(spark):
    r = _row(spark, 'Public, MAX-AGE="600"')
    assert (r.freshness_source, r.lifetime_s) == ("max-age", 600)
    assert _row(spark, "NO-STORE").decision == "no-store"


def test_no_cache_revalidates_even_when_fresh(spark):
    r = _row(spark, "no-cache, max-age=9999")
    assert r.decision == "revalidate"
    assert r.lifetime_s == 9999           # lifetime still reported


def test_expires_fallback_and_negative_clamp(spark):
    r = _row(spark, None, expires="2024-01-01 00:10:00")
    assert (r.freshness_source, r.lifetime_s) == ("expires", 600)
    # Expires before Date (already-expired) clamps to 0, not negative
    r2 = _row(spark, None, expires="2023-12-31 23:00:00")
    assert r2.lifetime_s == 0 and r2.decision == "refetch"


def test_heuristic_and_clock_skew_guard(spark):
    r = _row(spark, "public", lm="2023-12-31 22:00:00")   # 7200s ago
    assert (r.freshness_source, r.lifetime_s) == ("heuristic", 720)
    assert r.decision == "fresh"          # age 300 < 720
    # Last-Modified in the FUTURE of Date → no heuristic (skew guard)
    r2 = _row(spark, "public", lm="2024-01-01 01:00:00")
    assert (r2.freshness_source, r2.lifetime_s) == ("none", 0)
    # but the (bogus) validator still allows conditional revalidation
    assert r2.decision == "revalidate"


def test_stale_validator_split(spark):
    r = _row(spark, "max-age=10", etag='"abc"')
    assert r.decision == "revalidate"     # stale at 300s, has ETag
    r2 = _row(spark, "max-age=10")
    assert r2.decision == "refetch"       # stale, nothing to validate


def test_age_header_adds_to_transit_age(spark):
    r = _row(spark, "max-age=350", age=100)
    assert r.cur_age_s == 400             # 100 stored + 300 since Date
    assert r.decision == "refetch"        # stale (400 >= 350), no validator
    r2 = _row(spark, "max-age=450", age=100)
    assert r2.decision == "fresh"         # 400 < 450
