"""RFC 3492 Punycode / IDN decode: fixture pairs, the stdlib-codec
round-trip property (two independent implementations), failure policy,
and the Catalyst prefilter that keeps ASCII hosts out of Python."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ultraviolet_spark.operators.idn import (idn_decode_host, puny_decode,
                                             with_unicode_host)

PAIRS = [
    ("xn--mnchen-3ya", "münchen"), ("xn--bcher-kva", "bücher"),
    ("xn--caf-dma", "café"), ("xn--80akhbyknj4f", "испытание"),
    ("xn--fiqs8s", "中国"), ("xn--wgbh1c", "مصر"),
    ("xn--eckwd4c7cu47r2wf", "ドメイン名例"), ("xn--plda-bpa", "példa"),
    ("xn--kln-sna", "köln"), ("xn--grnland-r1a", "grønland"),
]


def test_fixture_pairs():
    for ace, uni in PAIRS:
        assert puny_decode(ace[4:]) == uni, ace


def test_host_policy():
    assert idn_decode_host("www.XN--MNCHEN-3YA.de") == "www.münchen.de"
    assert idn_decode_host("plain.ascii.com") == "plain.ascii.com"
    # malformed ACE labels NULL the whole host, never half-decode
    assert idn_decode_host("xn--a-zzzzzz.com") is None
    assert idn_decode_host("xn--.com") is None
    # an ACE label decoding to pure ASCII is forbidden by IDNA
    assert idn_decode_host("xn--abc-.com") is None
    assert idn_decode_host(None) is None


# mixed alphabet: ASCII letters/digits/hyphen (basic chars, incl. the
# separator character itself), Latin-1, Greek, CJK, Cyrillic, Hebrew,
# and an astral code point
_ALPHA = "abz-09üéλ中яא𝄞"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_ALPHA, min_size=1, max_size=14))
def test_roundtrip_vs_stdlib_codec(s):
    """decode(stdlib-encode(s)) == s — CPython's punycode codec is an
    independent RFC 3492 implementation; agreeing on arbitrary labels
    (including ones containing '-', where the LAST hyphen is the
    basic/extended separator) pins the from-scratch decoder."""
    if s.isascii():
        return
    enc = s.encode("punycode").decode("ascii")
    assert puny_decode(enc) == s


@pytest.mark.spark
def test_with_unicode_host_prefilter_and_results(spark):
    rows = [(0, "www.xn--mnchen-3ya.de"), (1, "Plain.COM"),
            (2, "xn--a-zzzzzz.com"), (3, None)]
    df = spark.createDataFrame(rows, "id long, host string")
    out = with_unicode_host(df)
    got = {r["id"]: r.asDict() for r in out.collect()}
    assert got[0]["unicode_host"] == "www.münchen.de"
    assert got[0]["is_idn"] is True
    assert got[1]["unicode_host"] == "plain.com"
    assert got[1]["is_idn"] is False
    assert got[2]["unicode_host"] is None
    assert got[3]["unicode_host"] is None
    # Arrow-batched pandas UDF, never a per-row Python UDF
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_confusable_skeleton_mapping(spark):
    from ultraviolet_spark.operators.idn import (_CONF_DST, _CONF_SRC,
                                                 confusable_skeleton)
    from pyspark.sql import functions as F

    assert len(_CONF_SRC) == len(_CONF_DST)  # translate is positional 1:1
    rows = [("pаypal.com",), ("gооgle.com",), ("app1e.com",),
            ("amazοn.com",), ("PayPal.com",), ("xn--plain.example",)]
    df = spark.createDataFrame(rows, "host string").select(
        "host", confusable_skeleton(F.col("host")).alias("sk"))
    got = {r["host"]: r["sk"] for r in df.collect()}
    assert got["pаypal.com"] == "paypal.com"      # Cyrillic а
    assert got["gооgle.com"] == "google.com"      # Cyrillic о×2
    assert got["app1e.com"] == "apple.com"        # digit 1
    assert got["amazοn.com"] == "amazon.com"      # Greek ο
    assert got["PayPal.com"] == "paypal.com"      # case-folded first
    assert got["xn--plain.example"] == "xn--plain.example"


def test_spoof_report_flags_and_broadcast_plan(spark):
    from ultraviolet_spark.operators.idn import spoof_report

    rows = [(1, "pаypal.com"), (2, "paypal.com"), (3, "other.example"),
            (4, None)]
    df = spark.createDataFrame(rows, "id long, host string")
    rep = spoof_report(df, ["paypal.com", "google.com"])
    got = {r["id"]: r for r in rep.collect()}
    assert got[1]["matched_brand"] == "paypal.com" and got[1]["is_spoof"]
    # exact brand hit: matched but NOT a spoof (the false-positive trap)
    assert got[2]["matched_brand"] == "paypal.com" and not got[2]["is_spoof"]
    assert got[3]["matched_brand"] is None and not got[3]["is_spoof"]
    assert got[4]["skeleton"] is None and not got[4]["is_spoof"]
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # brand side never shuffles pages


def test_spoof_report_brand_skeleton_collision_raises(spark):
    import pytest

    from ultraviolet_spark.operators.idn import spoof_report

    df = spark.createDataFrame([(1, "x.com")], "id long, host string")
    # 'app1e.com' and 'apple.com' fold to the same skeleton
    with pytest.raises(ValueError, match="colliding"):
        spoof_report(df, ["apple.com", "app1e.com"])
