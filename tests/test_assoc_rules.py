"""Market-basket association rules (operators/funnel.association_rules)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.funnel import association_rules

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(int(b), str(i)) for b, i in rows], "b long, i string")


def _ref(rows, min_item=1, min_pair=1):
    from collections import defaultdict
    baskets = defaultdict(set)
    for b, i in rows:
        baskets[b].add(i)
    n_total = len(baskets)
    ni = defaultdict(int)
    for items in baskets.values():
        for i in items:
            ni[i] += 1
    keep = {i for i, c in ni.items() if c >= min_item}
    np_ = defaultdict(int)
    for items in baskets.values():
        ks = sorted(i for i in items if i in keep)
        for x in range(len(ks)):
            for y in range(x + 1, len(ks)):
                np_[(ks[x], ks[y])] += 1
    out = {}
    for (a, c), n in np_.items():
        if n < min_pair:
            continue
        for ante, cons in [(a, c), (c, a)]:
            out[(ante, cons)] = (
                n, ni[ante], ni[cons],
                round(float(n) * 1e6 / float(n_total)),
                round(float(n) * 1e6 / float(ni[ante])),
                round(float(n_total) * float(n)
                      / (float(ni[ante]) * float(ni[cons])) * 1e6))
    return out


def test_matches_sequential_reference(spark):
    rows = []
    for b in range(40):
        if b % 2 == 0:
            rows += [(b, "view"), (b, "click")]
        if b % 3 == 0:
            rows += [(b, "purchase"), (b, "click")]
        if b % 5 == 0:
            rows += [(b, "view")]
        rows += [(b, "login")]
    got = {(r["ante"], r["cons"]): (r["n_pair"], r["n_ante"], r["n_cons"],
                                    r["support_micro"],
                                    r["confidence_micro"], r["lift_micro"])
           for r in association_rules(_mk(spark, rows), basket_col="b",
                                      item_col="i").collect()}
    assert got == _ref(rows)


def test_lift_separates_association_from_popularity(spark):
    # "common" appears in every basket → any rule X→common has
    # confidence 1.0 but lift exactly 1.0 (no association); the
    # engineered pair (a,b) co-occurs beyond chance → lift > 1
    rows = []
    for b in range(30):
        rows.append((b, "common"))
        if b < 10:
            rows += [(b, "a"), (b, "b")]
        elif b < 15:
            rows.append((b, "a"))
    got = {(r["ante"], r["cons"]): r for r in
           association_rules(_mk(spark, rows), basket_col="b",
                             item_col="i").collect()}
    r = got[("a", "common")]
    assert r["confidence_micro"] == 1000000
    assert r["lift_micro"] == 1000000
    assert got[("a", "b")]["lift_micro"] > 1000000


def test_confidence_is_asymmetric(spark):
    # b ⊂ a baskets: conf(b→a) = 1, conf(a→b) = 1/3
    rows = [(1, "a"), (2, "a"), (3, "a"), (1, "b")]
    got = {(r["ante"], r["cons"]): r for r in
           association_rules(_mk(spark, rows), basket_col="b",
                             item_col="i").collect()}
    assert got[("b", "a")]["confidence_micro"] == 1000000
    assert got[("a", "b")]["confidence_micro"] == 333333
    assert got[("a", "b")]["lift_micro"] == got[("b", "a")]["lift_micro"]


def test_apriori_pruning(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "rare")]
    got = association_rules(_mk(spark, rows), basket_col="b",
                            item_col="i", min_item_count=2).collect()
    assert all("rare" not in (r["ante"], r["cons"]) for r in got)
    got2 = association_rules(_mk(spark, rows), basket_col="b",
                             item_col="i", min_pair_count=3).collect()
    assert got2 == []


def test_duplicate_events_count_once_per_basket(spark):
    rows = [(1, "a")] * 5 + [(1, "b"), (2, "a"), (2, "b")]
    got = {(r["ante"], r["cons"]): r for r in
           association_rules(_mk(spark, rows), basket_col="b",
                             item_col="i").collect()}
    assert got[("a", "b")]["n_pair"] == 2
    assert got[("a", "b")]["n_ante"] == 2
