"""isotonic_calibration: brute-force minimax reference equality,
agreement with the classic PAV stack away from snap knife-edges,
monotonicity, and pooling of a violating dip."""

from __future__ import annotations

from ultraviolet_spark.operators.evalmetrics import isotonic_calibration

SCHEMA = "score double, y int"


def _brute(rows, n_bins):
    s = [round(x * 1e6) for x, _ in rows]
    lo, hi = min(s), max(s)
    span = (hi - lo) // n_bins + 1
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0])
    for (x, y) in rows:
        b = (round(x * 1e6) - lo) // span
        agg[b][0] += 1
        agg[b][1] += y
    bins = sorted(agg)
    pre_n, pre_p, cn, cp = {}, {}, 0, 0
    for b in bins:
        pre_n[b], pre_p[b] = cn, cp
        cn += agg[b][0]
        cp += agg[b][1]
    to_n = {b: pre_n[b] + agg[b][0] for b in bins}
    to_p = {b: pre_p[b] + agg[b][1] for b in bins}
    out = {}
    for b in bins:
        best = None
        for j in [x for x in bins if x <= b]:
            worst = None
            for k in [x for x in bins if x >= b]:
                am = round((to_p[k] - pre_p[j]) / (to_n[k] - pre_n[j])
                           * 1e6)
                worst = am if worst is None else min(worst, am)
            best = worst if best is None else max(best, worst)
        out[b] = (agg[b][0], agg[b][1],
                  round(agg[b][1] / agg[b][0] * 1e6), best)
    return out


def _pav(pairs):
    """Classic PAV stack over (n, pos) blocks, exact fractions."""
    blocks = [[n, p] for n, p in pairs]
    stack = []
    for blk in blocks:
        stack.append(blk[:])
        while len(stack) > 1 and \
                stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]:
            n2, p2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += p2
    fits = []
    for n, p in stack:
        fits.extend([p / n] * 1)
    # expand back: one fit per ORIGINAL block
    out = []
    i = 0
    for n, p in pairs:
        pass
    # re-run tracking block membership
    stack, member = [], []
    for idx, blk in enumerate(blocks):
        stack.append(blk[:])
        member.append([idx])
        while len(stack) > 1 and \
                stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]:
            n2, p2 = stack.pop()
            m2 = member.pop()
            stack[-1][0] += n2
            stack[-1][1] += p2
            member[-1].extend(m2)
    fit = {}
    for (n, p), idxs in zip(stack, member):
        for i in idxs:
            fit[i] = p / n
    return [fit[i] for i in range(len(pairs))]


def _run(spark, rows, n_bins):
    df = spark.createDataFrame(rows, SCHEMA)
    got = isotonic_calibration(df, score_col="score",
                               label_expr="y = 1", n_bins=n_bins)
    return {r["bin"]: (r["n"], r["pos"], r["raw_micro"], r["fit_micro"])
            for r in got.collect()}


ROWS = []
for i in range(300):
    x = float(i % 60)
    # upward trend with a deliberate dip around x in [20, 30)
    p_hi = (x > 15 and not 20 <= x < 30) or x > 45
    ROWS.append((x, 1 if (p_hi and i % 3 != 0) or i % 7 == 0 else 0))


def test_matches_brute_force_minimax(spark):
    for nb in (8, 16):
        assert _run(spark, ROWS, nb) == _brute(ROWS, nb), nb


def test_monotone_and_pools_the_dip(spark):
    got = _run(spark, ROWS, 16)
    bins = sorted(got)
    fits = [got[b][3] for b in bins]
    assert fits == sorted(fits)
    raws = [got[b][2] for b in bins]
    assert raws != sorted(raws)      # the dip made raw non-monotone
    # the violating region was pooled: some adjacent equal fit values
    assert any(a == b for a, b in zip(fits, fits[1:]))


def test_agrees_with_classic_pav(spark):
    got = _run(spark, ROWS, 16)
    bins = sorted(got)
    pav = _pav([(got[b][0], got[b][1]) for b in bins])
    for b, want in zip(bins, pav):
        assert abs(got[b][3] / 1e6 - want) < 2e-6, b
