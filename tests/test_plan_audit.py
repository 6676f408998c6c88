"""Plan-hygiene sweep over the ENTIRE query registry: no scale-killer
may appear in any query's physical plan — this is the 100 TB contract,
enforced as a regression test rather than a one-off review.

Checks per query:
* no row-at-a-time Python UDF (`BatchEvalPython`) — Arrow-batched
  surfaces only (`ArrowEvalPython` / `MapInPandas` / `FlatMapCoGroups`);
* no cartesian product, except the explicitly whitelisted exact-oracle /
  broadcast-kNN queries whose docstrings justify it;
* every parquet scan prunes columns (no scan reads the full documents /
  lineitem schema unless the query genuinely projects it).
"""

from __future__ import annotations

import pytest

from ultraviolet_spark import queries as Q

# Queries whose plans legitimately contain a cartesian/broadcast-nested-
# loop join: q35 is the O(n²) small-scale EXACT oracle for the LSH path
# (q50 is the scale path); q28 is an intentional broadcast-cross kNN
# (documented right up to ~10^4 queries); q68, q72 and q80 cross-join
# 1-ROW broadcast totals frames (corpus totals for DSIR smoothing / the
# mix normalizer / BM25's N+avgdl scalars — the scale-safe alternative
# to collect()ing the scalars).
CROSS_OK = {
    "q28_knn_join",
    "q35_embed_near_dup_pairs",
    "q68_dsir_importance",
    "q72_lang_mix_weights",
    "q80_bm25_scores",
    "q86_lm_cross_entropy",  # 1-row broadcast vocab-size frame
    "q90_heavy_hitter_tokens",  # 1-row broadcast total-count frame
    "q93_pmi_pairs",  # 1-row broadcast corpus-size frame
    "q102_skew_report",  # 1-row broadcast (nk, n_rows, max) totals frame
    "q145_crawl_budget",  # 1-row broadcast Σweights frame (Hamilton N)
    "q152_stupid_backoff_lm",  # 1-row broadcast unigram-total N frame
    "q169_target_encode_loo",  # 1-row broadcast global-prior frame
    "q175_psi_drift",  # 1-row broadcast decile-boundary + totals frames
    "q176_cohens_kappa",  # 1-row broadcast pe-numerator frame
    "q178_jaro_winkler",  # bounded-vocab pair generation (blocked at scale)
    "q179_benford_audit",  # 1-row broadcast total-count frame
    "q195_calibration_report",  # 1-row broadcast brier/ece totals frame
    "q205_chi2_feature_selection",  # 1-row broadcast (N, n_pos) totals frame
    "q217_bottomk_vocab_jaccard",  # G² group-PAIR frame (metadata-sized)
    "q224_transition_matrix",  # S×S state-vocab completion (metadata-sized)
    "q235_kneser_ney_ce",  # 1-row broadcast (N1+(··), V) totals frames
    "q236_bitmap_index",  # top-6 token PAIR frame (15 rows, metadata-sized)
    # the two-phase-prefix family: every member cross-joins ONE-ROW
    # broadcast bounds/totals/scalars frames (min/max for bucketing,
    # Σ/count totals, fitted β) — the scale-safe alternative to
    # collect()ing scalars to the driver:
    "q251_heaps_law_fit",        # 1-row max-doc-id bounds frame
    "q252_target_encoding",      # 1-row time-bounds frame
    "q253_ks_mannwhitney_drift",  # 1-row value-bounds + (n_a, n_b) frame
    "q255_purged_kfold_cv",      # k-row broadcast fold-spec frame
    "q256_waterfill_fair_budget",  # 1-row bounds + 1-row (r*, S*) frames
    "q257_split_conformal",      # 1-row (n, k) + 1-row q̂ frames
    "q258_quantile_normalize",   # 1-row value-bounds frame
    "q259_woe_information_value",  # 1-row (pos, neg, K) totals frame
    "q261_poisson_bootstrap_ci",  # 1-row estimate × 1-row CI frames
    "q262_mutual_information",   # 1-row corpus-total frame
    "q263_logreg_irls",          # 1-row β frame per unrolled iteration
    "q264_isotonic_calibration",  # 1-row score-bounds frame
    "q265_kaplan_meier",         # 1-row (lo, hi, N) bounds frame
    "q266_wasserstein_drift",    # 1-row value-bounds + totals frame
    "q267_logrank_ab_test",      # 1-row (lo, hi, N_A, N_B) bounds frame
    "q268_cuped_adjustment",     # 1-row time-bounds + pooled-moments frames
    "q270_cox_score_step",       # 1-row (lo, hi, N, Σx, Σx²) bounds frame
    "q271_competing_risks_cif",  # 1-row (lo, hi, N) bounds frame
    "q272_rmst",                 # 1-row bounds + head/area scalar frames
    "q274_empirical_bayes_rates",  # 1-row fitted (α, β) prior frame
    "q275_ratio_metric_se",      # 1-row totals frame × 64-bucket frame
    "q276_bh_fdr",               # 1-row m-total × 1-row crossing-k frames
    "q374_by_fdr",               # same + the 1-row harmonic-Cµ frame
    "q277_kmeans_fixed",         # 1-row broadcast centroid-array frame
    "q52_ivf_ann_top10",         # 1-row centroid-array + nprobe-row
                                 # probe frames (exact IVF, round 4)
    "q85_semdedup",              # 1-row centroid-array frames per
                                 # round (exact SemDeDup trainer)
    "q89_pq_adc_top10",          # 1-row centroid-array frames per
                                 # subspace trainer (exact PQ, round 5)
    "q360_mood_median",          # 1-row bounds/median/totals frames
    "q376_decision_stump",       # 1-row bounds + max-gain frames
                                 # (two-phase prefix machinery)
    "q378_cliffs_delta",         # 1-row value-bounds frame (the shared
                                 # ks_mw two-phase machinery)
    "q382_wilcoxon_signed_rank",  # 1-row bounds + zero-count frames
    "q387_g_test",               # 1-row corpus-total frame (q262 shape)
    "q366_rich_club",            # |thresholds|-row literal frame ×2
    "q367_partition_modularity",  # 1-row m frame per community term
    "q363_theil_u",              # 1-row corpus-total frame ×3 entropies
    "q364_gk_lambda",            # four 1-row modal/total frames
    "q365_stuart_tau_c",         # cell-pair grid (vocab-bounded, the
                                 # q345 contract) + 1-row dims frame
    "q279_shapley_attribution",  # 2^K subset-lattice frames (metadata-sized)
    "q281_t_closeness",          # class × sensitive-vocab completion
    "q282_expectation_suite",    # 1-row violations × 1-row n frames
    "q285_ipw_ate",              # 1-row β frames (IRLS) + 1-row β apply
    "q286_fellegi_sunter",       # 1-row broadcast field-weights map
    "q288_aipw_ate",             # 1-row β (IRLS) + 1-row OLS frames
    "q289_quantile_bin",         # 1-row bounds + totals frames
    "q290_trimmed_stats",        # 1-row bounds + (n, k_lo, k_hi) frames
    "q292_psm_att",              # 1-row β frame + 1-row totals × match
    "q293_rake_weights",         # 1-row epoch-µs midpoint bounds frame
    "q294_gini_concentration",   # 1-row bounds + totals frames
    # q295_bradley_terry is NOT listed: its Σθ/k broadcast crosses sit
    # behind the per-round localCheckpoint, so the audited final plan
    # carries no cross-join nodes (the q234 lineage-truncation case)
    "q296_spearman_rho",         # two 1-row value-bounds frames
    "q297_rfm_segments",         # 1-row corpus-max-ts + bin bounds frames
    "q298_poisson_regression",   # 1-row β frame per unrolled iteration
    "q303_association_rules",    # 1-row basket-total-N frame
    "q305_average_precision",    # 1-row score-bounds frame
    "q307_naive_bayes_lang",     # 1-row V/N totals frames (NB model)
    "q316_randomization_test",   # 1-row totals × 1-row hit-count frames
    "q319_sign_test_halves",     # 1-row epoch-µs midpoint frame
    "q320_rocchio_classify",     # 1-row broadcast centroid-array frame
    "q321_hellinger_drift",      # 1-row boundary + totals frames (PSI shape)
    "q331_bowker_symmetry",      # 1-row n × k × statistic frames
    "q333_cramers_v",            # vocab×vocab marginal completion + 1-row n
    "q336_kruskal_wallis",       # 1-row bounds/N totals frames (two-phase
                                 # rank machinery, round 4)
    "q340_jonckheere_trend",     # 1-row value-bounds frame (shared
                                 # two-phase machinery, round 4)
    "q341_ansari_bradley",       # 1-row bounds/N totals frame (shared
                                 # two-phase machinery, round 4)
    "q342_cvm_two_sample",       # 1-row bounds/(n_a,n_b) totals frame
                                 # (shared two-phase machinery, round 4)
    "q343_lepage_location_scale",  # 1-row bounds/totals frame (shared
                                   # two-phase machinery, round 4)
    "q345_gamma_somers",         # ordinal-grid cell-PAIR frame
                                 # (metadata-sized, caller-binned) +
                                 # 1-row n frame (round 4)
    "q346_brier_decomposition",  # 1-row N/P/Qt/BrierNum totals frame
                                 # over the <=bins frame (round 4)
    "q350_ks_uniformity_time_of_day",  # 1-row bounds/n frame (shared
                                       # two-phase machinery, round 4)
    "q353_selection_gains",      # 1-row totals frame over the <=bins
                                 # band grid (round 4)
    "q354_weighted_kappa",       # completed k_a x k_b marginal grid
                                 # (tier-vocab-sized) + 1-row n frame
    "q358_krippendorff_alpha",   # 1-row pair frame x 1-row pooled
                                 # (k, sum m^2) frame
}

# q234_entity_resolution is NOT listed even though its name synthesis
# contains a bounded-vocab cross join (w1 < w2 word pairing): the
# transitive-closure stage inside entity_resolve localCheckpoints, which
# truncates lineage — the FINAL plan the audit sees contains no join
# nodes at all, so the whitelist entry registered as stale.  The
# synthesis cross is still bounded (test-vocabulary pairing, not data),
# and the blocking itself is the FastSS equi-join.


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    # other test modules cache base tables (InMemoryRelation scans carry
    # the full schema) — drop caches so plans show the real parquet scans
    spark.catalog.clearCache()
    out = {}
    for name, spec in Q.REGISTRY.items():
        df = spec.fn(spark, sf_dir)
        out[name] = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    return out


def test_no_row_at_a_time_python_udf(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python UDF in: {bad}"


def test_no_unexpected_cartesian(plans):
    bad = [
        n for n, p in plans.items()
        if ("CartesianProduct" in p or "BroadcastNestedLoopJoin" in p)
        and n not in CROSS_OK
    ]
    assert not bad, f"unexpected cartesian/nested-loop join in: {bad}"


def test_whitelisted_crosses_still_exist(plans):
    # if a whitelisted query stops planning a cross join, shrink the list
    gone = [n for n in CROSS_OK
            if "CartesianProduct" not in plans[n]
            and "BroadcastNestedLoopJoin" not in plans[n]]
    assert not gone, f"stale CROSS_OK entries: {gone}"


def test_scans_prune_columns(plans):
    # documents has 5 columns; a query touching only text+lang must not
    # read doc_id/source/n_chars. Spot-check the heaviest readers.
    p = plans["q20_token_stats"]
    for scan_line in [ln for ln in p.splitlines() if "ReadSchema" in ln]:
        assert "n_chars" not in scan_line, scan_line
    p = plans["q01_pricing_summary"]
    for scan_line in [ln for ln in p.splitlines() if "ReadSchema" in ln]:
        assert "l_comment" not in scan_line and "l_partkey" not in scan_line, scan_line


def test_filters_push_to_scan(plans):
    # q02 filters orders on o_orderdate — the predicate must reach the scan
    p = plans["q02_top_revenue_orders"]
    assert "PushedFilters: [" in p
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any("IsNotNull" in ln or "GreaterThan" in ln or "LessThan" in ln
               for ln in pushed), pushed


# ---------------------------------------------------------------------------
# Registry-wide bounded-window audit (VERDICT r3, next-round #2)
# ---------------------------------------------------------------------------
#
# A Window node with no partition spec moves its whole input to ONE
# partition.  The two-phase prefix machinery uses exactly one such
# window per pass — over the bounded bucket-offset frame — and that
# invariant was previously enforced only by per-operator tests.  This
# sweep locks it registry-wide: every partitionless Window in every
# plan must sit over a provably bounded frame, witnessed by the nearest
# descendant aggregate's grouping keys (bucket/bin/replicate constants)
# or by an explicit per-query whitelist entry with a justification.

import re as _re

_TREE_RE = _re.compile(
    r"^(?P<prefix>[ :+\-*]*)(?P<name>[A-Za-z][A-Za-z0-9 .$_]*?)"
    r" \((?P<id>\d+)\)\s*$")
_DETAIL_RE = _re.compile(r"^\((?P<id>\d+)\) (?P<name>.+?)(?: \[codegen.*)?$")


def _split_top_brackets(s):
    groups, depth, start = [], 0, None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start:i + 1])
    return groups


def _parse_plan(plan):
    lines = plan.splitlines()
    blocks, cur = [], []
    details, did, dbuf = {}, None, []
    for ln in lines:
        m = _TREE_RE.match(ln)
        if m and not ln.startswith("("):
            cur.append((len(m.group("prefix")), int(m.group("id")),
                        m.group("name").strip().lstrip("* ").strip()))
            continue
        dm = _DETAIL_RE.match(ln)
        if dm:
            if did is not None:
                details.setdefault(did, "\n".join(dbuf))
            did, dbuf = int(dm.group("id")), [ln]
            if cur:
                blocks.append(cur)
                cur = []
            continue
        if did is not None:
            dbuf.append(ln)
        if ln.startswith("Subquery") and cur:
            blocks.append(cur)
            cur = []
    if cur:
        blocks.append(cur)
    if did is not None:
        details.setdefault(did, "\n".join(dbuf))
    return blocks, details


_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")


def _partitionless_windows(plan):
    """Yield (agg_keys frozenset | None, subtree-names) per
    partitionless Window node in the plan."""
    blocks, details = _parse_plan(plan)
    for block in blocks:
        for i, (depth, nid, name) in enumerate(block):
            if name != "Window":
                continue
            det = details.get(nid, "")
            argln = next((l for l in det.splitlines()
                          if l.startswith("Arguments:")), "")
            groups = _split_top_brackets(argln)
            # 3 groups = [exprs],[partition],[order]; 2 groups with a
            # bare-column second group = partitioned, unordered.  Only
            # an ordered spec (ASC/DESC) or a single group means the
            # window truly has no partitioning.
            if len(groups) == 3:
                continue
            if len(groups) == 2 and not _re.search(r"ASC|DESC",
                                                   groups[1]):
                continue
            sub = []
            for d2, id2, n2 in block[i + 1:]:
                if d2 <= depth:
                    break
                sub.append((id2, n2))
            agg = next(((id2, n2) for id2, n2 in sub
                        if n2 in _AGG_NODES), None)
            if agg:
                adet = details.get(agg[0], "")
                keyln = next((l for l in adet.splitlines()
                              if l.startswith("Keys")), "")
                keys = frozenset(
                    k.strip().split(" AS ")[-1]
                    for k in _re.sub(r"#\d+L?", "", keyln)
                    .partition(": [")[2].rstrip("]").split(",")
                    if k.strip())
                yield keys, [n for _, n in sub]
            else:
                yield None, [n for _, n in sub]


# Grouping-key names that witness a CONSTANT-bounded frame: __b/b are
# the two-phase bucket / bootstrap-replicate columns (<= n_buckets /
# n_reps rows by construction), bin the calibration bins.
_BOUNDED_KEY_NAMES = {"__b", "b", "bin"}

# Queries with a partitionless window over a frame bounded by something
# other than a constant-bucket aggregate; the value is the exact
# witness the audit must observe (frozenset of agg key names, or None
# for no-aggregate-below).  Every entry must stay observed or the test
# flags it stale.
_PARTITIONLESS_OK = {
    # distinct-count-value frame: <= sqrt(2 n_rows) rows (pigeonhole),
    # see skew_report's docstring
    "q102_skew_report": frozenset({"cnt"}),
    # per-source frames: source vocabulary is corpus-metadata-bounded
    "q145_crawl_budget": frozenset({"source"}),
    "q212_interleave_strata": frozenset({"source"}),
    # event_type vocabulary (a handful of types)
    "q18_event_type_share": frozenset({"event_type"}),
    # post-agg vocabulary regime, documented in zipf_fit: the global
    # rank runs on the distinct-token table (same regime as top-k)
    "q166_zipf_fit": frozenset({"__t"}),
    # distinct micro-score domain: scores are integers in [0, 1e6]
    "q177_roc_auc": frozenset({"score"}),
    # rrf_fuse with by=None: documented single-query corpus-ranking
    # mode (global rank over the candidate lists); pass `by` for
    # per-query batches
    "q201_rrf_fusion": None,
    # channel vocabulary (attribution model frame)
    "q279_shapley_attribution": frozenset({"channel"}),
    # item vocabulary (Bradley-Terry strength table = the model)
    "q295_bradley_terry": frozenset({"item"}),
    # global hourly grid keyed by a literal: calendar-bounded
    "q313_ccf_clicks_purchases": frozenset({"_groupingexpression"}),
    # <=bins fixed-width score-band grid (the band floor expression):
    # cumulative-from-top runs on a 10-row frame
    "q353_selection_gains": frozenset({"_groupingexpression"}),
}


def test_partitionless_windows_are_bounded(plans):
    bad, seen_ok = [], set()
    for name, plan in plans.items():
        allowed = _PARTITIONLESS_OK.get(name, "unset")
        for keys, subtree in _partitionless_windows(plan):
            if keys is not None and (
                    not keys or keys <= _BOUNDED_KEY_NAMES):
                continue  # constant-bucket / global-scalar frame
            if keys is None and any(
                    n.startswith("Range") for n in subtree) and not any(
                    "Scan" in n for n in subtree):
                # literal spark.range frame: the window runs over a
                # COMPILE-TIME-CONSTANT row count (e.g. the S-row
                # fixed-hyperplane slot frame), no data reaches it
                continue
            if allowed != "unset" and keys == allowed:
                seen_ok.add(name)
                continue
            bad.append((name, sorted(keys) if keys else subtree))
    assert not bad, (
        "partitionless Window over a frame not witnessed as bounded "
        f"(add a justified _PARTITIONLESS_OK entry if it IS): {bad}")


def test_partitionless_whitelist_not_stale(plans):
    stale = []
    for name, allowed in _PARTITIONLESS_OK.items():
        found = list(_partitionless_windows(plans[name]))
        if not any((keys == allowed) for keys, _ in found):
            stale.append(name)
    assert not stale, (
        f"stale _PARTITIONLESS_OK entries (shrink the list): {stale}")
