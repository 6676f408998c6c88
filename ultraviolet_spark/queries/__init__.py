"""Named query registry (package form, round 4).

The monolithic queries.py grew past 14k lines; it is now a package of
per-domain chunk modules registered in a FIXED import order (below).
The public surface is unchanged: REGISTRY, queries(), oracle_sql(),
_FRONT_50/_DEMOTED, q, _t.  Parity rules live in _shared.py's
docstring.
"""

from __future__ import annotations

from collections.abc import Callable  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401

from ultraviolet_spark.queries._shared import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    _dec,
    _t,
    q,
)

# Chunk registration order — append-only; the driver-visible window is
# pinned by _FRONT_50 below and the rest is numerically ordered by
# _ordered_names(), so module order affects nothing observable, but a
# stable order keeps REGISTRY iteration deterministic anyway.
from ultraviolet_spark.queries import core  # noqa: E402,F401
from ultraviolet_spark.queries import webtext  # noqa: E402,F401
from ultraviolet_spark.queries import crawl  # noqa: E402,F401
from ultraviolet_spark.queries import sources_layout  # noqa: E402,F401
from ultraviolet_spark.queries import analytics  # noqa: E402,F401
from ultraviolet_spark.queries import stats_a  # noqa: E402,F401
from ultraviolet_spark.queries import stats_b  # noqa: E402,F401
from ultraviolet_spark.queries import stats_c  # noqa: E402,F401

_FRONT_50 = [
    # -- 10 fixed anchors (driver-green r01-r03) --
    "q51_flagship_vs_golden",
    "q15_asof_click_purchase",
    "q61_asof_salted_hot_keys",
    "q40_utf8_conformance",
    "q42_extract_conformance",
    "q43_classify_hist",
    "q55_utf16_32_conformance",
    "q19_exact_dup_classes",
    "q62_checkpoint_metrics",
    "q63_streaming_dedup",
    # -- sources round-trips (never gated) --
    "q164_csv_roundtrip",
    "q165_jsonl_roundtrip",
    "q230_tfrecord_roundtrip",
    "q231_warc_connector_pushdown",
    "q233_warc_sink_roundtrip",
    "q240_arrow_ipc_roundtrip",
    # -- dedup at scale (never gated) --
    "q64_dup_clusters",
    "q83_substring_dup_stats",
    "q84_remove_dup_substrings",
    "q91_jaccard_prefix_pairs",
    "q92_exact_dup_against",
    "q99_containment_pairs",
    # -- layout / skipping (never gated) --
    "q142_zorder_key",
    "q232_zonemap_skipping_scan",
    "q238_hilbert_layout",
    # -- stats drift / test battery (never gated) --
    "q175_psi_drift",
    "q253_ks_mannwhitney_drift",
    "q266_wasserstein_drift",
    "q276_bh_fdr",
    # -- corpus / quality gates (never gated) --
    "q68_dsir_importance",
    "q69_decontaminate",
    "q71_line_dedup",
    "q73_pack_sequences",
    "q86_lm_cross_entropy",
    "q106_c4_line_clean",
    "q124_justext_boilerplate",
    # -- tokenize / text (never gated) --
    "q98_bpe_tokenize",
    "q100_nfc_normalize",
    "q110_split_sentences",
    "q249_wordpiece_tokens",
    # -- multimodal codecs (never gated) --
    "q97_png_codec_roundtrip",
    "q136_image_dhash",
    "q248_qoi_codec_roundtrip",
    # -- graph (never gated) --
    "q96_pagerank_domains",
    "q300_connected_components",
    # -- similarity / embeddings (never gated) --
    "q198_sparse_cosine_pairs",
    "q277_kmeans_fixed",
    # -- streaming twin + survival + SCD2 (never gated) --
    "q144_streaming_asof_enrich",
    "q265_kaplan_meier",
    "q113_scd2_pit_lookup",
]

# Rows-only / redundant entries kept past the cap in rounds 2-3; retained
# as documentation of which checks are inherently weak (probabilistic /
# hash-dependent results whose semantics are covered by exact-oracle
# twins: q25/q26→q24+pytest recall bounds, q29/q50/q52→q35/q27,
# q54→q53).  With the round-4 rotation these are naturally outside the
# window; the list still feeds tests that pin they exist and stay
# mirror-covered.
_DEMOTED = [
    "q08_rollup_status_priority",
    "q18_event_type_share",
    "q32_cube_status_priority",
    "q46_approx_distinct",
    "q47_union_intersect",
    "q49_sliding_windows",
    "q25_minhash_lsh_pairs",
    "q26_simhash_pairs",
    "q29_lsh_ann_top10",
    "q30_media_features",
    "q50_embed_near_dup_lsh",
    "q54_clean_corpus_near_dup",
    "q52_ivf_ann_top10",
]


def _qnum(name: str) -> int:
    import re as _re

    m = _re.match(r"q(\d+)_", name)
    return int(m.group(1)) if m else 10**9


def _ordered_names() -> list[str]:
    front = [n for n in _FRONT_50 if n in REGISTRY]
    fset = set(front)
    # the rest is ordered NUMERICALLY by query id, not by registry
    # insertion order — with the round-4 package split, insertion order
    # is an accident of module import sequence; numeric order makes
    # queries()/oracle_sql() a pure function of the registered names
    # (pinned by test_registry.py)
    rest = sorted((n for n in REGISTRY if n not in fset),
                  key=lambda n: (_qnum(n), n))
    return front + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {name: REGISTRY[name].sql for name in _ordered_names()
            if REGISTRY[name].sql}

