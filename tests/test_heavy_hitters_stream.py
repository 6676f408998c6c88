"""Streaming Misra–Gries heavy hitters (streaming/stateful.py).

The sequential reference replays the same per-micro-batch multiset
folds (count → add → evict by the (capacity+1)-th largest) over the
same md5 shard routing, so final-state equality is exact integer
equality — the determinism contract of the operator.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.test_streaming import _run_to_memory, _two_batch_stream
from ultraviolet_spark.operators.sketches import _mg_merge
from ultraviolet_spark.streaming.stateful import streaming_heavy_hitters

pytestmark = pytest.mark.usefixtures("spark")


def _shard_of(tok: str, n_shards: int) -> int:
    h = hashlib.md5(str(tok).encode()).hexdigest()
    return (int(h[0], 16) * 16 + int(h[1], 16)) % n_shards


def _ref_fold(batches, capacity, n_shards):
    """batches: list of token lists (one per micro-batch).  Returns
    {(shard, token): (residual, n_shard)} for the final state."""
    state = {s: (Counter(), 0) for s in range(n_shards)}
    for toks in batches:
        per_shard = {}
        for t in toks:
            per_shard.setdefault(_shard_of(t, n_shards), []).append(t)
        for s, ts in per_shard.items():
            summary, n = state[s]
            batch = Counter(ts)
            state[s] = (_mg_merge(summary, batch, capacity),
                        n + len(ts))
    out = {}
    for s, (summary, n) in state.items():
        for t, c in summary.items():
            out[(s, t)] = (c, n)
    return out


def test_streaming_matches_sequential_replay(spark, sf_dir, tmp_path):
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select(F.col("event_type").alias("tok"), "ts", "event_id"))
    stream = _two_batch_stream(spark, ev, tmp_path, "mg", ts_col="ts")
    out = streaming_heavy_hitters(stream, token_col="tok", ts_col="ts",
                                  capacity=3, n_shards=4)
    _run_to_memory(out, "uv_mg", tmp_path)
    rows = spark.sql("SELECT * FROM uv_mg").collect()
    assert rows, "no summary rows emitted"
    # final state per shard = the rows carrying that shard's max n_shard
    last_n = {}
    for r in rows:
        last_n[r["shard"]] = max(last_n.get(r["shard"], 0), r["n_shard"])
    got = {(r["shard"], r["token"]): (r["residual"], r["n_shard"])
           for r in rows if r["n_shard"] == last_n[r["shard"]]}

    # replay with the same time-median batch split _two_batch_stream used
    ts_d = F.col("ts").cast("timestamp").cast("double")
    cut = ev.selectExpr(
        "percentile(cast(cast(ts as timestamp) as double), 0.5) p"
    ).head()["p"]
    early = [r["tok"] for r in ev.filter(ts_d < cut).collect()]
    late = [r["tok"] for r in ev.filter(ts_d >= cut).collect()]
    want = _ref_fold([early, late], capacity=3, n_shards=4)
    assert got == want


def test_heavy_token_never_evicted(spark, tmp_path):
    # 'hh' is ~60% of the stream: true count > n/(cap+1) for cap=3 →
    # MG guarantees survival with residual ≥ true − n_shard/(cap+1),
    # across a genuine micro-batch boundary
    rows = []
    toks = []
    for i in range(300):
        tok = "hh" if i % 5 < 3 else f"t{i % 17}"
        rows.append((tok, i))
        toks.append(tok)
    ev = spark.createDataFrame(
        [(t, float(i)) for (t, i) in rows], "tok string, tsd double"
    ).select("tok", F.col("tsd").cast("timestamp").alias("ts"))
    stream = _two_batch_stream(spark, ev, tmp_path, "mg2", ts_col="ts")
    out = streaming_heavy_hitters(stream, token_col="tok", ts_col="ts",
                                  capacity=3, n_shards=2)
    _run_to_memory(out, "uv_mg2", tmp_path)
    res = spark.sql(
        "SELECT residual, n_shard FROM uv_mg2 WHERE token = 'hh' "
        "ORDER BY n_shard DESC LIMIT 1").head()
    assert res is not None, "heavy token evicted"
    shard_toks = [t for t in toks if _shard_of(t, 2) == _shard_of("hh", 2)]
    true_cnt = sum(1 for t in shard_toks if t == "hh")
    assert res["n_shard"] == len(shard_toks)
    assert res["residual"] >= true_cnt - len(shard_toks) // (3 + 1)
    assert res["residual"] <= true_cnt
