"""Local mirror of the driver's correctness gate — DRIVER-STRICT.

Round-1 lesson (VERDICT "What's wrong" #3): the old normalize() coerced
Int64/Int32/float32→float64 and lists→tuples, and compared with ``==`` —
which hid exactly the failures the driver reported (int64 vs HUGEINT→
float64 width leaks, array-typed output columns).  This version replicates
the driver's canonicalizer:

* columns sorted by name, then ``sort_values`` over all columns
  (crashes on list-valued cells, like the driver) — we pre-reject any
  column containing list/ndarray values with an explicit FAIL;
* NO dtype coercion: the comparison hashes each canonical frame with the
  dtype-sensitive ``pd.util.hash_pandas_object`` (int 11757 != float
  11757.0, as at the driver);
* the only normalization applied is what round-1 driver results prove the
  driver itself tolerates: timestamps are viewed at ns resolution and
  tz-stripped (timestamp-returning queries passed r1 with hash_match).

Usage: python tools/check_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def reject_arrays(df: pd.DataFrame, side: str) -> list[str]:
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            s = df[c].dropna()
            if len(s) and s.map(lambda v: isinstance(v, (list, tuple, np.ndarray, dict))).any():
                bad.append(f"{side}.{c}")
    return bad


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[ns]")
    return df.sort_values(list(df.columns), ignore_index=True)


def frame_hash(df: pd.DataFrame) -> int:
    if not len(df):
        return 0
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rest = sys.argv[2:]
    sample_n = seed = None
    exclude_seen = False
    if rest and rest[0] == "--sample":
        # rotating-soak mode (VERDICT r4 #7): run a random subset, by
        # default drawn from the whole oracle-backed registry; with
        # --exclude-seen, only queries never recorded in any
        # CORRECTNESS_r*.json AND outside the current driver window —
        # so repeated sf0.1 soaks rotate big-SF exposure instead of
        # re-running the same exercised set.  --seed N reproduces a
        # draw; without it the seed is random and PRINTED.
        sample_n = int(rest[1])
        rest = rest[2:]
        exclude_seen = "--exclude-seen" in rest
        if "--seed" in rest:
            seed = int(rest[rest.index("--seed") + 1])
        pat = ""
    else:
        pat = rest[0] if rest else ""

    import __spark_entry__ as E
    from ultraviolet_spark.session import get_spark

    spark = get_spark("check_oracle", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    if pat == ":gate":
        # exactly the driver-visible window (first 50 registry entries)
        qs = {n: qs[n] for n in list(qs)[:50]}
        pat = ""
    if sample_n is not None:
        import glob
        import json
        import os
        import random

        seen: set = set()
        if exclude_seen:
            for p in sorted(glob.glob("CORRECTNESS_r*.json")):
                d = json.load(open(p))
                ks = d.get("queries", d)
                if isinstance(ks, dict):
                    seen |= set(ks)
            seen |= set(list(qs)[:50])  # current window will be gated
        pool = sorted(n for n in qs if n in oracles and n not in seen)
        if not pool:
            print("FAIL: --sample pool is empty")
            return 2
        if seed is None:
            seed = int.from_bytes(os.urandom(4), "big")
        rng = random.Random(seed)
        pick = sorted(rng.sample(pool, min(sample_n, len(pool))))
        print(f"--sample {sample_n} (seed {seed}, pool {len(pool)}"
              f"{', exclude-seen' if exclude_seen else ''}): "
              + " ".join(pick))
        qs = {n: qs[n] for n in pick}
    if pat and not any(pat in name for name in qs):
        # a typo'd / non-matching pattern must FAIL, not print
        # "0 failures" after silently running nothing (this bit us:
        # a never-executed query hid a real hang for a whole session)
        print(f"FAIL: pattern {pat!r} matches no registry query")
        return 2
    failures = 0
    for name, fn in qs.items():
        if pat and pat not in name:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        arr = reject_arrays(sdf, "spark")
        if arr:
            print(f"FAIL {name}: array-typed output column(s) {arr} — the "
                  "driver's canonicalizer cannot hash these (r1 q30/q34)")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        arr = reject_arrays(ddf, "oracle")
        if arr:
            print(f"FAIL {name}: array-typed oracle column(s) {arr}")
            failures += 1
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            failures += 1
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
            failures += 1
            continue
        a, b = canon(sdf), canon(ddf)
        ha, hb = frame_hash(a), frame_hash(b)
        if ha != hb:
            # Diagnose: per-column dtype + strict value compare for the report.
            bad = []
            for c in a.columns:
                av, bv = a[c], b[c]
                if str(av.dtype) != str(bv.dtype):
                    bad.append(f"{c} dtype {av.dtype} vs {bv.dtype}")
                    continue
                if av.dtype.kind == "f":
                    eq = (av.to_numpy() == bv.to_numpy()) | (
                        av.isna().to_numpy() & bv.isna().to_numpy())
                else:
                    eq = ((av == bv) | (av.isna() & bv.isna())).to_numpy()
                if not eq.all():
                    i = int(np.flatnonzero(~eq)[0])
                    bad.append(f"{c} (first: {av.iloc[i]!r} vs {bv.iloc[i]!r}, "
                               f"n={int(np.count_nonzero(~eq))})")
            detail = "; ".join(bad) if bad else "hash-only (value order/NaN slot)"
            print(f"FAIL {name}: hash mismatch: {detail}")
            failures += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
    n_run = sum(1 for name in qs if not pat or pat in name)
    print(f"\n{failures} failures / {n_run} run / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
