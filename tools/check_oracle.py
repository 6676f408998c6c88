"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and (where defined) its
``oracle_sql()`` in DuckDB over the same parquet tables, then compares
row count, column names, and order-insensitive values (exact equality —
the registry is engineered for bit-identical results).

Usage: python tools/check_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        if str(df[c].dtype).startswith(("datetime", "timestamp")):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        if str(df[c].dtype) in ("Int64", "Int32", "float32"):
            df[c] = df[c].astype("float64")
        if df[c].dtype == np.int32:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    pat = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as E
    from ultraviolet_spark.session import get_spark

    spark = get_spark("check_oracle", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
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
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            failures += 1
            continue
        a, b = normalize(sdf), normalize(ddf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: cols {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        bad = []
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f":
                eq = (av.fillna(np.nan).to_numpy() == bv.fillna(np.nan).to_numpy()) | (
                    av.isna().to_numpy() & bv.isna().to_numpy())
                if not eq.all():
                    d = np.nanmax(np.abs(av.to_numpy(dtype=float) - bv.to_numpy(dtype=float)))
                    bad.append(f"{c} (maxdiff={d:.3g}, n={np.count_nonzero(~eq)})")
            else:
                eq = (av == bv) | (av.isna() & bv.isna())
                if not eq.all():
                    i = int(np.flatnonzero(~eq.to_numpy())[0])
                    bad.append(f"{c} (first: {av.iloc[i]!r} vs {bv.iloc[i]!r})")
        if bad:
            print(f"FAIL {name}: value mismatch: {'; '.join(bad)}")
            failures += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
    print(f"\n{failures} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
