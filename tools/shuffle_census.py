"""Shuffle census over the whole query registry: for every queries()
entry, count the physical-plan Exchange / BroadcastExchange nodes and
flag row-Python (BatchEvalPython) — the per-operator evidence that the
engine's 100 TB story holds (a shuffle that exists at sf0.01 exists at
100 TB; one that doesn't, doesn't).

Usage:  python tools/shuffle_census.py [sf_dir] [out_json]
Writes a JSON table {query: {exchanges, broadcasts, batch_eval_python,
take_ordered}} plus totals, and prints a summary.
"""

from __future__ import annotations

import json
import os
import re
import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "shuffle_census.json"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as E
    from ultraviolet_spark.session import get_spark

    spark = get_spark("shuffle_census", cores=8)
    census: dict[str, dict] = {}
    for name, fn in E.queries().items():
        try:
            plan = (fn(spark, sf_dir)
                    ._jdf.queryExecution().executedPlan().toString())
        except Exception as exc:          # noqa: BLE001 — census, not gate
            census[name] = {"error": str(exc).split("\n")[0][:200]}
            continue
        census[name] = {
            # hash/range repartitions (real shuffles), broadcasts apart
            "exchanges": len(re.findall(r"\bExchange (?:hash|range)",
                                        plan)),
            "broadcasts": plan.count("BroadcastExchange"),
            "batch_eval_python": plan.count("BatchEvalPython"),
            "take_ordered": plan.count("TakeOrderedAndProject"),
        }
    ok = {k: v for k, v in census.items() if "error" not in v}
    totals = {
        "queries": len(census),
        "planned": len(ok),
        "total_exchanges": sum(v["exchanges"] for v in ok.values()),
        "row_python_queries": [k for k, v in ok.items()
                               if v["batch_eval_python"]],
        "max_exchanges": max(
            ((v["exchanges"], k) for k, v in ok.items()), default=(0, "")),
    }
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "census": census,
                   "totals": totals}, fh, indent=1, sort_keys=True)
    print(json.dumps(totals))
    worst = sorted(ok.items(), key=lambda kv: -kv[1]["exchanges"])[:8]
    for k, v in worst:
        print(f"{k}: {v['exchanges']} exchanges, "
              f"{v['broadcasts']} broadcasts")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
