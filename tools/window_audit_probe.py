"""One-off probe: enumerate every partitionless Window node across all
registry plans with its nearest descendant aggregate's grouping keys (or
the leaf node if no aggregate sits below).  Feeds the design of the
registry-wide bounded-window plan audit (VERDICT r3, next-round #2)."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

TREE_RE = re.compile(
    r"^(?P<prefix>[ :+\-*]*)(?P<name>[A-Za-z][A-Za-z0-9 .$_]*?)"
    r" \((?P<id>\d+)\)\s*$")
DETAIL_RE = re.compile(r"^\((?P<id>\d+)\) (?P<name>.+?)(?: \[codegen.*)?$")


def split_top_brackets(s: str) -> list[str]:
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


def parse(plan: str):
    """Return (blocks, details): blocks = list of [(depth, id, name)],
    details = {id: detail_text}."""
    lines = plan.splitlines()
    blocks, cur = [], []
    details, did, dbuf = {}, None, []
    in_tree = True
    for ln in lines:
        m = TREE_RE.match(ln)
        if m and not ln.startswith("("):
            cur.append((len(m.group("prefix")), int(m.group("id")),
                        m.group("name").strip().lstrip("* ").strip()))
            continue
        dm = DETAIL_RE.match(ln)
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


AGG = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")


def audit(plan: str):
    """Yield dicts describing each partitionless Window node."""
    blocks, details = parse(plan)
    for block in blocks:
        for i, (depth, nid, name) in enumerate(block):
            if name != "Window":
                continue
            det = details.get(nid, "")
            argln = next((l for l in det.splitlines()
                          if l.startswith("Arguments:")), "")
            groups = split_top_brackets(argln)
            # 3 groups = [exprs], [partitionSpec], [orderSpec] -> fine.
            # 2 groups: the second is an ORDER spec (contains ASC/DESC)
            # for a partitionless ordered window, or a PARTITION spec
            # (bare columns) for a partitioned unordered one -> fine.
            # 1 group = partitionless unordered (global frame).
            if len(groups) == 3:
                continue
            if len(groups) == 2 and not re.search(
                    r"ASC|DESC", groups[1]):
                continue
            # subtree = following entries with greater depth
            sub = []
            for d2, id2, n2 in block[i + 1:]:
                if d2 <= depth:
                    break
                sub.append((id2, n2))
            agg = next(((id2, n2) for id2, n2 in sub if n2 in AGG), None)
            if agg:
                adet = details.get(agg[0], "")
                keys = next((l for l in adet.splitlines()
                             if l.startswith("Keys")), "Keys ?")
                keys = re.sub(r"#\d+L?", "", keys)
                yield {"window": nid, "agg": agg[1], "keys": keys}
            else:
                leaf = sub[-1][1] if sub else "?"
                yield {"window": nid, "agg": None, "leaf": leaf,
                       "subtree": [n for _, n in sub]}


def main():
    from ultraviolet_spark import queries as Q
    from ultraviolet_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("window_audit", cores=8)
    spark.catalog.clearCache()
    for name, spec in Q.REGISTRY.items():
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            print(f"{name}\tERROR\t{exc}")
            continue
        for rec in audit(plan):
            print(f"{name}\t{rec}")


if __name__ == "__main__":
    main()
