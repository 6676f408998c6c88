"""One-off round-4 refactor (VERDICT r3 #4): split the monolithic
ultraviolet_spark/queries.py (~14.6k lines) into a queries/ package of
per-domain chunk modules, each <3000 lines, assembled in import order.

Method: parse with ast, assign top-level nodes to parts; a part
boundary at query qNNN starts at the first node AFTER the previous
q-function, so helper constants/functions defined immediately above a
boundary query travel with it.  Source is sliced by line ranges so
comments survive.  Cross-part name references are fixed afterwards by
tools-side import injection (run the package import and patch).
"""

from __future__ import annotations

import ast
import os
import re

SRC = "ultraviolet_spark/queries.py"
PKG = "ultraviolet_spark/queries"

# boundary query -> (module_name, short description)
PARTS = [
    ("q01", "core", "TPC-H-style relational core, events windows, "
     "conformance, streaming windows (q01-q49)"),
    ("q50", "webtext", "flagship, corpus quality gates, dedup at scale "
     "(q50-q90)"),
    ("q91", "crawl", "crawl/web operators: URLs, WARC, graph, charset, "
     "frontier (q91-q140)"),
    ("q141", "sources_layout", "sources, layout/skipping, tokens, "
     "multimodal (q141-q190)"),
    ("q191", "analytics", "funnels, rankings, privacy, drift, "
     "connectors (q191-q240)"),
    ("q241", "stats_a", "stems, sampling machinery, causal/estimation "
     "wing (q241-q280)"),
    ("q281", "stats_b", "privacy audits, regression, graph analytics, "
     "classical tests (q281-q320)"),
    ("q321", "stats_c", "drift, reliability, trend tests (q321-q333)"),
]

HEADER = '''"""Registry chunk: {desc}.

Split from the monolithic queries.py in round 4 (VERDICT r3 #4).
Registration order is preserved by the import sequence in
queries/__init__.py; the shared decorator/registry live in _shared.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ultraviolet_spark.operators import dedup as D  # noqa: F401
from ultraviolet_spark.operators import similarity as S  # noqa: F401
from ultraviolet_spark.operators import textstats as X  # noqa: F401
from ultraviolet_spark.operators.asof import asof_join  # noqa: F401
from ultraviolet_spark.operators.windows import (  # noqa: F401
    dedup_latest,
    sessionize,
    with_ffill,
    with_lags,
    with_leads,
)

from ultraviolet_spark.queries._shared import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    _dec,
    _t,
    q,
)

'''


def main() -> None:
    src = open(SRC).read()
    lines = src.split("\n")
    tree = ast.parse(src)

    def node_start(n):
        s = n.lineno
        for d in getattr(n, "decorator_list", []):
            s = min(s, d.lineno)
        return s

    nodes = [(node_start(n), n.end_lineno, n) for n in tree.body]

    # prelude = everything up to and including _dec (the shared infra)
    dec_idx = next(i for i, (_, _, n) in enumerate(nodes)
                   if isinstance(n, ast.FunctionDef) and n.name == "_dec")
    prelude_end = nodes[dec_idx][1]

    # locate boundary function nodes by name
    qfun = {}
    for i, (_, _, n) in enumerate(nodes):
        if isinstance(n, ast.FunctionDef) and re.fullmatch(r"q\d+", n.name):
            qfun[n.name] = i

    # the ordering tail starts at the _FRONT_50 assignment
    tail_idx = next(i for i, (_, _, n) in enumerate(nodes)
                    if isinstance(n, ast.Assign)
                    and any(getattr(t, "id", "") == "_FRONT_50"
                            for t in n.targets))

    # part start node index: first node after the previous q-function
    starts = []
    for bq, mod, desc in PARTS:
        bidx = qfun[bq]
        j = bidx
        while j > dec_idx + 1:
            prev = nodes[j - 1][2]
            if (isinstance(prev, ast.FunctionDef)
                    and re.fullmatch(r"q\d+", prev.name)):
                break
            j -= 1
        starts.append((max(j, dec_idx + 1), mod, desc))

    os.makedirs(PKG, exist_ok=True)

    # _shared.py = original prelude (docstring, imports, registry infra)
    open(f"{PKG}/_shared.py", "w").write(
        "\n".join(lines[:prelude_end]) + "\n")

    bounds = [s for s, _, _ in starts] + [tail_idx]
    for k, (snode, mod, desc) in enumerate(starts):
        first_line = nodes[snode][0]
        last_line = nodes[bounds[k + 1] - 1][1]
        body = "\n".join(lines[first_line - 1:last_line])
        open(f"{PKG}/{mod}.py", "w").write(
            HEADER.format(desc=desc) + body + "\n")

    # __init__.py: re-exports + ordered imports + ordering tail
    tail = "\n".join(lines[nodes[tail_idx][0] - 1:])
    init = '''"""Named query registry (package form, round 4).

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

'''
    open(f"{PKG}/__init__.py", "w").write(init + tail + "\n")
    os.remove(SRC)
    for mod in ["_shared"] + [m for _, m, _ in PARTS] + ["__init__"]:
        p = f"{PKG}/{mod}.py"
        print(p, len(open(p).read().split("\n")))


if __name__ == "__main__":
    main()
