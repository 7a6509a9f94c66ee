"""Export the query catalog as machine-readable JSON — the engine's
analogue of the reference's user-facing query-patterns catalog
(reference: docs/schema/query-patterns.schema.json:94-368, 8 named
patterns with parameter specs and latency targets).

One entry per ``__spark_entry__.queries()`` key, generated — never
hand-maintained — from the live driver contract:

- ``oracle``: "sql" when the query has a DuckDB oracle in
  ``oracle_sql()`` (the driver gate hash-compares values), else
  "rows-only" (the weaker driver check; exactness pinned by pytest).
- ``oracle_sql_chars``: size of the oracle statement (a cheap proxy for
  oracle complexity; the unrolled iterative-trainer CTEs stand out).
- ``budget_warm_s``: the per-query warm wall-clock budget at sf0.1 on
  local[32] (BUDGETS.json — ``bench.py --assert-budget`` enforces it,
  the engine's analogue of the reference's performanceTarget.latency).
- ``gate_window``: position in the rotated driver-gate priority (the
  first 50 entries get a fresh driver CORRECTNESS row each round). The
  rotation itself is GENERATED — ``tools/gate_priority.py`` orders the
  catalog stalest-verified-first from CORRECTNESS_r*.json history and
  rewrites the GATE_PRIORITY block in ``__spark_entry__.py``.
- ``last_green_round``: the latest round with a hash-green driver row
  for this query (0 = awaiting its first driver sample).

Usage: python tools/export_catalog.py [out.json]   (default QUERY_CATALOG.json)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def build() -> dict:
    import gate_priority

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    last_green = gate_priority.last_green_rounds()
    budgets_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BUDGETS.json",
    )
    budgets = {}
    if os.path.exists(budgets_path):
        with open(budgets_path) as fh:
            budgets = json.load(fh)
    entries = []
    for pos, name in enumerate(qs):
        sql = oracles.get(name)
        entries.append(
            {
                "name": name,
                "oracle": "sql" if sql else "rows-only",
                "oracle_sql_chars": len(sql) if sql else None,
                "budget_warm_s": budgets.get(name),
                "gate_window": pos if pos < 50 else None,
                "last_green_round": last_green.get(name, 0),
            }
        )
    return {
        "catalog_size": len(entries),
        "sql_oracled": sum(1 for e in entries if e["oracle"] == "sql"),
        "queries": entries,
    }


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "QUERY_CATALOG.json"
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(build(), fh, indent=1, sort_keys=False)
    doc = build()
    print(
        json.dumps(
            {
                "wrote": out,
                "catalog_size": doc["catalog_size"],
                "sql_oracled": doc["sql_oracled"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
