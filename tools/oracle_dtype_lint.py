#!/usr/bin/env python3
"""Probe every oracle SQL's RESULT TYPES in DuckDB and fail on any
HUGEINT / DECIMAL column.

Why: the driver's correctness hash is dtype-sensitive. DuckDB silently
widens integer aggregate arithmetic (SUM, and anything derived from a
SUM) to HUGEINT, which round-trips to float64 in pandas while the Spark
parquet side is int64 — so a query can match cell-for-cell on VALUES and
still fail the round on hash (x119 in round 14 shipped exactly that
way). Recorded rule (BASELINE.md): every integral oracle output must be
explicitly CAST to BIGINT/INT; money/ratio outputs to DOUBLE.

This lint needs only the binder, not execution: `con.sql(sql).types`
resolves result dtypes from the plan, so it is fast even over the full
registry. Usage:

    python3 tools/oracle_dtype_lint.py <sfDir> <oracle_sql.json> [query ...]

Exit 1 if any probed oracle leaks. Oracles referencing replay-state
parquet that does not exist on disk are reported SKIP (they are probed
at runtime by tools/selfcheck.py on every Verify dump instead).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD = ("HUGEINT", "DECIMAL")


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    failures, probed, skipped = 0, 0, 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            rel = con.sql(sql)
        except Exception as e:
            msg = str(e).splitlines()[0]
            # replay-state parquet not on disk → runtime-probed instead
            if "No files found" in msg or "IO Error" in msg:
                print(f"SKIP {name}: state not on disk ({msg[:100]})")
                skipped += 1
                continue
            print(f"FAIL {name}: oracle SQL error: {msg[:200]}")
            failures += 1
            continue
        probed += 1
        leaks = [f"{n}={t}" for n, t in zip(rel.columns, rel.types)
                 if any(b in str(t).upper() for b in BAD)]
        if leaks:
            print(f"FAIL {name}: dtype leak (CAST in the oracle SQL): "
                  + ", ".join(leaks))
            failures += 1
    # a green exit must mean something was actually probed — a broken
    # environment (missing parquet, bad sfDir) skips every oracle and
    # would otherwise pass the gate having verified nothing
    if probed == 0 and (skipped or oracle):
        print("\nFAIL: 0 oracles probed (all skipped/filtered) — "
              "the gate verified nothing")
        sys.exit(1)
    print(f"\n{probed} probed, {skipped} skipped, "
          f"{'ALL CLEAN' if failures == 0 else f'{failures} LEAKS'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
