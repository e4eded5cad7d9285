#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same testdata tables, and
compare (rows / schema-ish / values). Usage:

    python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    if hasattr(v, "item"):
        try:
            v = v.item()
        except Exception:
            pass
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm(x) for x in v.tolist())
    except Exception:
        pass
    return v


def cmp_cell(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, 0.0
        if a == b:
            return True, 0.0
        return False, abs(a - b)
    return (a == b), None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import time
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            rel = con.sql(sql)
            duck_types = {n: str(t).upper()
                          for n, t in zip(rel.columns, rel.types)}
            duck_df = rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        # Dtype-strictness gate (round-15): the driver's hash is
        # dtype-sensitive, so an oracle column that leaks DuckDB's
        # HUGEINT/DECIMAL promotion (e.g. arithmetic over SUM-promoted
        # ints) fails the round even when every VALUE matches — x119 in
        # round 14 shipped exactly that way. Fail loudly here instead.
        leaks = [f"{n}={t}" for n, t in duck_types.items()
                 if "HUGEINT" in t or "DECIMAL" in t]
        if leaks:
            print(f"FAIL {name}: oracle dtype leak (cast to BIGINT/"
                  f"DOUBLE in the oracle SQL): {', '.join(leaks)}")
            failures += 1
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            failures += 1
            continue
        sd = spark_df[s_cols].reset_index(drop=True)
        dd = duck_df[d_cols].reset_index(drop=True)
        # Pandas-kind class must agree per column (int vs float vs
        # object …). Nullable-int→float64 conversion is symmetric
        # (identical null patterns on both sides once values match),
        # so a class mismatch always means an oracle/engine dtype
        # divergence the driver's hash would flag.
        def kind_class(k):
            return {"i": "int", "u": "int", "f": "float", "b": "bool",
                    "M": "datetime", "m": "timedelta"}.get(k, "object")
        kind_bad = [
            (c, sd[c].dtype, dd[c].dtype) for c in s_cols
            if kind_class(sd[c].dtype.kind) != kind_class(dd[c].dtype.kind)]
        if kind_bad:
            print(f"FAIL {name}: dtype class mismatch "
                  + ", ".join(f"{c}: spark={a} duck={b}"
                              for c, a, b in kind_bad))
            failures += 1
            continue
        # vectorized compare per column (the per-cell iloc loop was
        # 200+ s on 600k-row outputs); fall back to cmp_cell only on
        # the rows a column flags, to report exact diffs
        import numpy as np
        bad = []
        for c in s_cols:
            a, b = sd[c], dd[c]
            try:
                if a.dtype.kind == "f" and b.dtype.kind == "f":
                    av, bv = a.values, b.values
                    okv = (av == bv) | (np.isnan(av) & np.isnan(bv))
                else:
                    an, bn = a.map(norm), b.map(norm)
                    okv = ((an == bn) | (an.isna() & bn.isna())).values
                idxs = np.nonzero(~okv)[0]
            except Exception:
                idxs = range(len(sd))  # dtype surprise → per-cell path
            for i in idxs:
                ok, delta = cmp_cell(a.iloc[int(i)], b.iloc[int(i)])
                if not ok:
                    bad.append((int(i), c, a.iloc[int(i)], b.iloc[int(i)],
                                delta))
        if bad:
            print(f"FAIL {name}: {len(bad)} cell diffs; first 5:")
            for b in bad[:5]:
                print(f"   row={b[0]} col={b[1]} spark={b[2]!r} duck={b[3]!r} delta={b[4]}")
            failures += 1
        else:
            print(f"OK   {name} ({len(sd)} rows x {len(s_cols)} cols)"
                  f" [{time.time() - t0:.1f}s]")
    # queries without oracle: must exist and be readable
    import os
    have_oracle = set(oracle)
    manifest_path = os.path.join(out_dir, "queries.json")
    all_queries = (json.load(open(manifest_path))
                   if os.path.exists(manifest_path)
                   else [e for e in os.listdir(out_dir)
                         if os.path.isdir(os.path.join(out_dir, e))])
    for entry in sorted(set(all_queries) - have_oracle):
        if only and entry not in only:
            continue
        p = os.path.join(out_dir, entry)
        try:
            n = con.execute(
                f"SELECT COUNT(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"ROWS {entry}: {n} rows (no oracle)")
        except Exception as e:
            print(f"FAIL {entry}: missing/unreadable ({e})")
            failures += 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
