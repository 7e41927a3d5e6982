#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL
from outDir/oracle_sql.json in DuckDB against the sf parquet tables,
load the Spark result parquet, sort columns by name (and rows), compare
values. Dev tool only — the real gate is driver-side."""
import json, math, os, sys
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = sys.argv[3:] if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cellmatch(a, b):
    if a is None and b is None: return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb): return True
            return fa == fb  # exact — the driver hash-matches
    except (TypeError, ValueError):
        pass
    return a == b

fails = 0
for name in sorted(set(list(oracle) + [d for d in os.listdir(out_dir)
                                       if os.path.isdir(os.path.join(out_dir, d))])):
    if only and name not in only: continue
    res_path = os.path.join(out_dir, name)
    if not os.path.isdir(res_path):
        print(f"FAIL {name}: no Spark output"); fails += 1; continue
    got = pd.read_parquet(res_path)
    if name not in oracle:
        print(f"ROWS-ONLY {name}: {len(got)} rows"); continue
    try:
        want = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    got_c, want_c = canon(got), canon(want)
    if list(got_c.columns) != list(want_c.columns):
        print(f"FAIL {name}: columns {list(got_c.columns)} vs {list(want_c.columns)}"); fails += 1; continue
    # The driver's hash is dtype-class-sensitive (e.g. DuckDB
    # SUM(BIGINT) -> HUGEINT -> float64 vs Spark int64 fails even with
    # equal values), but width-insensitive (int32==int64, ns==us
    # timestamps hashed equal in r01). Compare pandas dtype KIND.
    dbad = [(c, str(got_c[c].dtype), str(want_c[c].dtype))
            for c in got_c.columns
            if got_c[c].dtype.kind != want_c[c].dtype.kind
            and {got_c[c].dtype.kind, want_c[c].dtype.kind} != {"i", "u"}]
    if dbad:
        print(f"FAIL {name}: dtype kinds differ {dbad}"); fails += 1; continue
    if len(got_c) != len(want_c):
        print(f"FAIL {name}: rows {len(got_c)} vs {len(want_c)}"); fails += 1; continue
    bad = 0
    for col in got_c.columns:
        ga, wa = got_c[col].tolist(), want_c[col].tolist()
        for i, (a, b) in enumerate(zip(ga, wa)):
            if not cellmatch(a, b):
                if bad < 3:
                    print(f"  {name}.{col}[{i}]: got {a!r} want {b!r}")
                bad += 1
    if bad:
        print(f"FAIL {name}: {bad} mismatched cells"); fails += 1
    else:
        print(f"OK   {name}: {len(got_c)} rows")
print("RESULT:", "FAIL" if fails else "ALL OK", f"({fails} failing)")
sys.exit(1 if fails else 0)
