#!/usr/bin/env python3
"""Local pre-validation harness mimicking the driver's DuckDB-oracle
compare: run graft.Verify first, then this script. Compares each
outDir/<name> parquet against the DuckDB run of oracle_sql.json on the
same sfDir tables (columns sorted by name, exact value compare; floats
reported with max abs diff when not bit-equal)."""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        # driver compare: sort columns by name, hash values
        duck = duck[sorted(duck.columns)].reset_index(drop=True)
        spark = spark[sorted(spark.columns)] if set(spark.columns) == set(duck.columns) else spark
        spark = spark.reset_index(drop=True)
        if list(spark.columns) != list(duck.columns):
            print(f"FAIL {name}: columns spark={list(spark.columns)} duck={list(duck.columns)}")
            n_fail += 1
            continue
        if len(spark) != len(duck):
            print(f"FAIL {name}: rows spark={len(spark)} duck={len(duck)}")
            n_fail += 1
            continue
        ok = True
        for c in duck.columns:
            a, b = spark[c], duck[c]
            try:
                # The driver's hash is dtype-sensitive: int64 vs float64
                # (e.g. DuckDB HUGEINT sums landing as float64) hash-fails
                # even when values are numerically equal. Flag it here.
                a_num = pd.api.types.is_numeric_dtype(a)
                b_num = pd.api.types.is_numeric_dtype(b)
                if a_num and b_num and \
                        pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b):
                    print(f"  col {c}: dtype mismatch spark={a.dtype} duck={b.dtype}"
                          f" (driver hash would fail — CAST the oracle agg)")
                    ok = False
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    av, bv = a.astype(float).values, b.astype(float).values
                    eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
                    if not eq.all():
                        d = np.nanmax(np.abs(av - bv))
                        print(f"  col {c}: {int((~eq).sum())} diffs, max abs {d:.3e}")
                        ok = False
                else:
                    av = a.astype(object).where(pd.notnull(a), None)
                    bv = b.astype(object).where(pd.notnull(b), None)
                    neq = [i for i in range(len(av)) if av.iloc[i] != bv.iloc[i]
                           and not (av.iloc[i] is None and bv.iloc[i] is None)]
                    if neq:
                        i = neq[0]
                        print(f"  col {c}: {len(neq)} diffs, first row {i}: "
                              f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
                        ok = False
            except Exception as e:
                print(f"  col {c}: compare error {e} (dtypes {a.dtype} vs {b.dtype})")
                ok = False
        if ok:
            print(f"PASS {name} ({len(duck)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
