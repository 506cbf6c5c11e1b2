#!/usr/bin/env python3
"""Local differential check mirroring the driver's DuckDB oracle gate:
read each Verify parquet dump, run the corresponding oracleSql in DuckDB
over the same testdata parquet, compare row count, sorted column names,
and per-cell values (exact; floats compared bitwise via repr).

Usage: python3 tools/parity.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df

def cells_equal(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            return repr(float(a)) == repr(float(b))
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.concat([pd.read_parquet(f) for f in
                             sorted(glob.glob(f"{outdir}/{name}/*.parquet"))])
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        got, exp = norm(got), norm(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        bad = None
        ga, ea = got.to_numpy(), exp.to_numpy()
        for i in range(len(got)):
            for j in range(len(got.columns)):
                if not cells_equal(ga[i][j], ea[i][j]):
                    bad = (i, got.columns[j], ga[i][j], ea[i][j]); break
            if bad: break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} duckdb={bad[3]!r}")
            # dtypes help debugging
            print(f"     dtypes spark={dict(got.dtypes.astype(str))}")
            print(f"     dtypes duck ={dict(exp.dtypes.astype(str))}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
