#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (Spark result) plus oracle_sql.json,
runs the oracle SQL in DuckDB over the sf_dir tables, and compares:
columns sorted by name, rows sorted, exact match for non-floats, 1e-9
relative tolerance for floats (to spot rounding-boundary risks early).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet"); failures += 1; continue
        try:
            spark_df = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            duck_df = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            failures += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            failures += 1; continue
        bad = None
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            try:
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    af = pd.to_numeric(a, errors="coerce").astype(float)
                    bf = pd.to_numeric(b, errors="coerce").astype(float)
                    diff = (af - bf).abs()
                    tol = 1e-9 * bf.abs().clip(lower=1.0)
                    mism = ~((diff <= tol) | (af.isna() & bf.isna()))
                else:
                    mism = ~((a == b) | (a.isna() & b.isna()))
            except Exception as e:
                bad = (c, f"compare error {e}"); break
            if mism.any():
                i = mism.idxmax()
                bad = (c, f"row {i}: spark={a[i]!r} duck={b[i]!r} ({int(mism.sum())} mismatches)")
                break
        if bad:
            print(f"FAIL {name}: col {bad[0]} {bad[1]}"); failures += 1
        else:
            # dtype note (schema match matters to the driver)
            dt = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                  for c in spark_df.columns if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
            note = f"  [dtype diff: {dt}]" if dt else ""
            print(f"PASS {name} ({len(spark_df)} rows){note}")
    print(f"\n{len(oracle) - failures}/{len(oracle)} passed")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
