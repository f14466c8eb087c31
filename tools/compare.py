#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB over views
named after the parquet tables in <sfDir>, and compares against the Spark
parquet result in <verifyOutDir>/<name>/ — columns sorted by name, rows
sorted by all columns, exact value comparison.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    # stringify unhashable cells (arrays/structs) so sorting works
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, dict)) or hasattr(v, "__array__")).any():
            df[c] = df[c].map(lambda v: str(list(v)) if v is not None else None)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    failed = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_files = glob.glob(f"{d}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; failed.append(name); continue
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; failed.append(name); continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; failed.append(name); continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; failed.append(name); continue
        # dtype-aware exact compare
        mism = []
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                idx = (~eq).idxmax()
                mism.append((c, str(a.dtype), str(b.dtype), a[idx], b[idx]))
        if mism:
            print(f"FAIL {name}: value mismatch {mism[:3]}")
            n_fail += 1; failed.append(name)
        else:
            # also flag dtype differences (schema check proxy)
            dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                  if str(g[c].dtype) != str(e[c].dtype)]
            tag = f" [dtype diff: {dt}]" if dt else ""
            print(f"PASS {name} ({len(g)} rows){tag}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail" + (f": {failed}" if failed else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
