#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load <out>/<name>/*.parquet, run the
oracle SQL from oracle_sql.json against views over <sfDir>/*.parquet, sort
columns by name and rows by all columns, and compare cell-by-cell (exact).
Reports PASS/FAIL per query. Dev-only tool — not part of the shipped library.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
    except TypeError:
        pass
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no parquet dump at {qdir}")
            n_fail += 1
            continue
        try:
            mine = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
            ref = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(mine.columns) != sorted(ref.columns):
            print(f"FAIL {name}: columns {sorted(mine.columns)} != {sorted(ref.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} != {len(ref)}")
            n_fail += 1
            continue
        a, b = canon(mine), canon(ref)
        bad = None
        for col_i, c in enumerate(a.columns):
            av, bv = a[c].tolist(), b[c].tolist()
            for i in range(len(av)):
                x = av[i]
                y = bv[i]
                x = None if (isinstance(x, float) and math.isnan(x)) else x
                y = None if (isinstance(y, float) and math.isnan(y)) else y
                if isinstance(x, float) and math.isnan(x):
                    x = None
                if not cells_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: first diff col={c} row={i}: mine={x!r} oracle={y!r}")
            # dtype hint
            print(f"     dtypes mine={dict(a.dtypes.astype(str))}")
            print(f"     dtypes orcl={dict(b.dtypes.astype(str))}")
            n_fail += 1
        else:
            # also flag dtype drift even when values match
            dm = {c: str(a[c].dtype) for c in a.columns}
            do = {c: str(b[c].dtype) for c in b.columns}
            note = "" if dm == do else f"  [dtype drift: {[(c, dm[c], do[c]) for c in dm if dm[c] != do[c]]}]"
            print(f"PASS {name} ({len(mine)} rows){note}")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
