#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify's parquet
dumps against the DuckDB oracle SQL on the same testdata tables.

usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def normalize(df):
    df = df.copy()
    # sort columns by name (driver does the same), round floats, NaN->None
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            continue
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].replace([np.inf, -np.inf], np.nan).round(6)
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
    # sort rows by all columns for stable compare
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # partitioned ScaleUp output (sf10+ builds)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pdir = f"{outdir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine output")
            n_fail += 1
            continue
        try:
            eng = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            ora = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        e, o = normalize(eng), normalize(ora)
        if list(e.columns) != list(o.columns):
            print(f"FAIL {name}: columns engine={list(e.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if len(e) != len(o):
            print(f"FAIL {name}: rows engine={len(e)} oracle={len(o)}")
            n_fail += 1
            continue
        diffs = []
        for c in e.columns:
            a, b = e[c], o[c]
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                aa = a.astype(float).values
                bb = b.astype(float).values
                neq = ~((np.isnan(aa) & np.isnan(bb)) | (aa == bb))
            else:
                neq = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str))).values
            if neq.any():
                i = int(np.argmax(neq))
                diffs.append((c, int(neq.sum()), i, a.iloc[i], b.iloc[i]))
        if diffs:
            msg = "; ".join(f"{c}: {n} diffs, first@{i} eng={x} ora={y}" for c, n, i, x, y in diffs)
            print(f"FAIL {name}: {msg}")
            n_fail += 1
            continue
        # dtype audit: the driver's hash is dtype-sensitive where the value
        # compare above is not — an int64 engine column vs a float64 oracle
        # column (DuckDB window sum -> HUGEINT -> float64, the r5 x_pack
        # miss) hashes 0 vs 0.0 differently even when every value matches.
        dt = []
        for c in e.columns:
            ef = np.issubdtype(e[c].dtype, np.floating)
            of = np.issubdtype(o[c].dtype, np.floating)
            ei = np.issubdtype(e[c].dtype, np.integer)
            oi = np.issubdtype(o[c].dtype, np.integer)
            if (ef and oi) or (ei and of):
                dt.append(f"{c}: engine={e[c].dtype} oracle={o[c].dtype}")
        if dt:
            print(f"FAIL {name}: dtype mismatch ({'; '.join(dt)}) — values equal but the driver hash will differ")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(e)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
