#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

For each entry in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB over
views named after the fixture parquet tables, load the Spark result parquet,
sort columns by name, and compare shape + values (exact; floats reported with
max-abs-diff when unequal). Exit 1 if anything mismatches.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_result(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


import datetime


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[ns]")
        elif df[c].dtype == object:
            vals = df[c].dropna()
            if len(vals) and isinstance(vals.iloc[0], datetime.date) \
                    and not isinstance(vals.iloc[0], datetime.datetime):
                df[c] = pd.to_datetime(df[c])
            else:
                df[c] = df[c].apply(
                    lambda v: list(v) if isinstance(v, np.ndarray) else v)
    return df


def compare(name, exp, got):
    problems = []
    if sorted(exp.columns) != sorted(got.columns):
        return [f"columns differ: oracle={sorted(exp.columns)} spark={sorted(got.columns)}"]
    exp, got = norm(exp), norm(got)
    if len(exp) != len(got):
        return [f"row count differs: oracle={len(exp)} spark={len(got)}"]
    for c in exp.columns:
        e, g = exp[c], got[c]
        if str(e.dtype) != str(g.dtype):
            problems.append(f"col {c}: DTYPE differs oracle={e.dtype} spark={g.dtype}")
        try:
            if e.dtype.kind == "f" or g.dtype.kind == "f":
                ef, gf = e.astype(float), g.astype(float)
                eq = (ef.values == gf.values) | (ef.isna().values & gf.isna().values)
                if not eq.all():
                    d = np.nanmax(np.abs(ef.values - gf.values))
                    problems.append(f"col {c}: {int((~eq).sum())} diffs, max abs diff {d}")
            else:
                es = e.astype(str).where(~e.isna(), "<null>")
                gs = g.astype(str).where(~g.isna(), "<null>")
                neq = (es.values != gs.values)
                if neq.any():
                    i = int(np.argmax(neq))
                    problems.append(
                        f"col {c}: {int(neq.sum())} diffs, first at row {i}: "
                        f"oracle={es.values[i]!r} spark={gs.values[i]!r}")
        except Exception as ex:
            problems.append(f"col {c}: compare error {ex}")
    if problems:
        # also check whether it's purely a row-order problem
        try:
            ek = exp.sort_values(list(exp.columns)).reset_index(drop=True)
            gk = got.sort_values(list(got.columns)).reset_index(drop=True)
            if ek.astype(str).equals(gk.astype(str)):
                problems.append("(values equal after row sort → ORDER mismatch only)")
        except Exception:
            pass
    return problems


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got = load_result(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        problems = compare(name, exp, got)
        if problems:
            n_fail += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"   {p}")
        else:
            print(f"ok   {name} ({len(exp)} rows)")
    print(f"\n{len(oracle) - n_fail}/{len(oracle)} queries match")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
