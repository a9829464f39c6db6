#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle compare — pandas-faithful.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Round-1 lesson (VERDICT.md "What's wrong" #3): the old gate read the
Spark-written parquet back THROUGH DuckDB, which coerces decimals / HUGEINT /
lists into the same Python types on both sides — masking exactly the dtype
divergences the driver's pandas comparator catches (21 false-greens).

This version replicates the driver's path:
  - Spark side : pandas.read_parquet (pyarrow)  — decimals stay object,
    int32 stays int32, lists stay ndarray cells.
  - Oracle side: duckdb .df()                   — HUGEINT/DECIMAL → float64.
  - Columns sorted by name on both sides; dtypes must be IDENTICAL before the
    value compare; rows sorted with pandas sort_values (which, like the
    driver, dies on ndarray cells → reported as ERROR, matching the driver's
    comparator-error verdict).
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_dtype(dt):
    # datetime64[us] vs datetime64[ns] is a storage detail both readers pick
    # per-file; collapse the RESOLUTION token only. tz-awareness is a real
    # semantic difference ('datetime64[ns, UTC]' vs naive) and must stay
    # distinct, or a tz divergence would pass here and fail at the driver.
    s = str(dt)
    if s.startswith("datetime64"):
        inner = s[s.index("[") + 1:s.rindex("]")] if "[" in s else ""
        tz = inner.split(",", 1)[1].strip() if "," in inner else ""
        return f"datetime64[{tz}]" if tz else "datetime64"
    return s


def frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    """Exact value compare after row sort. Returns (ok, first_diff_msg)."""
    cols = list(a.columns)
    a = a.sort_values(by=cols).reset_index(drop=True)
    b = b.sort_values(by=cols).reset_index(drop=True)
    for c in cols:
        av, bv = a[c], b[c]
        if str(av.dtype) == "float64":
            same = (av.isna() & bv.isna()) | (av == bv)
        elif str(av.dtype).startswith("datetime64"):
            same = (av.isna() & bv.isna()) | (av == bv)
        else:
            an, bn = av.isna(), bv.isna()
            same = (an & bn) | ((~an) & (~bn) & (av == bv))
        if not bool(same.all()):
            i = int(np.argmin(same.values))
            return False, f"col {c} row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
    return True, None


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
            files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
            if not files:
                print(f"FAIL  {name}: no spark output parquet")
                n_bad += 1
                continue
            got = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)] if set(got.columns) == set(exp.columns) else got
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL  {name}: columns differ spark={sorted(got.columns)} "
                  f"oracle={sorted(exp.columns)}")
            n_bad += 1
            continue
        got = got[sorted(got.columns)]
        if len(exp) != len(got):
            print(f"FAIL  {name}: rows spark={len(got)} oracle={len(exp)}")
            n_bad += 1
            continue
        gd = [canon_dtype(d) for d in got.dtypes]
        ed = [canon_dtype(d) for d in exp.dtypes]
        if gd != ed:
            diffs = [(c, g, e) for c, g, e in zip(got.columns, gd, ed) if g != e]
            print(f"FAIL  {name}: dtypes differ (spark,oracle): {diffs}")
            n_bad += 1
            continue
        try:
            ok, msg = frames_equal(got, exp)
        except Exception as e:
            print(f"ERROR {name}: comparator: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if not ok:
            print(f"FAIL  {name}: {msg}")
            n_bad += 1
        else:
            print(f"OK    {name} ({len(exp)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
