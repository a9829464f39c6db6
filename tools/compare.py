#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against views
over <sfDir>/*.parquet, loads the Spark-written parquet for the same query,
sorts columns by name on both sides, and compares shape + values exactly.
Prints one line per query: OK / MISMATCH / ERROR, with the first differing
cell on mismatch.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # Normalize a cell for comparison: floats to exact repr, decimals to str,
    # lists/arrays to tuples, timestamps via isoformat.
    if v is None:
        return None
    t = type(v).__name__
    if t in ("ndarray", "list", "tuple"):
        return tuple(norm(x) for x in v)
    if t == "Decimal":
        return str(v)
    if t in ("Timestamp", "datetime"):
        try:
            return v.isoformat()
        except Exception:
            return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
            files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
            if not files:
                print(f"FAIL  {name}: no spark output parquet")
                n_bad += 1
                continue
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            got_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_bad += 1
            continue
        # sort columns by name (the driver's rule)
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL  {name}: columns differ spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_bad += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL  {name}: rows spark={len(got)} oracle={len(exp)}")
            n_bad += 1
            continue
        bad = None
        for r in range(len(exp)):
            erow = tuple(norm(exp[r][i]) for i in ei)
            grow = tuple(norm(got[r][i]) for i in gi)
            if erow != grow:
                bad = (r, erow, grow)
                break
        if bad:
            r, erow, grow = bad
            cols = sorted(exp_cols)
            diffs = [(cols[i], erow[i], grow[i]) for i in range(len(cols)) if erow[i] != grow[i]]
            print(f"FAIL  {name}: row {r} differs {diffs[:3]}")
            n_bad += 1
        else:
            print(f"OK    {name} ({len(exp)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
