#!/usr/bin/env python3
"""PRUNED DuckDB oracles for the three full-corpus shingle dedups whose
committed twins are deliberately quadratic (llm_dedup_minhash,
llm_dedup_clusters, llm_dedup_containment_lsh) — the large-SF sweep
companion to compare.py.

At sf0.1 (5 000 docs) the unpruned twins run 12.5M list-intersects and
take ~16 min each; this script adds LOSSLESS length-window prunes so the
whole trio verifies in minutes:

 - Jaccard >= 0.5 implies min(|A|,|B|)/max(|A|,|B|) >= 0.5 (because
   |A∩B| <= min and |A∪B| >= max), so the pair join may require
   2*n_b >= n_a AND n_b <= 2*n_a without losing a qualifying pair.
 - Containment |A∩B|/|A| >= 0.7 implies n_b >= 0.7*n_a (|A∩B| <= n_b),
   so the ordered-pair join may require 10*n_b >= 7*n_a.
 - The cluster oracle is the same pruned >= 0.5 pair set closed with a
   union-find (the recursive CTE of the committed twin is quadratic in a
   second way: its reach set enumerates doc × component).

The prunes' losslessness is additionally WITNESSED, not just proven: the
driver's sf0.01 gate hash-matches the UNPRUNED twins against the same
Spark outputs this script compares at the larger SF.

Usage: python3 tools/pruned_oracle.py <sfDir> <verifyOutDir>
(run tools/verify.sh (or graft.Verify) against <sfDir> first so the
Spark outputs exist under <verifyOutDir>.)
"""
import glob
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import canon_dtype, frames_equal  # noqa: E402

SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len(string_split(lower(text), ' ')) - 1, 1)), "
    "i -> string_split(lower(text), ' ')[i] || ' ' || "
    "string_split(lower(text), ' ')[i+1] || ' ' || "
    "string_split(lower(text), ' ')[i+2]))"
)


def spark_out(out, name):
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        raise RuntimeError(f"no spark output for {name} under {out}")
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def check(name, got, exp):
    exp = exp[sorted(exp.columns)]
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL  {name}: columns differ spark={sorted(got.columns)} "
              f"oracle={sorted(exp.columns)}")
        return False
    got = got[sorted(got.columns)]
    if len(exp) != len(got):
        print(f"FAIL  {name}: rows spark={len(got)} oracle={len(exp)}")
        return False
    gd = [canon_dtype(d) for d in got.dtypes]
    ed = [canon_dtype(d) for d in exp.dtypes]
    if gd != ed:
        print(f"FAIL  {name}: dtypes differ "
              f"{[(c, g, e) for c, g, e in zip(got.columns, gd, ed) if g != e]}")
        return False
    ok, msg = frames_equal(got, exp)
    if not ok:
        print(f"FAIL  {name}: {msg}")
        return False
    print(f"OK    {name} ({len(exp)} rows)")
    return True


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet')")
    con.execute(
        "CREATE TABLE t AS SELECT doc_id, sh, len(sh) AS n FROM "
        f"(SELECT doc_id, {SHINGLES} AS sh FROM documents)")
    # jac >= 0.5 pairs under the lossless 2x length window
    con.execute(
        "CREATE TABLE p AS "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "       len(list_intersect(a.sh, b.sh))::DOUBLE / "
        "       len(list_distinct(a.sh || b.sh))::DOUBLE AS j "
        "FROM t a JOIN t b "
        "  ON a.doc_id < b.doc_id AND 2*b.n >= a.n AND b.n <= 2*a.n")
    n_bad = 0

    exp = con.execute(
        "SELECT doc_a, doc_b, round(j, 6) AS jac FROM p WHERE j >= 0.5 "
        "ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST").df()
    n_bad += not check("llm_dedup_minhash", spark_out(out, "llm_dedup_minhash"), exp)

    # union-find closure of the same pair set; cluster id = min member id
    pairs = con.execute("SELECT doc_a, doc_b FROM p WHERE j >= 0.5").df()
    ids = con.execute("SELECT doc_id FROM documents ORDER BY doc_id").df()["doc_id"]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    roots = {i: find(i) for i in ids}
    sizes = {}
    for r in roots.values():
        sizes[r] = sizes.get(r, 0) + 1
    exp = pd.DataFrame({
        "doc_id": list(ids),
        "cluster_id": [roots[i] for i in ids],
        "cluster_size": [sizes[roots[i]] for i in ids],
    }).astype({"doc_id": "int64", "cluster_id": "int64", "cluster_size": "int64"})
    n_bad += not check("llm_dedup_clusters", spark_out(out, "llm_dedup_clusters"), exp)

    # containment >= 0.7 over ordered pairs under the lossless 0.7 floor
    exp = con.execute(
        "SELECT doc_a, doc_b, round(c, 6) AS containment FROM ("
        "  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "         len(list_intersect(a.sh, b.sh))::DOUBLE / a.n::DOUBLE AS c "
        "  FROM t a JOIN t b ON a.doc_id <> b.doc_id AND 10*b.n >= 7*a.n) "
        "WHERE c >= 0.7 "
        "ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST").df()
    n_bad += not check("llm_dedup_containment_lsh",
                       spark_out(out, "llm_dedup_containment_lsh"), exp)

    print(f"== {3 - n_bad} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
