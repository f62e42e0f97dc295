#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run its DuckDB oracle SQL over the same sf dir and compare
row count, column names/types, and values (exact, after sorting columns by
name — rows are compared in result order, both sides carry a total ORDER BY).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, bytes): return v.hex()
    return str(v)

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        try:
            got_rel = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'")
            got = got_rel.fetchall()
            got_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e)[:150]}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}"); n_fail += 1; continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} duck={sorted(want_cols)}"); n_fail += 1; continue
        # driver sorts columns by name before hashing values
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        bad = None
        for r, (g, w) in enumerate(zip(got, want)):
            gr = [canon(g[i]) for i in gi]; wr = [canon(w[i]) for i in wi]
            if gr != wr:
                bad = (r, gr, wr); break
        if bad:
            r, gr, wr = bad
            print(f"FAIL {name}: row {r} differs\n  spark={gr}\n  duck ={wr}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    # rows-only probes (no oracle): report dump counts so empties are visible
    import glob, os
    for d in sorted(glob.glob(f"{out}/q*")):
        name = os.path.basename(d)
        if name in oracle or not os.path.isdir(d):
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"ROWS {name}: {n}" + ("  <-- EMPTY" if n == 0 else ""))
        except Exception as e:
            print(f"ROWS {name}: unreadable ({str(e)[:80]})")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
