#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir tables, and
compares: row count, column names (sorted), and a value hash (doubles rounded
to 6 significant-ish decimals, rows sorted, columns sorted by name).
"""
import sys, os, json, math
import duckdb

def canon(rows, cols):
    # sort columns by name, round floats, stringify, sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{round(v, 6):.6f}")
            else:
                vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.exists(spark_path):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
            want = con.execute(sql)
            w_cols = [d[0] for d in want.description]
            w_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(g_cols) != sorted(w_cols):
            print(f"FAIL {name}: cols spark={sorted(g_cols)} oracle={sorted(w_cols)}")
            n_fail += 1; continue
        # The driver's hasher goes through pandas: DuckDB HUGEINT (sum of
        # ints) converts to float64 there and never matches Spark's int64 —
        # cast such columns ::BIGINT in the oracle SQL (bit us in round 2:
        # q54, where the pre-fix pandas hash saw 13.0 vs Spark's 13).
        rel = con.sql(sql)
        huge = [c for c, t in zip(rel.columns, rel.types)
                if str(t).upper() in ("HUGEINT", "INT128", "UHUGEINT")]
        if huge:
            print(f"FAIL {name}: oracle cols typed HUGEINT (cast ::BIGINT): {huge}")
            n_fail += 1; continue
        if len(g_rows) != len(w_rows):
            print(f"FAIL {name}: rows spark={len(g_rows)} oracle={len(w_rows)}")
            n_fail += 1; continue
        cg, cw = canon(g_rows, g_cols), canon(w_rows, w_cols)
        if cg != cw:
            diffs = [(a, b) for a, b in zip(cg, cw) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diffs}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(g_rows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
