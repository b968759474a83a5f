#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each query dumped
by graft.Verify, run its DuckDB oracle on the same sf-dir parquet tables
and compare row counts, column names, and (column-name-sorted, row-sorted)
values. Usage: compare.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows by stringified values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = repr(round(v, 9))
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rowsonly = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        gcols, grows = [c.lower() for c in got.columns], got.fetchall()
        if name not in oracles:
            status = f"ROWS-ONLY rows={len(grows)}"
            n_rowsonly += 1
            if len(grows) == 0: status += "  << EMPTY!"
            print(f"{name:28s} {status}")
            continue
        want = con.sql(oracles[name])
        wcols, wrows = [c.lower() for c in want.columns], want.fetchall()
        ok = True; msg = []
        if sorted(gcols) != sorted(wcols):
            ok = False; msg.append(f"cols spark={sorted(gcols)} oracle={sorted(wcols)}")
        elif len(grows) != len(wrows):
            ok = False; msg.append(f"rowcount spark={len(grows)} oracle={len(wrows)}")
        elif canon(grows, gcols) != canon(wrows, wcols):
            ok = False
            a, b = canon(grows, gcols), canon(wrows, wcols)
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            msg.append(f"values differ, first diffs: {diffs}")
        if ok:
            n_pass += 1; print(f"{name:28s} PASS rows={len(grows)}")
        else:
            n_fail += 1; print(f"{name:28s} FAIL {'; '.join(msg)}")
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_rowsonly}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
