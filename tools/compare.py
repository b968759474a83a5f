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

# Column-TYPE comparison (the r8/r9 lesson: the driver's hash is dtype-
# sensitive, so "values match" is not enough — DuckDB widening sum(BIGINT)
# to HUGEINT in an oracle OUTPUT column red-flags the row even when every
# cell is bit-identical). Types must match exactly after normalization,
# except for the explicitly-allowed benign pairs below. HUGEINT/DECIMAL
# where Spark emits BIGINT/DOUBLE is NEVER allowed — that's the class that
# shipped green locally and failed the driver twice.
ALLOWED_TYPE_PAIRS = {
    # (spark_parquet_type, oracle_type) pairs that hash identically in the
    # driver gate (same physical value domain, same string rendering).
    # Spark writes TIMESTAMP as adjusted-to-UTC int64; DuckDB renders both
    # as the same local-naive value under the UTC session the gate uses.
    ("TIMESTAMP WITH TIME ZONE", "TIMESTAMP"),
    ("TIMESTAMP", "TIMESTAMP WITH TIME ZONE"),
    ("TIMESTAMP_NS", "TIMESTAMP"),
}

# Machine-width integers all render/hash identically ("5" is "5" whether
# the column was INT or BIGINT) — r9's driver gate passed 13 queries with
# INTEGER-vs-BIGINT output pairs. HUGEINT is deliberately NOT in this
# class: it leaves the machine-int domain (pandas renders it as a Python
# object), and it is exactly what failed the driver in r8/r9.
_INT_CLASS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}

def norm_type(t):
    t = str(t).upper().strip()
    return "INT-CLASS" if t in _INT_CLASS else t

def type_mismatches(gcols, gtypes, wcols, wtypes):
    """Pair columns by (lower-cased) name; return list of offending
    (col, spark_type, oracle_type) triples."""
    gmap = {c: norm_type(t) for c, t in zip(gcols, gtypes)}
    bad = []
    for c, t in zip(wcols, wtypes):
        wt = norm_type(t)
        gt = gmap.get(c)
        if gt is None:
            continue  # name mismatch reported separately
        if gt != wt and (gt, wt) not in ALLOWED_TYPE_PAIRS:
            bad.append((c, gt, wt))
    return bad

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
        elif type_mismatches(gcols, got.types, wcols, want.types):
            ok = False
            bad = type_mismatches(gcols, got.types, wcols, want.types)
            msg.append("DTYPE " + "; ".join(
                f"{c}: spark={gt} oracle={wt}" for c, gt, wt in bad))
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
