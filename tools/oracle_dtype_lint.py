#!/usr/bin/env python3
"""Standing oracle-dtype lint (the third lint family member, next to the
HOF-inlining / global-window / integer-grid lints in PlanLintSpec): no
oracle SELECT may emit a HUGEINT / UHUGEINT / DECIMAL output column,
because the Spark side emits long / double and the driver's hash gate is
dtype-sensitive — exactly this class shipped "locally green" and failed
the driver in rounds 8 and 9 (DuckDB widens sum(BIGINT) to HUGEINT).

Runs from the oracle SQL alone (no Verify dump needed): DESCRIBE each
oracle against the sf-dir views and flag banned output types.

Usage: oracle_dtype_lint.py <sfDir> <oracle_sql.json | verifyOutDir>
Exit 1 if any offender found.
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")

def main(sf_dir, oracle_path):
    if os.path.isdir(oracle_path):
        oracle_path = os.path.join(oracle_path, "oracle_sql.json")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(oracle_path))
    n_bad = 0
    for name in sorted(oracles):
        try:
            desc = con.sql("DESCRIBE " + oracles[name]).fetchall()
        except Exception as e:
            print(f"{name:28s} DESCRIBE-ERROR {e}")
            n_bad += 1
            continue
        offenders = [(c, t) for c, t, *_ in desc
                     if any(b in str(t).upper() for b in BANNED)]
        if offenders:
            n_bad += 1
            print(f"{name:28s} BANNED-DTYPE " + "; ".join(
                f"{c}: {t}" for c, t in offenders))
    print(f"\noracle_dtype_lint: {n_bad} offender(s) in {len(oracles)} oracles")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
