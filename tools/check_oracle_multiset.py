#!/usr/bin/env python3
"""Large-output variant of check_oracle.py: compares the Spark dump to
the DuckDB oracle WITHOUT materializing python row lists (the standard
tool builds both sides as python tuples — ~40 GB for a 47M-row result).
The comparison runs inside DuckDB: row counts must match and the
multiset symmetric difference (EXCEPT ALL both ways over all columns)
must be empty. Column names are matched case-sensitively; value
equality is DuckDB's native typed equality, so integer-width
differences are tolerated like the standard tool but a 1-ulp double
difference still fails (doubles compare by binary value).

Usage: tools/check_oracle_multiset.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute(f"SET temp_directory='{os.path.abspath('.tmp')}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output written")
                failures += 1
                continue
            con.execute(
                f"CREATE OR REPLACE VIEW spark_out AS SELECT * FROM '{files[0]}'")
            con.execute(f"CREATE OR REPLACE TEMP TABLE duck_out AS {sql}")
            s_cols = [r[0] for r in con.execute(
                "DESCRIBE spark_out").fetchall()]
            d_cols = [r[0] for r in con.execute(
                "DESCRIBE duck_out").fetchall()]
            if sorted(s_cols) != sorted(d_cols):
                print(f"FAIL {name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
                failures += 1
                continue
            cols = ", ".join(f'"{c}"' for c in sorted(s_cols))
            ns, nd = (con.execute(f"SELECT COUNT(*) FROM {v}").fetchone()[0]
                      for v in ("spark_out", "duck_out"))
            if ns != nd:
                print(f"FAIL {name}: row count spark={ns} duck={nd}")
                failures += 1
                continue
            diff = con.execute(f"""
                SELECT COUNT(*) FROM (
                  (SELECT {cols} FROM spark_out EXCEPT ALL
                   SELECT {cols} FROM duck_out)
                  UNION ALL
                  (SELECT {cols} FROM duck_out EXCEPT ALL
                   SELECT {cols} FROM spark_out))""").fetchone()[0]
            if diff:
                print(f"FAIL {name}: {diff} rows differ (multiset)")
                failures += 1
            else:
                print(f"OK   {name} ({ns} rows, multiset-exact)")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
    total = len(oracle)
    print(f"\n{total - failures}/{total} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
