#!/usr/bin/env python3
"""Local driver-mimic correctness check.

Runs graft.Verify output against the DuckDB oracle the same way the
round driver does: register each sf-dir parquet as a view named by
table, run every oracle_sql.json entry, compare to the Spark parquet
dump (columns sorted by name, rows sorted, values compared exactly).

Usage: python3 tools/check.py [sfDir] [verifyOut]
"""
import json
import math
import sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

con = duckdb.connect()
for p in sorted(Path(SF).glob("*.parquet")):
    con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")

oracle = json.loads((OUT / "oracle_sql.json").read_text())
fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    d = OUT / name
    if not d.exists():
        print(f"FAIL {name}: no spark output dir")
        fail += 1
        continue
    try:
        want = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet('{d}/*.parquet')").fetch_arrow_table()
    wcols, gcols = sorted(want.column_names), sorted(got.column_names)
    if wcols != gcols:
        print(f"FAIL {name}: schema  oracle={wcols}  spark={gcols}")
        fail += 1
        continue
    # The round driver's hash is arrow-TYPE-sensitive: an oracle that
    # returns decimal128 where Spark returns int64 (e.g. DuckDB's
    # sum(BIGINT) → HUGEINT) hash-reds even when every value matches.
    # Flag the divergence locally so it can never ship again.
    tbad = [(c, str(want.schema.field(c).type), str(got.schema.field(c).type))
            for c in wcols
            if str(want.schema.field(c).type) != str(got.schema.field(c).type)]
    if tbad:
        for c, wt, gt in tbad:
            print(f"FAIL {name}: arrow type  col={c}  oracle={wt}  spark={gt}")
        fail += 1
        continue
    if want.num_rows != got.num_rows:
        print(f"FAIL {name}: rows  oracle={want.num_rows}  spark={got.num_rows}")
        fail += 1
        continue

    def norm(tbl):
        rows = [tuple(col[i].as_py() for col in (tbl.column(c) for c in wcols))
                for i in range(tbl.num_rows)]
        def key(r):
            return tuple((x is None, str(x)) for x in r)
        return sorted(rows, key=key)

    w, g = norm(want), norm(got)
    bad = None
    for i, (a, b) in enumerate(zip(w, g)):
        for x, y in zip(a, b):
            same = (x == y) or (
                isinstance(x, float) and isinstance(y, float)
                and (math.isclose(x, y, rel_tol=0, abs_tol=0)))
            if not same:
                bad = (i, a, b)
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: value mismatch at sorted row {bad[0]}")
        print(f"  oracle: {bad[1]}")
        print(f"  spark : {bad[2]}")
        fail += 1
    else:
        print(f"OK   {name}: {want.num_rows} rows")

print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
