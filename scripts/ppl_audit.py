#!/usr/bin/env python3
"""Bit-exact replay of the perplexity_turns oracle vs the Spark dump.

The driver's compare hashes full-precision values; the local
compare_oracle.py normalizes floats to 9 significant digits and so
cannot certify bit-exactness (the r4/r5 lesson: "exact locally" hid
1e-8-relative ln disagreements that the driver's DuckDB build
surfaced). This script compares the raw float64 BITS of every ppl
value, under both threads=1 and threads=32, and prints the DuckDB
version so the replay environment is recorded.

Usage: python3 scripts/ppl_audit.py <sfDir> <verifyOutDir>
(run graft.Verify first, e.g. with SPARK_GRAFT_ONLY=perplexity_turns)
"""
import duckdb, json, struct, sys

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/vout'

sql = json.load(open(f'{out}/oracle_sql.json'))['perplexity_turns']
con = duckdb.connect()
print(f"duckdb {duckdb.__version__}")
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
sdf = con.execute(
    f"SELECT conv_id, turn_idx, ppl FROM '{out}/perplexity_turns/*.parquet' "
    "ORDER BY conv_id, turn_idx").fetchall()
spark = {(r[0], r[1]): struct.pack('<d', r[2]) for r in sdf}

fail = 0
for threads in (1, 32):
    con.execute(f"SET threads={threads}")
    odf = con.execute(sql).fetchall()
    mismatch = 0
    for r in odf:
        key = (r[0], r[1])
        ob = struct.pack('<d', r[2])
        if spark.get(key) != ob:
            mismatch += 1
            if mismatch <= 3:
                sv = struct.unpack('<d', spark[key])[0] if key in spark else None
                print(f"  threads={threads} MISMATCH {key}: spark={sv!r} oracle={r[2]!r}")
    if len(odf) != len(spark) or mismatch:
        print(f"threads={threads}: FAIL rows={len(odf)}/{len(spark)} mismatched={mismatch}")
        fail = 1
    else:
        print(f"threads={threads}: OK {len(odf)} rows bit-exact")
sys.exit(fail)
