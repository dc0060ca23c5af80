#!/usr/bin/env python3
"""Output-TYPE parity gate (the class of bug tools/check.py cannot see).

check.py unifies integer widths to float64 before comparing values, so a
Spark int64 column whose oracle counterpart is HUGEINT (e.g. an uncast
DuckDB window sum) or DECIMAL compares green locally while any
serialization-level hash — the driver's — flips. This gate closes the
class: for every registered query it runs `DESCRIBE (<oracle sql>)` in
DuckDB and compares each column's type against the Spark result parquet
schema under the repo's normalization rules:

    BIGINT <-> int64      INTEGER <-> int32      DOUBLE  <-> float64
    VARCHAR <-> string    BOOLEAN <-> bool       DECIMAL(p,s) <-> decimal128(p,s)
    DATE <-> date32       TIMESTAMP <-> timestamp[us]     X[] <-> list<X>

Anything else — HUGEINT, a DECIMAL facing a double, a DATE facing a
string — fails loudly with the query, column, and both types.

Usage: python3 tools/type_parity.py <sf_dir> <verify_out_dir>
Exit code 0 iff zero mismatches.
"""
import glob
import json
import os
import re
import sys

import duckdb
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def canon_duck(t):
    """DuckDB DESCRIBE type string -> canonical token."""
    t = t.strip()
    if t.endswith("[]"):
        return f"list<{canon_duck(t[:-2])}>"
    m = re.fullmatch(r"DECIMAL\((\d+),\s*(\d+)\)", t)
    if m:
        return f"dec({m.group(1)},{m.group(2)})"
    return {
        "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32",
        "BIGINT": "i64", "HUGEINT": "i128", "UTINYINT": "u8",
        "USMALLINT": "u16", "UINTEGER": "u32", "UBIGINT": "u64",
        "FLOAT": "f32", "DOUBLE": "f64", "VARCHAR": "str",
        "BOOLEAN": "bool", "DATE": "date", "TIMESTAMP": "ts",
        "TIMESTAMP WITH TIME ZONE": "ts", "BLOB": "bin",
    }.get(t, f"?duck:{t}")


def canon_arrow(t):
    """pyarrow DataType -> canonical token."""
    import pyarrow as pa
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_arrow(t.value_type)}>"
    if pa.types.is_decimal(t):
        return f"dec({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    return {
        "int8": "i8", "int16": "i16", "int32": "i32", "int64": "i64",
        "uint8": "u8", "uint16": "u16", "uint32": "u32", "uint64": "u64",
        "float": "f32", "double": "f64", "string": "str",
        "large_string": "str", "bool": "bool", "binary": "bin",
        "large_binary": "bin",
    }.get(str(t), f"?arrow:{t}")


ok = 0
bad = []
skipped = []
for name in sorted(oracle):
    path = os.path.join(out_dir, name)
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        skipped.append(name)
        continue
    spark_schema = pq.read_schema(files[0])
    spark_types = {f.name: canon_arrow(f.type) for f in spark_schema}
    try:
        desc = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
    except Exception as e:
        bad.append((name, "*", "DESCRIBE-ERR", str(e)[:120]))
        continue
    ora_types = {r[0]: canon_duck(r[1]) for r in desc}
    if set(spark_types) != set(ora_types):
        bad.append((name, "*", f"cols spark={sorted(spark_types)}",
                    f"oracle={sorted(ora_types)}"))
        continue
    mism = [(c, spark_types[c], ora_types[c])
            for c in sorted(spark_types) if spark_types[c] != ora_types[c]]
    if mism:
        for c, a, b in mism:
            bad.append((name, c, a, b))
    else:
        ok += 1

for name, col, a, b in bad:
    print(f"TYPE-MISMATCH {name:28s} {col:16s} spark={a} oracle={b}")
for name in skipped:
    print(f"SKIP(no-out)  {name}")
print(f"\n{ok} ok, {len(bad)} mismatched cells, {len(skipped)} skipped")
sys.exit(0 if not bad else 1)
