#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs DuckDB on the oracle SQL dumped by `graft.Verify` and compares each
query's Spark parquet output: column names (sorted), dtypes, row count,
and exact values after sorting rows by all columns.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").arrow()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        ok, msg = compare(exp, got)
        if ok:
            print(f"PASS {name}: {got.num_rows} rows" +
                  (f"  [{msg}]" if msg else ""))
        else:
            print(f"FAIL {name}: {msg}")
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


def canon(t):
    """Canonical dtype class — the coercions the driver's hash provably
    tolerates (202 green r13 rows span int32/int64 and string/
    large_string mismatches) and NOTHING more.  decimal128 is its own
    class on purpose: in r13 three queries with bit-identical VALUES
    hash-failed the driver solely because they emitted decimal128(38,0)
    where every green query emits int64 — a value-coerced compare
    (Decimal(5) == 5 in python) passed locally and missed it.
    """
    import pyarrow.types as pt
    if pt.is_decimal(t):
        return "DECIMAL"
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_list(t) or pt.is_large_list(t):
        return f"list<{canon(t.value_type)}>"
    if pt.is_struct(t):
        inner = ",".join(f"{t.field(i).name}:{canon(t.field(i).type)}"
                         for i in range(t.num_fields))
        return f"struct<{inner}>"
    return str(t)


def compare(exp, got):
    import pyarrow as pa
    e_cols, g_cols = sorted(exp.column_names), sorted(got.column_names)
    if e_cols != g_cols:
        return False, f"columns differ: oracle={e_cols} spark={g_cols}"
    if exp.num_rows != got.num_rows:
        return False, f"row count: oracle={exp.num_rows} spark={got.num_rows}"
    exp = exp.select(e_cols)
    got = got.select(e_cols)
    warn = []
    for c in e_cols:
        et, gt = exp.schema.field(c).type, got.schema.field(c).type
        ec, gc = canon(et), canon(gt)
        if "DECIMAL" in ec or "DECIMAL" in gc:
            return False, (f"decimal dtype on emitted surface in column "
                           f"{c}: oracle={et} spark={gt} — the driver "
                           f"hash-fails decimal outputs even when values "
                           f"match; cast to BIGINT/DOUBLE at the edge")
        if ec != gc:
            return False, (f"dtype class differs in column {c}: "
                           f"oracle={et} spark={gt} — the driver hash is "
                           f"dtype-sensitive beyond width")
        if et != gt:
            warn.append(f"dtype {c}: oracle={et} spark={gt}")
    # sort rows by all columns, then compare cell-by-cell via python objects
    keys = [(c, "ascending") for c in e_cols]
    exp = exp.sort_by(keys)
    got = got.sort_by(keys)
    for c in e_cols:
        ev, gv = exp.column(c).to_pylist(), got.column(c).to_pylist()
        if ev != gv:
            bad = next(i for i, (a, b) in enumerate(zip(ev, gv)) if a != b)
            return False, (f"values differ in column {c} at sorted row "
                           f"{bad}: oracle={ev[bad]!r} spark={gv[bad]!r}")
    return True, "; ".join(warn)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
