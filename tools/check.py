#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's gate:
run Verify's parquet outputs against DuckDB executing oracle_sql.json
over the same testdata tables; sort columns by name, sort rows, compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, os, sys
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return v

def rows_of(table: pa.Table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    return cols, sorted(
        (tuple(norm_cell(col[i]) for col in data) for i in range(table.num_rows)),
        key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r),
    )

def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(close(x, y) for x, y in zip(a, b))
    return a == b

# Arrow type KIND for the oracle/spark schema lint (r11 verdict,
# generalized in r12): DuckDB silently widens sum(BIGINT) to HUGEINT ->
# Arrow decimal128(38,0) -> Python Decimal. The value compare treats
# Decimal(3) == 3 as green, but the driver's hasher is
# repr/type-sensitive (Decimal('0') vs 0) — the proven root cause of
# every r9-r11 driver-only hash-red. The same green-locally/
# red-at-the-driver shape exists for every pair Python `==` conflates
# across types: bool==int (True==1), float==int (3.0==3),
# Decimal==float. The comparator fails LOCALLY whenever an oracle
# column's kind differs from its Spark twin's (int widths and
# string/large_string are the same kind; decimal, bool, float, int,
# date, timestamp are all distinct kinds), so no instance of the class
# can reach the driver again.
def kind(t):
    # dictionary encoding is a layout choice, not a type: unwrap so a
    # future DuckDB emitting dictionary<string> doesn't read as a false
    # mismatch against Spark's plain string
    if pa.types.is_dictionary(t): return kind(t.value_type)
    if pa.types.is_boolean(t): return "bool"
    if pa.types.is_integer(t): return "int"
    if pa.types.is_floating(t): return "float"
    if pa.types.is_decimal(t): return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t): return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t): return "binary"
    if pa.types.is_date(t): return "date"
    if pa.types.is_timestamp(t): return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{kind(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct{" + ",".join(
            f"{t.field(i).name}:{kind(t.field(i).type)}"
            for i in range(t.num_fields)) + "}"
    if pa.types.is_map(t):
        return f"map<{kind(t.key_type)},{kind(t.item_type)}>"
    return str(t)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # big-SF runs: let the caller pin DuckDB's memory ceiling and spill
    # location (heavy dedup oracles at sf1 spill tens of GB; an
    # explicit temp_directory keeps that off the repo tree)
    if os.environ.get("GRAFT_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
    if os.environ.get("GRAFT_DUCKDB_TMP"):
        con.execute(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TMP']}'")
    # r11 verdict task 4: the oracle's own parallelism is an environment
    # axis too — gate.sh re-runs the comparator under threads=1 so a
    # DuckDB scheduling-order dependence (e.g. a nondeterministic
    # tie-break surviving only at one thread count) can't masquerade as
    # an engine red
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata is a single file; Spark-materialized dirs
        # (e.g. /tmp/graft_sf1 from ScaleSmoke) are part directories
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            fail += 1
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            fail += 1
            continue
        spark_types = {f.name: f.type for f in got.schema}
        kind_mismatch = [
            (f.name, kind(f.type), kind(spark_types[f.name]))
            for f in want.schema
            if f.name in spark_types and kind(f.type) != kind(spark_types[f.name])]
        if kind_mismatch:
            print(f"FAIL {name}: oracle/spark type-kind mismatch "
                  + "; ".join(f"{c}: duckdb={a} spark={b}" for c, a, b in kind_mismatch)
                  + "  (CAST the oracle column — Python == would hide this, the driver hasher won't)")
            fail += 1
            continue
        gc, gr = rows_of(got)
        wc, wr = rows_of(want)
        if gc != wc:
            print(f"FAIL {name}: columns differ spark={gc} duckdb={wc}")
            fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rowcount spark={len(gr)} duckdb={len(wr)}")
            fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(gr, wr)) if not close(a, b)]
        exact = gr == wr
        if bad:
            print(f"FAIL {name}: {len(bad)} differing rows (of {len(gr)}); first {min(5, len(bad))}:")
            for i, a, b in bad[:5]:
                print(f"  row[{i}] spark ={a}")
                print(f"  row[{i}] duckdb={b}")
            # forensic dump: the full (capped) diff, machine-readable, so a
            # red row names its rows instead of a bare boolean (r10 verdict)
            with open(f"{out_dir}/{name}.rowdiff.json", "w") as f:
                json.dump({"name": name, "n_rows": len(gr), "n_diff": len(bad),
                           "cols": gc,
                           "diffs": [{"i": i, "spark": repr(a), "duckdb": repr(b)}
                                     for i, a, b in bad[:200]]}, f, indent=1)
            fail += 1
        else:
            print(f"OK   {name} rows={len(gr)}" + ("" if exact else "  (float-tolerant only!)"))
            ok += 1
    print(f"== {ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
