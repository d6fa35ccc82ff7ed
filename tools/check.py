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
    # tz-awareness is part of the kind (advisor r12): Python == treats
    # naive and tz-aware datetimes of the same instant as unequal-or-
    # TypeError, and a repr/type-sensitive hasher diverges on exactly
    # that attribute. Today BOTH sides are tz-naive (Spark writes
    # isAdjustedToUTC=false under session tz UTC; DuckDB fetch emits
    # naive us) and every timestamp entry is driver-green — this keeps
    # a future flip on either side from passing the lint unchecked.
    # The unit (ns vs us) stays OUT of the kind, like int widths: both
    # fetch to datetime values, same hasher rendering (Verify.canonCell
    # renders epoch micros for the same reason).
    if pa.types.is_timestamp(t): return f"timestamp[tz={t.tz}]"
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
    # Big-SF bounded-error gates (r12 verdict task 2): the sf1 ledger
    # carried 4 rows as documented prose ("estimate within the sketch
    # bound", "output-bound pair mass") instead of machine checks. A
    # spec file (GRAFT_TOLERANCE_SPEC=tools/sf_tolerances.json) turns
    # each into an explicit check:
    #   mode "tolerance": rows aligned on exact key columns; named
    #     value columns compared within a declared rel/abs bound derived
    #     from the sketch parameters; everything else exact.
    #   mode "digest": both sides reduced INSIDE DuckDB to
    #     (count, sum(hash(cols)), bit_xor(hash(cols))) — an
    #     order-independent exact signature computed in linear memory,
    #     for rows too numerous to sort through Python (d4's ~370M
    #     pairs at sf1; integer columns only, so the hashes are
    #     engine-deterministic).
    # NEVER active by default: the driver-mirror sf0.01 gate runs with
    # the env unset and compares every entry exactly.
    tol_spec = {}
    if os.environ.get("GRAFT_TOLERANCE_SPEC"):
        tol_spec = json.load(open(os.environ["GRAFT_TOLERANCE_SPEC"]))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spec = tol_spec.get(name)
        if spec and spec.get("mode") == "digest":
            try:
                con.execute(f"CREATE OR REPLACE VIEW __spark AS "
                            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
                cols = ", ".join(
                    f'"{c}"' for c in sorted(
                        r[0] for r in con.execute("DESCRIBE __spark").fetchall()))
                def sig(src):
                    return con.execute(
                        f"SELECT CAST(count(*) AS BIGINT), "
                        f"CAST(COALESCE(sum(hash({cols})), 0) AS HUGEINT), "
                        f"CAST(COALESCE(bit_xor(hash({cols})), 0) AS UBIGINT) "
                        f"FROM {src}").fetchone()
                got_sig = sig("__spark")
                want_sig = sig(f"(SELECT {cols} FROM ({sql}))")
            except Exception as e:
                print(f"FAIL {name}: digest error: {e}")
                fail += 1
                continue
            if got_sig != want_sig:
                print(f"FAIL {name}: digest mismatch spark={got_sig} duckdb={want_sig}")
                fail += 1
            else:
                print(f"OK   {name} rows={got_sig[0]}  (digest: count+sum/xor(hash) — {spec.get('why','')})")
                ok += 1
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
        if spec and spec.get("mode") == "tolerance":
            # align rows on the declared exact KEY columns (the default
            # full-row sort would mis-align rows whenever the estimate
            # column diverges), then: key + unlisted columns exact,
            # listed columns within their declared bound
            keyc, bounds = spec["key"], spec["cols"]
            kidx = [gc.index(c) for c in keyc]
            # advisor r13: the zip pairing below is only meaningful if
            # the key tuples are UNIQUE on each side and the two key
            # sets are EQUAL — with duplicate keys the pairing of
            # non-key columns is arbitrary sort-order luck, so a
            # genuinely out-of-bound estimate could pass (or a correct
            # one fail). Fail loudly instead of comparing garbage.
            def keyset(rows, side):
                ks = [tuple(row[i] for i in kidx) for row in rows]
                dupes = len(ks) - len(set(ks))
                if dupes:
                    print(f"FAIL {name}: {dupes} duplicate key tuples on "
                          f"{side} (key={keyc}) — tolerance alignment undefined")
                    return None
                return set(ks)
            gks, wks = keyset(gr, "spark"), keyset(wr, "duckdb")
            if gks is None or wks is None:
                fail += 1
                continue
            if gks != wks:
                only_g, only_w = len(gks - wks), len(wks - gks)
                print(f"FAIL {name}: key sets differ (spark-only={only_g}, "
                      f"duckdb-only={only_w}, key={keyc})")
                fail += 1
                continue
            def bykey(rows):
                return sorted(rows, key=lambda r: tuple(
                    (r[i] is None, str(type(r[i])), str(r[i])) for i in kidx))
            bad = []
            for i, (a, b) in enumerate(zip(bykey(gr), bykey(wr))):
                for j, c in enumerate(gc):
                    x, y = a[j], b[j]
                    if c in bounds:
                        if x is None or y is None:
                            if x is not y:
                                bad.append((i, a, b)); break
                            continue
                        lim = (bounds[c].get("abs", 0.0)
                               + bounds[c].get("rel", 0.0) * max(1.0, abs(float(y))))
                        if abs(float(x) - float(y)) > lim:
                            bad.append((i, a, b)); break
                    elif not close(x, y):
                        bad.append((i, a, b)); break
            if bad:
                print(f"FAIL {name}: {len(bad)} rows outside tolerance; first {min(3, len(bad))}:")
                for i, a, b in bad[:3]:
                    print(f"  row[{i}] spark ={a}")
                    print(f"  row[{i}] duckdb={b}")
                fail += 1
            else:
                blurb = ", ".join(f"{c} within " +
                                  "+".join(([f"{v['abs']} abs"] if "abs" in v else [])
                                           + ([f"{v['rel']:.3%} rel"] if "rel" in v else []))
                                  for c, v in bounds.items())
                print(f"OK   {name} rows={len(gr)}  (tolerance: {blurb} — {spec.get('why','')})")
                ok += 1
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
