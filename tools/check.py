#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare against the Spark parquet dump
from graft.Verify (sort columns by name, sort rows, round doubles to 1e-6
relative). Usage: check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if v != v or math.isinf(v):
                    v = str(v)
                elif v == 0:
                    v = 0.0
                else:
                    # 1e-6 relative rounding: ~7 significant digits
                    v = float("%.7g" % v)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            sres = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_bad += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns differ oracle={sorted(ocols)} spark={sorted(scols)}")
            n_bad += 1
            continue
        # Type-kind check: the driver hashes typed values, so e.g. a DuckDB
        # HUGEINT (arrow decimal128) vs Spark BIGINT (arrow int64) mismatches
        # even when the numbers are equal. Stringified comparison below would
        # hide that — catch it here at the arrow-schema level.
        try:
            import pyarrow as pa
            def kind(t):
                if pa.types.is_integer(t): return "int"
                if pa.types.is_decimal(t): return "decimal"
                if pa.types.is_floating(t): return "float"
                if pa.types.is_boolean(t): return "bool"
                if pa.types.is_timestamp(t): return "timestamp"
                if pa.types.is_date(t): return "date"
                if pa.types.is_binary(t) or pa.types.is_large_binary(t): return "binary"
                if pa.types.is_string(t) or pa.types.is_large_string(t): return "string"
                return str(t)
            oschema = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema
            sschema = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet') LIMIT 0").arrow().schema
            okinds = {f.name: kind(f.type) for f in oschema}
            skinds = {f.name: kind(f.type) for f in sschema}
            mism = {c: (okinds[c], skinds[c]) for c in okinds if okinds[c] != skinds.get(c)}
            if mism:
                print(f"FAIL {name}: type-kind mismatch (oracle, spark): {mism}")
                n_bad += 1
                continue
        except ImportError:
            pass
        oc, sc = canon(orows, ocols), canon(srows, scols)
        if oc == sc:
            print(f"ok   {name} ({len(sc)} rows)")
            n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: rows oracle={len(oc)} spark={len(sc)}")
            sc_set, oc_set = set(sc), set(oc)
            diff_o = [x for x in oc if x not in sc_set][:3]
            diff_s = [x for x in sc if x not in oc_set][:3]
            for d in diff_o: print(f"  oracle-only: {d[:160]}")
            for d in diff_s: print(f"  spark-only:  {d[:160]}")
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
