#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare against the Spark parquet dump
from graft.Verify (sort columns by name, sort rows, compare doubles at 12
significant digits with a 1e-12-relative-tolerance fallback).

Sensitivity calibration (round 4 postmortem): the old 7-sig-digit
canonicalization passed q88's 2.5e-10 relative drift that the driver's
hash FAILED; full round-trip precision is too strict the other way —
the driver demonstrably accepts last-ulp (~1e-16 rel) summation noise
on q42/q66/q73/q75/q83. 12 digits separates the regimes: ulp noise
vanishes, cast-rounding drift (1e-10) stays visible. The tolerance
fallback absorbs the rare value that straddles a 12-digit rounding
boundary by one ulp. Usage: check.py <sfDir> <verifyOutDir>
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
                    v = 0.0  # normalize -0.0
                else:
                    v = "%.12g" % v
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)

def rows_equal_tol(orows, ocols, srows, scols, rel=1e-12):
    """Fallback when 12-sig-digit canon mismatches: pair rows by a coarse
    (6-digit) sort key, then require every float within `rel` relative
    tolerance and every non-float exactly equal. Absorbs one-ulp values
    that straddle a 12-digit rounding boundary without letting 1e-10
    cast-rounding drift (the q88 class) back through."""
    if len(orows) != len(srows):
        return False
    def keyed(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            vals = [r[i] for i in order]
            key = tuple("%.6g" % v if isinstance(v, float) and v == v
                        and not math.isinf(v) else str(v) for v in vals)
            out.append((key, vals))
        return sorted(out, key=lambda kv: kv[0])
    for (_, ov), (_, sv) in zip(keyed(orows, ocols), keyed(srows, scols)):
        for a, b in zip(ov, sv):
            if isinstance(a, float) and isinstance(b, float):
                if a != a and b != b:
                    continue
                if a != b and abs(a - b) > rel * max(abs(a), abs(b), 1.0):
                    return False
            elif str(a) != str(b):
                return False
    return True

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
        elif rows_equal_tol(orows, ocols, srows, scols):
            print(f"ok   {name} ({len(sc)} rows, tol-fallback)")
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
