#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB oracle compare."""
import sys, os, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    failures = 0
    dumped = {os.path.basename(p) for p in glob.glob(os.path.join(out, "*")) if os.path.isdir(p)}
    for name in sorted(dumped):
        files = glob.glob(os.path.join(out, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet written")
            failures += 1
            continue
        sdf = con.execute(f"SELECT * FROM '{files[0]}'").fetchall()
        scols = [d[0] for d in con.description]
        if name not in oracle:
            print(f"rows {name}: {len(sdf)} rows (no oracle)")
            if len(sdf) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            odf = con.execute(oracle[name]).fetchall()
            ocols = [d[0] for d in con.description]
            # Type gate: the driver's compare is type-sensitive, ours
            # stringifies — so catch DuckDB integer-promotion (sum() ->
            # HUGEINT) and DECIMAL output columns here, the x01/t29/l15
            # failure class that value-level compares cannot see.
            otypes = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
            bad = [(c, t) for c, t, *_ in otypes
                   if any(k in str(t).upper() for k in ("HUGEINT", "DECIMAL"))]
            if bad:
                print(f"FAIL {name}: oracle output typed {bad} — "
                      f"CAST the projection (driver gate hashes types)")
                failures += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            failures += 1
            continue
        stypes = dict((c, str(t).upper()) for c, t, *_ in
                      con.execute(f"DESCRIBE (SELECT * FROM '{files[0]}')").fetchall())
        for c, t, *_ in otypes:
            st, ot = stypes.get(c, "?"), str(t).upper()
            if st != ot and {st, ot} not in ({"INTEGER", "BIGINT"}, {"FLOAT", "DOUBLE"}):
                print(f"  WARN {name}: column '{c}' spark={st} oracle={ot}")
        a, b = canon(sdf, scols), canon(odf, ocols)
        if a != b:
            failures += 1
            diff = [(x, y) for x, y in zip(a, b) if x != y]
            print(f"FAIL {name}: {len(sdf)} vs {len(odf)} rows, {len(diff)} mismatched")
            for x, y in diff[:3]:
                print(f"   spark : {x}\n   oracle: {y}")
            if len(a) != len(b):
                only_a = set(a) - set(b); only_b = set(b) - set(a)
                for x in list(only_a)[:2]: print(f"   only-spark : {x}")
                for x in list(only_b)[:2]: print(f"   only-oracle: {x}")
        else:
            print(f"OK   {name}: {len(sdf)} rows")
    for name in sorted(set(oracle) - dumped):
        print(f"FAIL {name}: oracle present but no spark output")
        failures += 1
    print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
