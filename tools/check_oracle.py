"""Replay the driver's DuckDB oracle compare locally.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

Reads <verify_outdir>/oracle_sql.json, runs each SQL in DuckDB over the
parquet tables in <sfdir>, loads the Spark parquet result from
<verify_outdir>/<name>/, sorts columns by name and rows, and compares
values (exact for ints/strings, bit-exact for rounded doubles with a
1e-9 fallback report).
"""
import json, math, sys, glob
import duckdb

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), \
           [cols[i] for i in order]

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fb))
    return a == b

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        except Exception:
            pass
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ora = con.execute(sql)
            ora_rows = ora.fetchall()
            ora_cols = [d[0] for d in ora.description]
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})")
            got_rows = got.fetchall()
            got_cols = [d[0] for d in got.description]
            o_rows, o_cols = norm(ora_rows, ora_cols)
            g_rows, g_cols = norm(got_rows, got_cols)
            if o_cols != g_cols:
                print(f"FAIL {name}: schema {g_cols} != oracle {o_cols}")
                n_fail += 1
                continue
            if len(o_rows) != len(g_rows):
                print(f"FAIL {name}: rows {len(g_rows)} != oracle {len(o_rows)}")
                n_fail += 1
                continue
            bad = None
            for i, (orow, grow) in enumerate(zip(o_rows, g_rows)):
                if not all(eq(g, o) for g, o in zip(grow, orow)):
                    bad = (i, grow, orow)
                    break
            if bad:
                print(f"FAIL {name}: first mismatch row {bad[0]}:\n  got    {bad[1]}\n  oracle {bad[2]}")
                n_fail += 1
            else:
                print(f"PASS {name}: {len(g_rows)} rows")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__} {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
