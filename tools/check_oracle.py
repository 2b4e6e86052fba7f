#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ (Spark parquet) and compares against the
DuckDB result of oracle_sql.json[<name>] run over the sfDir tables: columns
sorted by name, rows sorted by all columns, values compared cell-by-cell
(floats to 9 significant digits).
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = float(f"{v:.9g}")
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [cols[i] for i in idx], out

def col_types(con, sql):
    """Column name -> DuckDB type for an arbitrary SELECT/WITH query.

    The driver's hash is TYPE-SENSITIVE (DuckDB sum()/'//' chains promote to
    HUGEINT while Spark parquet stays BIGINT — the q_pack_contexts r3 and
    q_ngram_familiarity r7 escapes), and cursor.description only reports a
    generic 'NUMBER', so DESCRIBE is the only local view of what the driver
    hashes."""
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        spark_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        try:
            dd = con.execute(sql)
            dcols = [c[0] for c in dd.description]
            drows = dd.fetchall()
            dtypes = col_types(con, sql)
            sp = con.execute(spark_sql)
            scols = [c[0] for c in sp.description]
            srows = sp.fetchall()
            stypes = col_types(con, spark_sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        dc, dr = canon(drows, dcols)
        sc, sr = canon(srows, scols)
        if dc != sc:
            print(f"FAIL {name}: columns differ duck={dc} spark={sc}")
            failed.append(name); continue
        drift = [(c, dtypes[c], stypes[c]) for c in dc if dtypes[c] != stypes[c]]
        if drift:
            print(f"FAIL {name}: TYPE drift (driver hash is type-sensitive): "
                  + ", ".join(f"{c} duck={a} spark={b}" for c, a, b in drift))
            failed.append(name); continue
        if len(dr) != len(sr):
            print(f"FAIL {name}: rowcount duck={len(dr)} spark={len(sr)}")
            failed.append(name); continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(dr, sr)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(dr)} rows differ; first at {i}:\n  duck ={a}\n  spark={b}\n  cols={dc}")
            failed.append(name); continue
        print(f"OK   {name}: {len(dr)} rows")
    print(f"\n{len(oracle)-len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
