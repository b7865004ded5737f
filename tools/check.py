#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle comparison.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet produced by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB 1.0 over views
named after the tables in <sfDir>, and compares: column names (sorted),
dtypes, row count, and cell-exact values in result order. This is the
builder's inner loop; the real gate is the driver's CORRECTNESS_r{N}.json.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = connect(sf_dir)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            o = con.execute(oracle[name])
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        s = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        msgs = []
        # Driver-hash guard: the driver hashes canonicalized cell STRINGS,
        # where Decimal('123') and 123 render differently even though
        # Python compares them equal — so a raw DECIMAL output column can
        # pass this value-level check yet fail the driver (r14 q166).
        # Flag decimal-typed outputs on EITHER side as hard failures.
        # Detection is SCHEMA-level (DESCRIBE column_type), so a decimal
        # column that happens to be NULL in every row is still caught;
        # a full-row value scan is the fallback if DESCRIBE fails.
        import decimal as _dec
        def _dec_cols_schema(sql):
            try:
                d = con.execute(f"DESCRIBE {sql}").fetchall()
                return sorted(r[0] for r in d if "DECIMAL" in str(r[1]).upper())
            except Exception:
                return None
        def _dec_cols_values(cols, rows):
            hit = set()
            for r in rows:
                for c, v in zip(cols, r):
                    if isinstance(v, _dec.Decimal):
                        hit.add(c)
            return sorted(hit)
        sdec = _dec_cols_schema(f"SELECT * FROM read_parquet({files!r})")
        if sdec is None:
            sdec = _dec_cols_values(scols, srows)
        odec = _dec_cols_schema(oracle[name])
        if odec is None:
            odec = _dec_cols_values(ocols, orows)
        if sdec or odec:
            msgs.append(f"raw DECIMAL output (driver hash would diverge): "
                        f"spark={sdec} oracle={odec}")
        if sorted(scols) != sorted(ocols):
            msgs.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            msgs.append(f"rowcount differs: spark={len(srows)} oracle={len(orows)}")
        if not msgs:
            # align column order by sorted name (the driver sorts by name)
            sidx = [scols.index(c) for c in sorted(scols)]
            oidx = [ocols.index(c) for c in sorted(ocols)]
            # dtype comparison via duckdb types
            stypes = [con.execute(f"SELECT typeof({scols[i]}) FROM read_parquet({files!r}) LIMIT 1").fetchone()
                      for i in sidx] if srows else []
            for k, (sr, orow) in enumerate(zip(srows, orows)):
                srow_s = tuple(norm(sr[i]) for i in sidx)
                orow_s = tuple(norm(orow[i]) for i in oidx)
                if srow_s != orow_s:
                    msgs.append(f"row {k} differs:\n  spark : {srow_s}\n  oracle: {orow_s}")
                    if len([m for m in msgs if m.startswith("row ")]) >= 3:
                        break
        if msgs:
            print(f"FAIL {name} ({len(srows)} rows)")
            for m in msgs:
                print(f"  {m}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
