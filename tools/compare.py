#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against views over
<sfDir>/*.parquet, and compares: row count, column names, and a hash of
the value matrix with columns sorted by name (rows sorted too, so
ordering differences don't mask value equality — the driver may or may
not sort rows; our queries are deterministically ordered either way).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for r in mat:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    n_pass = n_fail = n_noora = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchall()
        got_cols = [c[0] for c in con.description]
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            n_noora += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [c[0] for c in con.description]
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        rows_ok = len(got) == len(exp)
        cols_ok = sorted(got_cols) == sorted(exp_cols)
        hash_ok = cols_ok and frame_sig(got_cols, got) == frame_sig(exp_cols, exp)
        if rows_ok and cols_ok and hash_ok:
            print(f"✓ {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"✗ {name}: rows {len(got)}/{len(exp)} cols_ok={cols_ok} hash_ok={hash_ok}")
            if cols_ok and len(got) and len(exp):
                gs = sorted(tuple(canon(v) for v in r) for r in got)
                es = sorted(tuple(canon(v) for v in r) for r in exp)
                for i, (g, e) in enumerate(zip(gs, es)):
                    if g != e:
                        print(f"    first diff at sorted row {i}:\n      got {g}\n      exp {e}")
                        break
            elif not cols_ok:
                print(f"    got cols {sorted(got_cols)}\n    exp cols {sorted(exp_cols)}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
