#!/usr/bin/env python3
"""Oracle result-type walk (round-8 guard).

Round 7's only three driver-red rows were EXACTLY the three oracles whose
DuckDB SQL returned an uncast HUGEINT (INT128) column: the driver's hash
canonicalization renders INT128 differently from Spark's int64 even when
the values are identical, so the row hash-mismatches while being
value-correct.  This walk runs `DESCRIBE <oracle sql>` for every entry in
oracle_sql.json against DuckDB views over the sf parquet tables and FAILS
on any output column typed HUGEINT / UHUGEINT, and on any DECIMAL column
whose Spark counterpart is not also decimal (a DECIMAL oracle column is
only safe when the engine emits DecimalType too — pass the verify outDir
to enable that cross-check).

Usage: python3 tools/oracle_types.py <sfDir> [<verifyOutDir>]
Exit 0 = clean; exit 1 = at least one latent driver-red type.
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD = {"HUGEINT", "UHUGEINT"}


def main():
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle_path = (os.path.join(out_dir, "oracle_sql.json") if out_dir
                   else "/tmp/preflight_vout/oracle_sql.json")
    oracle = json.load(open(oracle_path))

    n_bad = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"  ✗ {name}: DESCRIBE failed: {e}")
            n_bad += 1
            continue
        for col, typ, *_ in desc:
            t = typ.upper()
            if t in BAD:
                print(f"  ✗ {name}.{col}: {typ} — uncast INT128 output; "
                      f"wrap in CAST(... AS BIGINT)")
                n_bad += 1
            elif t.startswith("DECIMAL") and out_dir:
                # safe only if the engine-side parquet column is decimal too
                pdir = os.path.join(out_dir, name)
                if os.path.isdir(pdir):
                    styp = con.execute(
                        f"SELECT * FROM '{pdir}/*.parquet' LIMIT 0")
                    scols = {c[0]: c[1] for c in styp.description}
                    # duckdb python type_code for decimal parquet is NUMBER
                    if col in scols and str(scols[col]).upper() not in (
                            "NUMBER", "DECIMAL"):
                        print(f"  ✗ {name}.{col}: oracle {typ} vs spark "
                              f"{scols[col]} — cast one side")
                        n_bad += 1
    print(f"[oracle-types] {len(oracle)} oracles walked, {n_bad} bad columns")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
