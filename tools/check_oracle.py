#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle SQL from
<verifyOutDir>/oracle_sql.json, loads the matching Spark result parquet, and
compares: column names (sorted), row count, and cell values (exact for
ints/strings, tight tolerance report for floats — the real driver hashes, so
we flag ANY float difference).
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark_result(path):
    # Verify writes coalesce(1), and row ORDER matters (the ORDER BY
    # results are compared positionally) — a multi-part result means that
    # contract broke, and silently reading glob()[0] would mis-order or
    # truncate rows. Fail loudly instead (ADVICE r1).
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        return None
    assert len(files) == 1, (
        f"{path}: expected exactly one part file (Verify coalesces to 1; "
        f"row order is part of the comparison), found {len(files)}")
    return pq.read_table(files[0]).to_pandas()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_df = load_spark_result(f"{out_dir}/{name}")
        if spark_df is None:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}"); n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}"); n_fail += 1; continue
        bad = None
        for c in s_cols:
            sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if a is None and b is None:
                    continue
                if isinstance(a, float) or isinstance(b, float):
                    an = a is None or (isinstance(a, float) and math.isnan(a))
                    bn = b is None or (isinstance(b, float) and math.isnan(b))
                    if an and bn:
                        continue
                    if an != bn or a != b:
                        bad = f"col={c} row={i}: spark={a!r} duck={b!r}"; break
                elif str(a) != str(b):
                    bad = f"col={c} row={i}: spark={a!r} duck={b!r}"; break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
