#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 dev/check_oracle.py [sfDir] [outDir]
Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`.
Dev-only tool; duckdb/pyarrow are driver-side deps, not part of the library.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# Optional third arg: write a driver-schema artifact
# ({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
# err}}) — the exact shape of CORRECTNESS_r*.json — so a round whose
# driver-side gate comes back empty (rounds 7-8) still carries the oracle
# verdict in-band, committed as CORRECTNESS_LOCAL.json.
artifact_path = sys.argv[3] if len(sys.argv) > 3 else None
artifact = {}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def dtypes_exact(df):
    """Exact dtype name per column BEFORE canonicalization — the driver
    hashes raw values, so int32 vs int64, datetime units, or int64 vs
    float64 (DuckDB HUGEINT via pandas) all break its hash even when the
    numbers are equal. Coarse 'kind' letters hid the width/unit cases."""
    return {c: df[c].dtype.name for c in df.columns}

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # unify int widths for compare
    return df.reset_index(drop=True)

n_pass = n_fail = 0


def record(name, rows_match, schema_match, hash_match,
           spark_rows=None, oracle_rows=None, err=None):
    artifact[name] = {"rows_match": rows_match, "schema_match": schema_match,
                      "hash_match": hash_match, "spark_rows": spark_rows,
                      "oracle_rows": oracle_rows, "err": err}


for name in sorted(oracle):
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result at {res_dir}")
        record(name, False, False, False, err=f"no spark result at {res_dir}")
        n_fail += 1
        continue
    spark_raw = pq.read_table(files[0]).to_pandas()
    spark_df = canon(spark_raw)
    try:
        duck_raw = con.execute(oracle[name]).fetchdf()
        duck_df = canon(duck_raw)
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        record(name, False, False, False, spark_rows=len(spark_df),
               err=f"duckdb error: {e}")
        n_fail += 1
        continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        record(name, len(spark_df) == len(duck_df), False, False,
               spark_rows=len(spark_df), oracle_rows=len(duck_df),
               err="column mismatch")
        n_fail += 1
        continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        record(name, False, True, False,
               spark_rows=len(spark_df), oracle_rows=len(duck_df),
               err="row-count mismatch")
        n_fail += 1
        continue
    # Dtype parity. Cross-family mismatches (int vs float — e.g. DuckDB
    # HUGEINT sums arriving as float64) FAIL: they are exactly what broke
    # the driver hash in round 2. Same-family width/unit differences
    # (int32 vs int64, datetime ns vs us) only WARN: empirically the
    # driver canonicalizes those (round-2 queries with int32-vs-int64
    # columns hash-matched), but they're worth a human eye. NULL-bearing
    # columns are no longer silently skipped — they WARN too (pandas
    # widens int→float around NULLs, so a mismatch there may be a pandas
    # artifact rather than an engine one).
    def family(dtype_name):
        if dtype_name.startswith("datetime"):
            return "t"
        if dtype_name.startswith("float"):
            return "f"
        if dtype_name.startswith(("int", "uint")):
            return "i"
        if dtype_name == "bool":
            return "b"
        return "o"
    sk, dk = dtypes_exact(spark_raw), dtypes_exact(duck_raw)
    dtype_bad, dtype_warn = [], []
    for c in spark_df.columns:
        if sk[c] == dk[c]:
            continue
        has_null = spark_raw[c].isna().any() or duck_raw[c].isna().any()
        if family(sk[c]) != family(dk[c]) and not has_null:
            dtype_bad.append((c, sk[c], dk[c]))
        elif has_null:
            dtype_warn.append((c, sk[c], dk[c],
                               "NULL-bearing; may be a pandas NULL-widening artifact"))
        else:
            dtype_warn.append((c, sk[c], dk[c],
                               "same family; driver canonicalizes width/unit"))
    for c, a, b, why in dtype_warn:
        print(f"WARN {name}: col={c} dtype spark={a} duck={b} ({why})")
    if dtype_bad:
        print(f"FAIL {name}: dtype mismatches (driver hash would differ):")
        for c, a, b in dtype_bad:
            print(f"  col={c} spark_dtype={a} duck_dtype={b}")
        record(name, True, False, False,
               spark_rows=len(spark_df), oracle_rows=len(duck_df),
               err=f"dtype mismatches: {dtype_bad}")
        n_fail += 1
        continue
    # exact-value compare (the driver hashes values, so approximate equality isn't enough)
    bad = []
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        if pd.api.types.is_float_dtype(a):
            eq = (a.values == b.values) | (a.isna().values & b.isna().values)
        else:
            eq = (a.values == b.values) | (a.isna().values & b.isna().values) \
                if a.isna().any() or b.isna().any() else (a.values == b.values)
        if not eq.all():
            idx = np.where(~eq)[0][:3]
            bad.append((c, [(int(i), a.iloc[i], b.iloc[i]) for i in idx]))
    if bad:
        print(f"FAIL {name}: value mismatches:")
        for c, rows in bad:
            for i, av, dv in rows:
                print(f"  col={c} row={i} spark={av!r} duck={dv!r}")
        record(name, True, True, False,
               spark_rows=len(spark_df), oracle_rows=len(duck_df),
               err=f"value mismatches in cols {[c for c, _ in bad]}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(spark_df)} rows)")
        record(name, True, True, True,
               spark_rows=len(spark_df), oracle_rows=len(duck_df))
        n_pass += 1

if artifact_path:
    with open(artifact_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {artifact_path} ({len(artifact)} queries)")

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
