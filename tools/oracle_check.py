#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
Runs each oracle_sql.json entry in DuckDB over the sfDir parquet tables and
compares to the Spark parquet dumps (column names sorted, rows sorted, doubles
compared with tolerance). Dev tool only — not part of the Scala library.
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # Unify dtypes for compare: timestamps->str, categoricals->obj
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(by=sort_cols, kind="mergesort", na_position="first")
    except Exception:
        df = df.sort_values(by=sort_cols, key=lambda s: s.astype(str),
                            kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def compare(name, spark_df, duck_df):
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return f"COLS spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # Driver's hash compare is representation-sensitive: DuckDB HUGEINT
        # (e.g. sum of integers) lands as float64 while Spark emits int64 —
        # values match but hashes diverge. Flag dtype class mismatch hard.
        if pd.api.types.is_float_dtype(av) != pd.api.types.is_float_dtype(bv):
            return (f"DTYPE col={c} spark={av.dtype} duck={bv.dtype} "
                    f"(cast oracle to ::BIGINT/::DOUBLE to match)")
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            ok = np.isclose(af, bf, rtol=1e-9, atol=1e-9, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                return f"VAL col={c} row={i} spark={af[i]!r} duck={bf[i]!r}"
            # STRICT (r12): the driver hashes a rounded decimal rendering,
            # not an isclose() band. Round 11's fs02 shipped locally green
            # (rtol passed) and driver-RED: 559784605.5800003 vs …5.5799994
            # straddle the 6-decimal boundary. Empirically (r11 dump, 227
            # entries) round-6 equality reproduces the driver's verdict
            # exactly: every green entry passes it, fs02 alone fails. Any
            # float that differs at round-6 is treated as driver-red here.
            nan = np.isnan(af) & np.isnan(bf)
            r6 = (np.round(af, 6) == np.round(bf, 6)) | nan
            if not r6.all():
                i = int(np.argmin(r6))
                return (f"HASH col={c} row={i} spark={af[i]!r} duck={bf[i]!r} "
                        f"(round-6 mismatch: driver hash would differ — make "
                        f"the aggregate decimal-exact, see Tables.money)")
            # LINT: a large-magnitude double whose ulp approaches the hash
            # granularity is one plan change away from a straddle even when
            # today's values agree. Surface the exposure, don't fail.
            big = (np.abs(af) > 1e7) & ~(af == bf) & ~nan
            if big.any():
                i = int(np.argmax(big))
                print(f"  LINT {name}.{c}: |v|>1e7 and not bit-identical "
                      f"(row {i}: {af[i]!r} vs {bf[i]!r}) — decimal-cast the "
                      f"aggregate to remove hash-boundary exposure")
        else:
            try:
                an = av.astype("Int64") if pd.api.types.is_integer_dtype(bv) or pd.api.types.is_integer_dtype(av) else av.astype(str).where(av.notna(), None)
                bn = bv.astype("Int64") if pd.api.types.is_integer_dtype(bv) or pd.api.types.is_integer_dtype(av) else bv.astype(str).where(bv.notna(), None)
                neq = ~((an == bn) | (an.isna() & bn.isna()))
            except Exception:
                an = av.astype(str); bn = bv.astype(str)
                neq = an != bn
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                return f"VAL col={c} row={i} spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}"); n_fail += 1; continue
        err = compare(name, spark_df, duck_df)
        if err: print(f"FAIL {name}: {err}"); n_fail += 1
        else: print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
