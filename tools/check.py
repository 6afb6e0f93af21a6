#!/usr/bin/env python3
"""Local driver-sim: run DuckDB oracle SQL vs Verify's parquet dumps.

Mirrors the driver's t2 check: for each query, load Spark's result
parquet and the oracle result, sort columns by name, sort rows, and
compare values. The driver's hash is TYPE-sensitive (round-2 lesson:
DuckDB sum() over BIGINT widens to HUGEINT/decimal128 and the driver
flagged 3 queries check.py called green), so this sim now compares
arrow types strictly BEFORE comparing values — no integer coercion.
Dev-only tool (driver-side python has duckdb; our shipped Scala code
never uses this).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon_type(t: pa.DataType) -> str:
    """Canonical arrow type string for strict compare.

    Only two physical-detail allowances, both representation-not-value:
    timestamp unit/tz (Spark writes us/UTC, DuckDB returns us or ns,
    naive) and large_string vs string. Integer WIDTH and decimal vs int
    are NOT normalized — that is exactly the class the driver flags.
    """
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)

def arrow_types(tbl: pa.Table) -> dict:
    return {f.name: canon_type(f.type) for f in tbl.schema}

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # value-compare normalization only — the strict type gate already ran
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify emits each oracle under both "<name>" and "<name>.parquet"
    # (driver keys by dump dir name) — dedupe to bare names here.
    oracle = {k.removesuffix(".parquet"): v for k, v in oracle.items()}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}.parquet/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got_t = pa.concat_tables([pq.read_table(f) for f in files])
            exp_t = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        gt, et = arrow_types(got_t), arrow_types(exp_t)
        if sorted(gt) != sorted(et):
            print(f"FAIL {name}: columns {sorted(gt)} vs {sorted(et)}")
            n_bad += 1; continue
        tdiff = {c: (gt[c], et[c]) for c in gt if gt[c] != et[c]}
        if tdiff:
            print(f"FAIL {name}: TYPE mismatch spark-vs-oracle {tdiff}")
            n_bad += 1; continue
        try:
            got = norm(got_t.to_pandas())
            exp = norm(exp_t.to_pandas())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}"); n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
