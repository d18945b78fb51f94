#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle and compare row-for-row (columns sorted by name,
rows sorted, values hashed). Usage:

    python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df):
    df = df[sorted(df.columns)]
    # array-valued columns (numpy arrays) are unhashable — sort on their
    # string rendering instead
    for c in df.columns:
        if df[c].map(lambda v: hasattr(v, "__len__") and not isinstance(v, str)).any():
            df[c] = df[c].map(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    with open(f"{out_dir}/oracle_sql.json") as fp:
        oracle = json.load(fp)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns differ: oracle={sorted(exp.columns)} spark={sorted(got.columns)}")
            n_fail += 1
            continue
        e_n, g_n = normalize(exp), normalize(got)
        if len(e_n) != len(g_n):
            print(f"FAIL {name}: row count differs: oracle={len(e_n)} spark={len(g_n)}")
            n_fail += 1
            continue
        # compare as rendered strings (mirrors a value-hash comparison)
        e_s = e_n.astype(str)
        g_s = g_n.astype(str)
        if not e_s.equals(g_s):
            diff = (e_s != g_s).any(axis=1)
            idx = diff[diff].index[:5]
            print(f"FAIL {name}: values differ at rows {list(idx)}")
            for i in idx:
                print(f"  oracle: {e_n.loc[i].to_dict()}")
                print(f"  spark : {g_n.loc[i].to_dict()}")
            n_fail += 1
            continue
        # dtype check (schema match)
        dt_e = {c: str(t) for c, t in exp.dtypes.items()}
        dt_g = {c: str(t) for c, t in got.dtypes.items()}
        note = "" if dt_e == dt_g else f"  [dtype diff: {dt_e} vs {dt_g}]"
        print(f"PASS {name} ({len(e_n)} rows){note}")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
