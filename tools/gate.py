#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/gate.py <sfdir> <verify_out_dir> [query ...]

Runs each oracle SQL from <verify_out_dir>/oracle_sql.json in DuckDB over
the parquet tables in <sfdir>, and compares (column-name-sorted,
row-sorted) values against the Spark parquet dumps written by graft.Verify.
NOT shipped product code — a dev harness only (driver-side python deps).
"""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq
import numpy as np

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(list(v)) if isinstance(v, (list, np.ndarray)) else str(v))
        elif str(df[c].dtype).startswith('datetime'):
            df[c] = df[c].astype('datetime64[us]').astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def serialize(v):
    """Driver-equivalent value serialization: int-vs-float formatting is
    PRESERVED, so a DuckDB HUGEINT fetched as float64 (0.0) fails against a
    Spark BIGINT (0) even though the values compare numerically equal —
    exactly like the driver's serialized-hash compare (CORRECTNESS r7 row 46).
    """
    if v is None:
        return 'NULL'
    if isinstance(v, (float, np.floating)):
        if v != v:
            return 'NaN'
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    return str(v)


def main():
    sfdir, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            o = con.execute(sql).fetchdf()
            files = glob.glob(f'{out}/{name}/*.parquet')
            if not files:
                print(f'{name}: NO SPARK OUTPUT')
                fails += 1
                continue
            s = pq.read_table(files).to_pandas()
            so, ss = norm(o), norm(s)
            if list(so.columns) != list(ss.columns):
                print(f'{name}: COLS oracle={list(so.columns)} spark={list(ss.columns)}')
                fails += 1
                continue
            if len(so) != len(ss):
                print(f'{name}: ROWS oracle={len(so)} spark={len(ss)}')
                fails += 1
                continue
            bad = []
            for c in so.columns:
                a, b = so[c].map(serialize), ss[c].map(serialize)
                if not a.equals(b):
                    bad.append(c)
                    mism = a != b
                    idx = list(np.where(mism)[0][:3])
                    print(f'{name}: COL {c} differs at rows {idx}: '
                          f'oracle={a.iloc[idx].tolist()} spark={b.iloc[idx].tolist()}')
            if bad:
                fails += 1
            else:
                print(f'{name}: OK ({len(so)} rows)')
        except Exception as e:
            print(f'{name}: ERROR {type(e).__name__}: {e}')
            fails += 1
    print(f'--- {fails} failing' if fails else '--- all green')
    sys.exit(1 if fails else 0)


if __name__ == '__main__':
    main()
