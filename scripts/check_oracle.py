#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
For each query in oracle_sql.json: load my parquet result + run the oracle
SQL in DuckDB, sort columns by name, compare row count / dtypes / values.
"""
import duckdb, json, sys

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tbl in ['region','nation','customer','supplier','part','orders',
            'lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM parquet_scan('{sf}/{tbl}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        mine = con.execute(f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')").df()
        ref = con.execute(sql).df()
        mine = mine.reindex(sorted(mine.columns), axis=1)
        ref = ref.reindex(sorted(ref.columns), axis=1)
        schema_ok = list(map(str, mine.dtypes)) == list(map(str, ref.dtypes)) \
            and list(mine.columns) == list(ref.columns)
        # hash-style strict comparison on stringified values
        val_ok = len(mine) == len(ref) and mine.astype(str).equals(ref.astype(str))
        status = 'OK' if (schema_ok and val_ok) else 'FAIL'
        if status == 'FAIL':
            fails += 1
            print(f'{name}: {status} rows={len(mine)}/{len(ref)} schema_ok={schema_ok}')
            if not schema_ok:
                print('  mine:', dict(zip(mine.columns, map(str, mine.dtypes))))
                print('  ref :', dict(zip(ref.columns, map(str, ref.dtypes))))
            if len(mine) == len(ref) and list(mine.columns) == list(ref.columns):
                import pandas as pd
                neq = (mine.astype(str) != ref.astype(str)).any(axis=1)
                print('  first diffs:')
                print(pd.concat([mine[neq].head(3), ref[neq].head(3)], keys=['mine','ref']))
        else:
            print(f'{name}: OK rows={len(mine)}')
    except Exception as e:
        fails += 1
        print(f'{name}: ERROR {type(e).__name__}: {e}')
print('RESULT:', 'ALL OK' if fails == 0 else f'{fails} FAILURES')
sys.exit(1 if fails else 0)
