"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at sf0.01, compare row
count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py [sf_dir] --window   # first-50 gate
"""

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, '.')
import __spark_entry__ as entry  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
ONLY = set(sys.argv[2:])
if '--window' in ONLY:
    # exactly what the driver's correctness gate runs: the first 50
    # registry entries (the rotation window)
    ONLY = set(list(entry.queries())[:50])


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype('datetime64[us]')
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype('float64')
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype('int64')
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    from erde_spark.session import get_spark
    spark = get_spark()
    con = duckdb.connect()
    for t in ('region nation customer supplier part orders lineitem '
              'events documents embeddings').split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            got = fn(spark, SF).toPandas()
        except Exception as e:
            failures.append(name)
            print(f'{name:28s} SPARK-ERROR {type(e).__name__}: {str(e)[:200]}')
            continue
        if name not in oracles:
            print(f'{name:28s} rows={len(got):7d} (rows-only, no oracle)')
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f'{name:28s} ORACLE-ERROR {type(e).__name__}: {str(e)[:200]}')
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            failures.append(name)
            print(f'{name:28s} SCHEMA-MISMATCH spark={list(g.columns)} duck={list(e.columns)}')
            continue
        if len(g) != len(e):
            failures.append(name)
            print(f'{name:28s} ROWCOUNT spark={len(g)} duck={len(e)}')
            continue
        bad = []
        for c in g.columns:
            a, b = g[c].values, e[c].values
            if pd.api.types.is_float_dtype(g[c]):
                an, bn = pd.isna(a), pd.isna(b)
                eq = (an & bn) | (~an & ~bn & (a == b))
            else:
                eq = pd.Series(a).fillna('\0').values == pd.Series(b).fillna('\0').values
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append((c, i, a[i], b[i]))
        if bad:
            failures.append(name)
            print(f'{name:28s} VALUE-MISMATCH {bad[:3]}')
        else:
            print(f'{name:28s} OK rows={len(g)}')
    print()
    print('FAILURES:', failures if failures else 'none')
    return 1 if failures else 0


if __name__ == '__main__':
    sys.exit(main())
