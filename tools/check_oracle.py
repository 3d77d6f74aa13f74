"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf dir, compare
row-count + column names + order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as E
from auto_archiver_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    pdf = df_pandas[cols]
    rows = []
    for tup in pdf.itertuples(index=False):
        rows.append(
            "|".join(
                ("%.6g" % v) if isinstance(v, float) else str(v) for v in tup
            )
        )
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16], len(rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, oracles = E.queries(), E.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"{name:24s} SPARK ERROR: {str(ex)[:160]}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows, cols {sorted(sdf.columns)}")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"{name:24s} ORACLE ERROR: {str(ex)[:160]}")
            fails.append(name)
            continue
        sh, sn = normalize(sdf)
        oh, on = normalize(odf)
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        status = "OK" if (sh == oh and sn == on and cols_ok) else "MISMATCH"
        print(f"{name:24s} {status}  spark={sn}/{sh} duck={on}/{oh} cols_ok={cols_ok}")
        if status != "OK":
            fails.append(name)
            if sn and on:
                sc, oc = sorted(sdf.columns), sorted(odf.columns)
                print("   spark cols:", sc, "\n   duck cols :", oc)
                print("   spark head:", sdf[sc].sort_values(sc).head(3).to_dict("records"))
                print("   duck head :", odf[oc].sort_values(oc).head(3).to_dict("records"))
    print("\nFAILURES:", fails if fails else "none")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
