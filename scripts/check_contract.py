"""Driver-mimic contract check: run every queries() entry on Spark at
a given SF dir and compare against oracle_sql() in DuckDB — row count,
sorted column names, and cell-exact values after sorting columns by
name and rows by all columns. Stricter than the driver's value hash.

Usage: python scripts/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def normalize(df):
    """pandas DataFrame → (n_rows, sorted cols, canonical rows)."""
    import pandas as pd

    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{v:.6f}")
            else:
                row.append(str(v))
        rows.append("|".join(row))
    rows.sort()
    return len(rows), list(df.columns), rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from pdf_parser_spark.session import get_spark

    spark = get_spark("contract-check")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS "
                f"SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            if len(sdf) == 0 and not name.startswith("ex"):
                print(f"WARN {name}: 0 rows — weak check")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            continue
        sn, sc, sr = normalize(sdf)
        on, oc, orows = normalize(odf)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}")
            failed.append(name)
        elif sn != on:
            print(f"FAIL {name}: rows {sn} vs {on}")
            failed.append(name)
        elif sr != orows:
            bad = [(a, b) for a, b in zip(sr, orows) if a != b][:3]
            print(f"FAIL {name}: value diff, first: {bad}")
            failed.append(name)
        else:
            spark_types = dict(fn(spark, sf_dir).dtypes)
            print(f"ok   {name}: {sn} rows match "
                  f"({ {c: spark_types.get(c) for c in sc} })")
            if sn == 0:
                print(f"WARN {name}: 0 rows — weak check")
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
