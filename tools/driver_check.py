"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, schema (column names sorted), and an
order-insensitive value hash.  Usage:

    python tools/driver_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd


def norm_cell(x):
    if isinstance(x, float):
        # canonical float text; -0.0 -> 0.0
        if x == 0.0:
            x = 0.0
        return repr(round(x, 6))
    return repr(x)


def table_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        "|".join(norm_cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # the parquet-footer oracle embeds the staged path for the sf tier
    # it runs at; point it at the one this run actually uses
    import os

    os.environ["GEMMSQL_ORACLE_SF_DIR"] = sf_dir

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from gemmsql import get_spark

    spark = get_spark("driver_check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(
                f"rows-only  {name}: {len(sdf)} rows, cols={sorted(sdf.columns)}"
                f" ({t_spark:.1f}s)"
            )
            continue
        t0 = time.time()
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        t_oracle = time.time() - t0
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(sdf.columns) == sorted(odf.columns)
        hs, ho = table_hash(sdf), table_hash(odf)
        ok_hash = hs == ho
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{status}  {name}: rows {len(sdf)}/{len(odf)} schema={ok_schema}"
            f" hash={ok_hash} (spark {t_spark:.1f}s, duckdb {t_oracle:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_schema and ok_rows:
                m = sdf.sort_values(sorted(sdf.columns)).reset_index(drop=True)
                o = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
                m = m[sorted(m.columns)]
                diff = (m != o)
                print("  first diffs:\n", m[diff.any(axis=1)].head(3))
                print("  oracle:\n", o[diff.any(axis=1)].head(3))
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries OK")


if __name__ == "__main__":
    main()
