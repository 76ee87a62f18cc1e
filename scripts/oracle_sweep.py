#!/usr/bin/env python
"""Replicate the driver's correctness gate: run every registered query
in Spark and its DuckDB oracle side-by-side, compare row counts, column
names, dtypes, and round-6 values.

    python scripts/oracle_sweep.py [sf_dir] [query ...]  # default sf0.01, all

Optional trailing query names restrict the sweep to just those.
Exits non-zero on any mismatch (prints the failing queries)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    os.environ.setdefault("SPARKKG_GOLDEN_SF", os.path.basename(sf.rstrip("/")))

    import duckdb

    import __spark_entry__ as em
    from knowledgeextraction_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = em.queries(), em.oracle_sql()
    bad = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        spdf = qs[name](spark, sf).toPandas()
        if name not in osql:
            # non-SQL-expressible ops: the driver records a rows-only
            # check; their real gate is pytest (see the query docstring)
            print(f"{name:24s} rows-only rows={len(spdf)}")
            continue
        ddf = con.execute(osql[name]).fetchdf()
        cols = sorted(spdf.columns)
        ok = cols == sorted(c.lower() for c in ddf.columns)
        if ok:
            a = spdf[cols].sort_values(cols).reset_index(drop=True).round(6)
            b = ddf[cols].sort_values(cols).reset_index(drop=True).round(6)
            ok = (
                len(a) == len(b)
                and list(a.dtypes.astype(str)) == list(b.dtypes.astype(str))
                and a.equals(b)
            )
        print(f"{name:24s} {'OK' if ok else 'FAIL'} rows={len(spdf)}/{len(ddf)}")
        if not ok:
            bad.append(name)
    n_run = len(only & set(qs)) if only else len(qs)
    print(f"\n{n_run} queries, failed: {bad or 'none'}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
