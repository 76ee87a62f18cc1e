"""Replicates the driver's correctness gate locally at sf0.001:

run every queries() entry in Spark and its oracle_sql() in DuckDB on
the same parquet tables; compare row count, column names, and an
order-insensitive value multiset.
"""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARKKG_TEST_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


@pytest.fixture(scope="module")
def duck():
    con = _duck(SF_DIR)
    yield con
    con.close()


def _all_names():
    import __spark_entry__ as entrymod

    return sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    sdf = q(spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rows {len(s_rows)} vs {len(d_rows)}"
    sm = _multiset(s_rows, s_cols)
    dm = _multiset(d_rows, d_cols)
    if sm != dm:
        only_s = [k for k in sm if sm[k] != dm.get(k, 0)][:3]
        only_d = [k for k in dm if dm[k] != sm.get(k, 0)][:3]
        raise AssertionError(f"{name}: value mismatch; spark-only={only_s} duck-only={only_d}")


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"subj_id", "predicate", "obj_id", "url", "rec_id"}


def test_rows_only_queries_run(spark):
    """Model-based stages: deterministic and non-degenerate."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    mentions = qs["kg_mentions"](spark, SF_DIR)
    n1 = mentions.count()
    n2 = qs["kg_mentions"](spark, SF_DIR).count()
    assert n1 == n2 and n1 > 0
    assert qs["kg_linked"](spark, SF_DIR).count() > 0
