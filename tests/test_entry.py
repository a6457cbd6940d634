"""Driver-contract regression: a fast subset of queries() checked against
their DuckDB oracles at sf0.001 (the full 26-query sweep lives in
tools/check_oracles.py and runs in the driver's own gate at sf0.01)."""

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
SUBSET = ["vocab", "doc2bow", "bm25_okapi", "bm25_topk", "dedup_exact",
          "minhash_signatures", "simhash", "quality_stats", "knn_cosine",
          "events_hourly"]


def norm_cell(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6g}"
    return str(v)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as E

    sdf = E.queries()[name](spark, SF_DIR)
    cols = sorted(sdf.columns)
    spark_rows = sorted(
        tuple(norm_cell(r[c]) for c in cols) for r in sdf.collect()
    )
    odf = duck.execute(E.oracle_sql()[name]).fetch_df()
    assert sorted(odf.columns) == cols
    oracle_rows = sorted(
        tuple(norm_cell(v) for v in row)
        for row in odf[cols].itertuples(index=False, name=None)
    )
    assert len(spark_rows) == len(oracle_rows)
    assert spark_rows == oracle_rows


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"query_id", "doc_id", "score", "rank"}
