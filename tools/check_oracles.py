"""Local harness mimicking the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the same
parquet tables, compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def row_key(row, cols):
    return tuple(norm_cell(row[c]) for c in sorted(cols))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from gensim_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    # Artifact-backed oracles (trained models persisted as parquet) embed
    # the driver's sf0.01 artifact path — oracle_sql() takes no sf
    # parameter, so those SQL strings are only meaningful at sf0.01. At any
    # other sf the Spark side trains on different data than the artifact
    # the oracle reads; skip instead of reporting a phantom FAIL.
    import os as _os

    sf_base = _os.path.basename(sf_dir.rstrip("/"))
    art_keyed = sf_base != E._ORACLE_SF

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if art_keyed and name in oracles and E._ART_DIR in oracles[name]:
            print(f"SKIP {name}: artifact oracle is keyed to "
                  f"{E._ORACLE_SF} (running at {sf_base})")
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sdf.columns
        except Exception as exc:
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"FAIL {name}: spark error {str(exc)[:300]}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_rows)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).fetch_df()
        except Exception as exc:
            failures.append((name, f"ORACLE ERROR: {exc}"))
            print(f"FAIL {name}: oracle error {str(exc)[:300]}")
            continue
        ocols = list(odf.columns)
        if sorted(spark_cols) != sorted(ocols):
            failures.append((name, f"cols {spark_cols} vs {ocols}"))
            print(f"FAIL {name}: cols {sorted(spark_cols)} vs {sorted(ocols)}")
            continue
        if len(spark_rows) != len(odf):
            failures.append((name, f"rows {len(spark_rows)} vs {len(odf)}"))
            print(f"FAIL {name}: rows {len(spark_rows)} vs {len(odf)}")
            continue
        skeys = sorted(row_key(r, spark_cols) for r in spark_rows)
        okeys = sorted(
            tuple(norm_cell(v) for v in row)
            for row in odf[sorted(ocols)].itertuples(index=False, name=None)
        )
        if skeys != okeys:
            bad = next(
                (i for i, (a, b) in enumerate(zip(skeys, okeys)) if a != b), -1
            )
            failures.append((name, f"values differ at sorted idx {bad}"))
            print(f"FAIL {name}: values differ; first diff at {bad}:")
            print("  spark :", skeys[bad] if bad >= 0 else "-")
            print("  oracle:", okeys[bad] if bad >= 0 else "-")
            continue
        print(f"OK   {name}: {len(spark_rows)} rows")

    print(f"\n{len(failures)} failures" if failures else "\nALL MATCH")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
