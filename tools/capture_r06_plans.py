#!/usr/bin/env python
"""Capture .explain('formatted') for every query path touched in round 6.

Usage: python tools/capture_r06_plans.py <out_dir> <suffix>
  e.g.  python tools/capture_r06_plans.py plans/r06 after
Run once from the round-start tree (suffix 'before', via a git worktree)
and once from the optimized tree (suffix 'after'). Uses sf0.01 — plan
shapes, not data volume, are what the files document.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

OUT = sys.argv[1] if len(sys.argv) > 1 else "plans/r06"
SUF = sys.argv[2] if len(sys.argv) > 2 else "after"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    from pyspark.sql import functions as F

    from gensim_spark.operators import curation as CU
    from gensim_spark.operators import dedup as D
    from gensim_spark.operators import highlight as H
    from gensim_spark.operators import tfidf as TF
    from gensim_spark.operators import topk as T
    from gensim_spark.operators import wmd as WM
    from gensim_spark.plans import pipeline as P
    from gensim_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plans_r06", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tok = P.tokenize(docs, ascii_fast_path=True)
    idx = P.build(tok, cache=True)
    idx.weighted.count()

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")

    def cap(name, df):
        with open(os.path.join(OUT, f"{name}_{SUF}.txt"), "w") as f:
            f.write(df._jdf.queryExecution().explainString(mode))
        print("captured", name)

    sigs = D.minhash_signatures(idx.docs, num_hashes=4)
    cap("minhash_signatures", sigs)
    cap("dedup_minhash_pairs",
        D.minhash_band_pairs(sigs, bands=2, rows_per_band=2))
    bench_tok = idx.docs.filter(F.col("doc_id") % 97 == 0)
    cap("decontaminate", CU.decontaminate(idx.docs, bench_tok, n=3))
    cap("pii_scrub", CU.pii_scrub(docs))
    cap("chunk_tokens", CU.chunk_tokens(idx.docs, size=32, stride=24))
    sq = {r["token"]: r["term_id"] for r in idx.vocab.filter(
        F.col("token").isin(["value", "table", "key"])).collect()}
    qdf = T.query_terms_df(spark, {0: sorted(sq.values())})
    cap("bm25_search", T.search(idx.weighted, qdf, k=10))
    cap("snippet_query", H.highlight_topk(
        idx.docs, T.search(idx.weighted, qdf, k=10),
        ["value", "table", "key"], width=8))
    cap("tfidf_nfc", TF.tfidf_postings(
        idx.postings, idx.vocab.select("term_id", "df"), idx.num_docs,
        smartirs="nfc"))
    rows = idx.docs.select("doc_id", F.explode("tokens").alias("token"))
    doc_nbow = WM.nbow(rows, dim=4)
    import __spark_entry__ as E
    from gensim_spark.functions import textref
    q_rows = spark.createDataFrame(
        [(qid, tkn) for qid, text in E.QUERY_SET.items()
         for tkn in textref.simple_preprocess(text)],
        "query_id int, token string")
    q_nbow = WM.nbow(q_rows, id_col="query_id", dim=4)
    cap("wmd_rwmd", WM.rwmd(doc_nbow, q_nbow, dim=4))
    from gensim_spark.operators import positional as PX
    cap("positional_build", PX.positional_postings(idx.docs, idx.vocab))
    spark.stop()


if __name__ == "__main__":
    main()
