#!/usr/bin/env python
"""Round-6 optimization instrumentation (bench.py is FROZEN — extra
measurements live here, cited from OPTIMIZATION_r06.md).

Per-stage isolation of the heavy bench rows with the noop sink
(guide §1.4) and labelled jobs (§1.5):

  python bench_extra.py stages   # per-stage walls for dedup/curation/etc.
  python bench_extra.py explain  # .explain('formatted') captures

Reads $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS exactly like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))


def timed_min(fn, reps: int = REPS):
    best, out = None, None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    return best, out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def _session():
    from gensim_spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def stages():
    from pyspark.sql import functions as F

    from gensim_spark.operators import curation as CU
    from gensim_spark.operators import dedup as D
    from gensim_spark.plans import pipeline as P

    spark = _session()
    sc = spark.sparkContext
    res: dict[str, float] = {}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    res["n_docs"] = n_docs

    # --- index build stages ---
    sc.setJobDescription("tokenize only")
    tok = P.tokenize(docs, ascii_fast_path=True)
    t, _ = timed_min(lambda: noop(tok))
    res["tokenize_noop"] = round(t, 3)

    idx = P.build(tok, cache=True)
    idx.weighted.count()

    # --- dedup stages (idx.docs = cached tokenized docs, as in bench) ---
    tokc = idx.docs
    sc.setJobDescription("shingles distinct count")
    t, n_sh = timed_min(lambda: D.shingles(tokc).count())
    res["shingles_distinct_count"] = round(t, 3)
    res["n_shingles"] = n_sh
    sc.setJobDescription("minhash signatures noop")
    t, _ = timed_min(lambda: noop(D.minhash_signatures(tokc, num_hashes=4)))
    res["minhash_signatures_noop"] = round(t, 3)
    sc.setJobDescription("minhash band pairs count")

    def mh():
        sigs = D.minhash_signatures(tokc, num_hashes=4)
        return D.minhash_band_pairs(sigs, bands=2, rows_per_band=2).count()

    t, n_pairs = timed_min(mh)
    res["dedup_minhash_full"] = round(t, 3)
    res["n_pairs"] = n_pairs

    sigs = D.minhash_signatures(tokc, num_hashes=4).cache()
    sigs.count()
    sc.setJobDescription("band pairs from cached sigs")
    t, _ = timed_min(
        lambda: D.minhash_band_pairs(sigs, bands=2, rows_per_band=2).count())
    res["band_pairs_only"] = round(t, 3)

    pairs = D.minhash_band_pairs(sigs, bands=2, rows_per_band=2).cache()
    pairs.count()
    sc.setJobDescription("connected components from cached pairs")
    stats: dict = {}
    t0 = time.perf_counter()
    n = D.connected_components(pairs, stats=stats).count()
    res["cc_only"] = round(time.perf_counter() - t0, 3)
    res["cc_rounds"] = stats.get("rounds")
    sc.setJobDescription("dedup_clusters from cached pairs")
    t, _ = timed_min(
        lambda: D.dedup_clusters(docs.select("doc_id"), pairs).count())
    res["dedup_clusters_only"] = round(t, 3)
    sigs.unpersist()
    pairs.unpersist()

    # --- curation stages (mirror bench 5c) ---
    sc.setJobDescription("pii_scrub agg")
    t, _ = timed_min(lambda: CU.pii_scrub(docs).agg(
        F.count(F.lit(1)), F.sum("n_emails")).collect())
    res["pii_scrub_agg"] = round(t, 3)
    sc.setJobDescription("pii_scrub full noop")
    t, _ = timed_min(lambda: noop(CU.pii_scrub(docs)))
    res["pii_scrub_full_noop"] = round(t, 3)
    sc.setJobDescription("split_assign")
    t, _ = timed_min(lambda: CU.split_assign(docs.select("doc_id")).groupBy(
        "split").count().collect())
    res["split_assign"] = round(t, 3)
    sc.setJobDescription("decontaminate")
    bench_tok = tokc.filter(F.col("doc_id") % 97 == 0)
    t, _ = timed_min(lambda: CU.decontaminate(tokc, bench_tok, n=3).agg(
        F.sum(F.col("contaminated").cast("int"))).collect())
    res["decontaminate"] = round(t, 3)
    sc.setJobDescription("chunk_tokens")
    t, _ = timed_min(
        lambda: CU.chunk_tokens(tokc, size=32, stride=24).count())
    res["chunk_tokens"] = round(t, 3)

    # --- snippet stages ---
    from gensim_spark.operators import highlight as H
    from gensim_spark.operators import topk as T

    snip_q = ["value", "table", "key"]
    sq = {r["token"]: r["term_id"] for r in idx.vocab.filter(
        F.col("token").isin(snip_q)).collect()}
    qdf = T.query_terms_df(spark, {0: [sq[w] for w in snip_q if w in sq]})
    sc.setJobDescription("search only")
    t, _ = timed_min(lambda: T.search(idx.weighted, qdf, k=10).collect())
    res["search_only"] = round(t, 3)
    sc.setJobDescription("snippet_query full")
    t, _ = timed_min(lambda: H.highlight_topk(
        idx.docs, T.search(idx.weighted, qdf, k=10), snip_q,
        width=8).collect())
    res["snippet_full"] = round(t, 3)

    # --- wmd stages ---
    import __spark_entry__ as E
    from gensim_spark.functions import textref
    from gensim_spark.operators import wmd as WM

    rows = idx.docs.select("doc_id", F.explode("tokens").alias("token"))
    sc.setJobDescription("wmd nbow noop")
    doc_nbow = WM.nbow(rows, dim=4)
    t, _ = timed_min(lambda: noop(doc_nbow))
    res["wmd_nbow_noop"] = round(t, 3)
    q_rows = spark.createDataFrame(
        [(qid, tkn) for qid, text in E.QUERY_SET.items()
         for tkn in textref.simple_preprocess(text)],
        "query_id int, token string")
    q_nbow = WM.nbow(q_rows, id_col="query_id", dim=4)
    sc.setJobDescription("wmd rwmd count")
    t, _ = timed_min(lambda: WM.rwmd(doc_nbow, q_nbow, dim=4).count())
    res["wmd_rwmd_full"] = round(t, 3)

    sc.setJobDescription(None)
    print(json.dumps(res))
    spark.stop()


def lsi_lda():
    """Job-level breakdown of lsi_fit / lda_fit."""
    from pyspark.sql import functions as F

    from gensim_spark.operators import lda as LD
    from gensim_spark.operators import lsi as L
    from gensim_spark.plans import pipeline as P

    spark = _session()
    res: dict = {}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tok = P.tokenize(docs, ascii_fast_path=True)
    idx = P.build(tok, cache=True)
    idx.weighted.count()
    postings_d = idx.postings.select(
        "doc_id", "term_id", F.col("tf").cast("double").alias("weight")
    ).cache()
    res["n_postings"] = postings_d.count()
    t, _ = timed_min(lambda: L.lsi_fit(postings_d, num_topics=8,
                                       power_iters=1).u.count())
    res["lsi_fit"] = round(t, 3)
    t, _ = timed_min(lambda: LD.lda_fit(
        idx.postings.select("doc_id", "term_id", "tf"),
        num_topics=8, passes=1, iterations=30, random_seed=13))
    res["lda_fit"] = round(t, 3)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "stages"
    if cmd == "stages":
        stages()
    elif cmd == "lsi_lda":
        lsi_lda()
    else:
        raise SystemExit(f"unknown command {cmd}")


def bm25f_evidence(n_docs: int = 1_000_000):
    """VERDICT r5 item 1 'done' evidence: head-term two-field served BM25F
    at 1M docs — the vectorized fusion (np.unique/bincount over the
    concatenated per-field arrays) vs the per-doc Python dict walk it
    replaced, plus rank identity vs the distributed topk.bm25f_topk."""
    import shutil
    import tempfile

    import numpy as np
    from pyspark.sql import functions as F

    from bench import _synth_weighted, timed
    from gensim_spark.index import layout, serving
    from gensim_spark.operators import topk as T
    from gensim_spark.session import get_spark

    spark = get_spark(f"bm25f_ev_{n_docs}", master=f"local[{CPUS}]",
                      shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"docs": n_docs, "cores": CPUS}
    dirs = {}
    try:
        for fname, nd in (("body", n_docs), ("title", n_docs // 4)):
            w = _synth_weighted(spark, nd, CPUS)
            d = tempfile.mkdtemp(prefix=f"bm25f_ev_{fname}_")
            dirs[fname] = d
            layout.write_packed_shards(w, d, num_groups=4, resume=False)
            # vocab dir with token -> term_id (synth token = 't<id>')
            (w.select("term_id").distinct()
             .select(F.concat(F.lit("t"), F.col("term_id")).alias("token"),
                     "term_id")
             .write.mode("overwrite").parquet(f"{d}/vocab"))
        # head terms: the smallest ids have the highest df under the
        # log-uniform synth law
        toks = ["t1", "t2", "t500"]
        boosts = {"title": 2.0, "body": 1.0}
        servers = {f: serving.PackedIndexServer(d, preload=True)
                   for f, d in dirs.items()}
        serving.bm25f_topk_served(dirs, toks, boosts, k=10,
                                  servers=servers)  # warm (decode cached)
        t_min = None
        for _ in range(5):
            t, rows = timed(lambda: serving.bm25f_topk_served(
                dirs, toks, boosts, k=10, servers=servers))
            t_min = t if t_min is None else min(t_min, t)
        out["served_warm_ms"] = round(1000 * t_min, 2)
        out["hits"] = len(rows)
        # identity vs the distributed fusion over the same stored weights
        fq = {}
        for fname, d in dirs.items():
            vt = spark.read.parquet(f"{d}/vocab").filter(
                F.col("token").isin(toks))
            ids = [r["term_id"] for r in vt.collect()]
            fq[fname] = T.query_terms_df(spark, {0: sorted(ids)})
        # distributed comparison over the same f32-stored weights (the
        # synth frames are deterministic, so regenerating them reproduces
        # exactly what was packed; f32 cast mirrors the store encoding)
        fw = {
            "body": _synth_weighted(spark, n_docs, CPUS),
            "title": _synth_weighted(spark, n_docs // 4, CPUS),
        }
        fw = {f: w.withColumn(
            "weight", F.col("weight").cast("float").cast("double"))
            for f, w in fw.items()}
        want = T.bm25f_topk(fw, fq, boosts, k=10).collect()
        got = [(doc, round(s, 6), rk) for doc, s, rk in rows]
        wanted = [(r["doc_id"], round(r["score"], 6), r["rank"])
                  for r in want]
        out["identity"] = got == wanted
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)
        spark.stop()
    return out
