"""Generate EXPLAIN.md: physical-plan evidence for the scale-design claims
(pushdown, pruning, broadcast joins, codegen spans, exchange counts)."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def summarize(plan: str) -> str:
    spans = len(set(re.findall(r"\*\((\d+)\)", plan)))
    return (f"exchanges={plan.count('Exchange ')} "
            f"broadcasts={plan.count('BroadcastExchange')} "
            f"codegen_spans={spans}")


def interesting(plan: str, keys=("Exchange", "Scan parquet", "PushedFilters",
                                "PartitionFilters", "BroadcastHashJoin")):
    out = []
    for line in plan.splitlines():
        s = line.strip(" :+-")
        if any(k in s for k in keys):
            out.append("    " + s[:160])
    return "\n".join(dict.fromkeys(out))


def main() -> None:
    from pyspark.sql import functions as F

    from gensim_spark.index import layout
    from gensim_spark.operators import topk as T
    from gensim_spark.plans import pipeline as P
    from gensim_spark.session import get_spark

    spark = get_spark("explain", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    sections = []

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = P.tokenize(docs, ascii_fast_path=True)
    idx = P.build(tok)  # cached: the persisted-index plan shape
    p = idx.weighted._jdf.queryExecution().executedPlan().toString()
    sections.append(("Index build — weighted postings (counts cached)",
                     summarize(p), interesting(p)))

    layout.write_postings_bucketed(idx.weighted, "/tmp/explain_buckets",
                                   n_buckets=8)
    pruned = layout.read_postings_bucketed(
        spark, "/tmp/explain_buckets", term_ids=[3, 11], n_buckets=8)
    p = pruned._jdf.queryExecution().executedPlan().toString()
    sections.append(("Query scan over the term-bucketed store (terms 3, 11)",
                     summarize(p), interesting(p)))

    q = T.query_terms_df(spark, {0: [3, 11]})
    s = T.search(pruned.select("doc_id", "term_id", "weight"), q, k=10)
    p = s._jdf.queryExecution().executedPlan().toString()
    sections.append(("BM25 top-k over the pruned scan", summarize(p),
                     interesting(p)))

    import shutil
    import tempfile

    shard_dir = tempfile.mkdtemp(prefix="explain_shards_")
    shutil.rmtree(shard_dir, ignore_errors=True)
    layout.write_packed_shards(idx.weighted, shard_dir,
                               docs_per_shard=256, num_groups=2,
                               resume=False)
    packed = layout.read_packed_shards(spark, shard_dir).filter(
        F.col("term_id").isin([3, 11]))
    p = packed._jdf.queryExecution().executedPlan().toString()
    sections.append(("Packed-shard scan pruned to query terms (WAND input)",
                     summarize(p), interesting(p)))

    # Iceberg-semantics store: manifest-level scan planning prunes files
    # BEFORE Spark opens anything — evidence is the planned-file count.
    ice_dir = tempfile.mkdtemp(prefix="explain_ice_") + "/postings"
    layout.write_postings_bucketed_iceberg(idx.weighted, ice_dir, n_buckets=8)
    from gensim_spark.index.icetable import IceTable

    table = IceTable.load(ice_dir)
    all_files = table.plan_files()
    pruned_ice = layout.read_postings_bucketed_iceberg(
        spark, ice_dir, term_ids=[3, 11])
    n_b = 8
    buckets = {3 % n_b, 11 % n_b}
    pruned_files = table.plan_files(
        partition_pred=lambda part: part.get("bucket") in buckets)
    p = pruned_ice._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "Iceberg-store scan for terms 3, 11 — manifest pruning",
        f"files_planned={len(pruned_files)}/{len(all_files)} "
        f"(partition pruning + term_id min/max bounds, pre-open) "
        + summarize(p),
        interesting(p)))

    # Head-term salting: the query's pruned scan fans out over salt files
    # instead of reading one df-sized file (1M-doc numbers: BASELINE.md)
    import bench as B

    salt_dir = tempfile.mkdtemp(prefix="explain_salt_")
    shutil.rmtree(salt_dir, ignore_errors=True)
    skewed = B._synth_weighted(spark, 50_000, 4).cache()
    dfs = skewed.groupBy("term_id").agg(F.count("*").alias("df"))
    head = dfs.orderBy(F.col("df").desc()).first()
    layout.write_postings_bucketed(skewed, salt_dir, n_buckets=4,
                                   salt_threshold=int(head["df"]) // 2,
                                   dfs=dfs, salts=4)
    pruned_salt = layout.read_postings_bucketed(
        spark, salt_dir, term_ids=[int(head["term_id"])], n_buckets=4)
    per_file = (pruned_salt.groupBy(F.input_file_name().alias("f"))
                .agg(F.count("*").alias("rows"))
                .agg(F.count("*").alias("files"),
                     F.max("rows").alias("mx")).collect()[0])
    p = pruned_salt._jdf.queryExecution().executedPlan().toString()
    sections.append((
        f"Head-term query scan on the SALTED store (term {head['term_id']}, "
        f"df={head['df']})",
        f"files_scanned={per_file['files']} max_file_rows={per_file['mx']} "
        f"(df-sized single file avoided; 1M-doc evidence: BASELINE.md — "
        f"salted 14 files/123k max vs unsalted 1 file/981k, query 1.6x "
        f"faster) " + summarize(p),
        interesting(p)))

    # WAND pruning evidence at this corpus size (accumulator counts)
    from gensim_spark.index import wand

    stats = {}
    wand.wand_topk(spark, shard_dir, {0: {3: 1.0, 11: 1.0}}, k=10,
                   stats_out=stats).collect()
    sections.append((
        "Block-max WAND pruning counters (terms 3, 11, k=10)",
        f"postings_in_query_runs={stats['postings'].value} "
        f"evaluated={stats['evaluated'].value} "
        f"(1M/4M-doc evidence: BASELINE.md — 98.3% skipped at both sizes, "
        f"1.46x/1.78x vs join-agg, ~12% of varint blocks decoded)",
        "    see gensim_spark/index/wand.py — ordered-segment traversal"))

    # RWMD (WMD lower bound): broadcast the ~|q|-token query against doc
    # tokens — per-row codegen arithmetic, partial-agg'd before the single
    # (query_id, doc_id)-keyed exchange; the exact-WMD LP only ever sees
    # the k + ε-band candidates this bound admits.
    from gensim_spark.operators import wmd as WM

    rows = tok.select("doc_id", F.explode("tokens").alias("token"))
    doc_nbow = WM.nbow(rows, dim=4)
    q_rows = spark.createDataFrame(
        [(0, t) for t in ["spark", "query", "join"]],
        "query_id int, token string")
    q_nbow = WM.nbow(q_rows, id_col="query_id", dim=4)
    r = WM.rwmd(doc_nbow, q_nbow, dim=4)
    p = r._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "RWMD (WMD lower bound) — query compiled into ONE hash-agg pass "
        "(no join, no window; exchanges = doc tf-agg + nbow)",
        summarize(p), interesting(p)))

    # LSI projection merge (online add_documents): the rotated basis is ONE
    # whole-stage-codegen projection over the cached full-outer term join —
    # Q is never materialized; the Grams feeding the rotation are
    # topics²-sized partial folds.
    from gensim_spark.operators import lsi as L

    postings_d = idx.postings.select(
        "doc_id", "term_id", F.col("tf").cast("double").alias("weight"))
    pa = L.lsi_fit(postings_d.filter("doc_id % 2 = 0"), num_topics=3,
                   extra_dims=2, power_iters=1)
    pb = L.lsi_fit(postings_d.filter("doc_id % 2 = 1"), num_topics=3,
                   extra_dims=2, power_iters=1)
    merged = L.merge_projections(pa, pb, checkpoint=False)
    p = merged.u._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "LSI projection merge (add_documents) — basis rotation as one "
        "codegen projection over the term join",
        summarize(p), interesting(p)))

    # Vocabulary-wide termsim build: the LSH bucket SELF-join must shuffle
    # both sides on the bucket key and broadcast NOTHING corpus-sized — the
    # query side IS the corpus, so a broadcast would ship the whole
    # vocabulary to every executor (the defect this plan proves absent).
    from gensim_spark.operators.simsearch import lsh_self_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # disable size-based broadcasts so the captured plan is the AT-SCALE
    # shape (at sf0.001 AQE would broadcast the 500-row table anyway); the
    # only broadcast that survives is the explicit bucket-size guard,
    # which is bucket-count-sized, never vocabulary-sized
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    nb = lsh_self_topk(emb, k=4, planes=4, dims=64)
    p = nb._jdf.queryExecution().executedPlan().toString()
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    sections.append((
        "Termsim LSH bucket SELF-join (lsh_self_topk) — no vocabulary "
        "broadcast (size-based broadcasts disabled to show the at-scale "
        "shape; the one surviving BroadcastExchange is the explicit "
        "bucket-count-sized size-guard): candidates shuffle-equijoin on "
        "the bucket key",
        summarize(p), interesting(p)))

    # Curation pass: PII scrub + split assignment are pure projections
    # (exchanges must be 0 — they run at scan speed); decontamination's
    # benchmark gram set is explicitly broadcast, so the corpus side never
    # shuffles for the probe.
    from gensim_spark.operators import curation as CU

    scrubbed = CU.pii_scrub(docs)
    splits = CU.split_assign(docs.select("doc_id"))
    p = scrubbed._jdf.queryExecution().executedPlan().toString()
    p2 = splits._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "Curation projections — pii_scrub / split_assign (zero exchanges: "
        "regexp + md5 column exprs at scan speed)",
        summarize(p) + " | " + summarize(p2), interesting(p)))

    bench_tok = tok.filter(F.col("doc_id") % 97 == 0)
    dec = CU.decontaminate(tok, bench_tok, n=3)
    p = dec._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "Decontamination — benchmark gram set broadcast (corpus grams "
        "probe a hash map; no corpus-sized shuffle before the per-doc "
        "hit count)",
        summarize(p), interesting(p)))

    from gensim_spark.operators import bpe as BP

    pc = BP.pair_counts(BP.word_histogram(tok))
    p = pc._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "BPE pair counts — histogram shuffle (map-side combined) + "
        "zero-shuffle char/pair explode + one vocab-sized hash-agg",
        summarize(p), interesting(p)))

    enc = None
    bpe_model = BP.bpe_train(BP.word_histogram(tok), 40)
    enc = bpe_model.encode(tok)
    p = enc._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "BPE encode — one Arrow-batched projection over broadcast ranks "
        "(zero exchanges; the corpus-sized stage is embarrassingly "
        "parallel)",
        summarize(p), interesting(p)))

    from gensim_spark.operators import positional as PX

    pos = PX.positional_postings(tok, idx.vocab)
    head2 = [r["term_id"] for r in idx.vocab.orderBy(
        idx.vocab.df.desc()).limit(2).collect()]
    p = (PX.phrase_occurrences(pos, head2)
         ._jdf.queryExecution().executedPlan().toString())
    sections.append((
        "Exact-phrase match over positional postings — per-term legs with "
        "the term filter pushed BELOW each leg's groupBy (each leg "
        "shuffles only its term's rows), adjacency as a JVM "
        "array_intersect fold (no Python UDF)",
        summarize(p), interesting(p)))

    head3 = [r["term_id"] for r in idx.vocab.orderBy(
        idx.vocab.df.desc()).limit(3).collect()]
    p = (PX.span_near_occurrences(pos, head3, slop=2, ordered=True)
         ._jdf.queryExecution().executedPlan().toString())
    sections.append((
        "N-clause SpanNear (sloppy phrase \"a b c\"~2) — one term-pruned "
        "leg per clause joined on doc_id, the greedy strictly-increasing "
        "chain as nested JVM filter/array_min folds per anchor (no Python "
        "UDF, no shuffle beyond the intersection-sized joins)",
        summarize(p), interesting(p)))

    p = (PX.span_not_occurrences(pos, [head3[0], head3[1:3]], head3[2],
                                 slop=2, pre=1, post=1)
         ._jdf.queryExecution().executedPlan().toString())
    sections.append((
        "SpanNot (include span minus excluded-term windows) — the same "
        "chain legs plus ONE LEFT-joined exclusion leg and a JVM exists "
        "probe per anchor over [start − pre, end + post] (docs without "
        "the excluded term keep all spans via the left join)",
        summarize(p), interesting(p)))

    from gensim_spark.plans import pipeline as PL

    title_idx = PL.build(tok.select(
        "doc_id", F.slice("tokens", 1, 8).alias("tokens")))
    fq = {n: T.query_terms_df(spark, {0: head2})
          for n in ("title", "body")}
    p = (T.bm25f_topk({"title": title_idx.weighted, "body": idx.weighted},
                      fq, {"title": 2.0, "body": 1.0}, k=10)
         ._jdf.queryExecution().executedPlan().toString())
    sections.append((
        "BM25F multi-field top-k — one broadcast-query score leg per "
        "field (map-side partial agg), boost as a projection, union + ONE "
        "(query,doc) hash agg before the rank window (the union is "
        "intersection-sized, never corpus-sized)",
        summarize(p), interesting(p)))

    from gensim_spark.operators import audiovideo as AV

    media = AV.make_mixed_media(spark, n_images=8, n_audio=8, n_video=4)
    p = (AV.extract_media_features(media)
         ._jdf.queryExecution().executedPlan().toString())
    sections.append((
        "Media feature extraction — REAL PNG/WAV/Y4M decode in ONE "
        "Arrow-batched mapInPandas stage (zero exchanges; scales purely "
        "with executors, bounded by arrow.maxRecordsPerBatch)",
        summarize(p), interesting(p)))

    p = (AV.sample_video_frames(media, every_ms=300)
         ._jdf.queryExecution().executedPlan().toString())
    sections.append((
        "Video frame sampling — kind filter + one mapInPandas stage that "
        "seek-decodes ONLY the sampled frames (Y4M fixed frame stride; "
        "zero exchanges)",
        summarize(p), interesting(p)))

    import shutil
    import tempfile

    from gensim_spark.index.icetable import IceTable

    ice_loc = tempfile.mkdtemp(prefix="explain_ice_del_")
    shutil.rmtree(ice_loc, ignore_errors=True)
    layout.write_postings_bucketed_iceberg(idx.weighted, ice_loc,
                                           n_buckets=8)
    layout.delete_docs_iceberg(spark, ice_loc, [1, 2, 3])
    mor = IceTable.load(ice_loc).scan(spark)
    p = mor._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "Merge-on-read scan after delete_docs_iceberg — data legs + ONE "
        "broadcast anti-join against the takedown-sized delete file "
        "(sequence-ordered; folds to a plain scan after compaction)",
        summarize(p), interesting(p)))
    shutil.rmtree(ice_loc, ignore_errors=True)

    from gensim_spark.operators import highlight as HL
    from gensim_spark.operators import topk as T

    snip_q = [r["token"] for r in idx.vocab.orderBy(
        idx.vocab.df.desc()).limit(3).collect()]
    p = (HL.best_snippets(tok, snip_q, width=8, mark=True)
         ._jdf.queryExecution().executedPlan().toString())
    sections.append((
        "Snippet extraction / highlighting — hit-anchored best-window "
        "argmax as ONE zero-exchange JVM array-fold projection per row "
        "(indexed transform + filter + struct-ordered array_max; no "
        "explode, no Python)",
        summarize(p), interesting(p)))

    # deployed rewrite shape (query_index.run_expanded): LIKE expansion
    # over the STORED vocab (vocab-sized scan, ≤max_expansions ids
    # collected — Lucene materializes rewritten queries the same way),
    # then the ordinary pruned-store top-k over the expansion
    vocab_dir = tempfile.mkdtemp(prefix="explain_vocab_") + "/vocab"
    idx.vocab.write.mode("overwrite").parquet(vocab_dir)
    vstored = spark.read.parquet(vocab_dir)
    like = T.wildcard_pattern_to_like("s?a*")
    exp = vstored.filter(vstored.token.like(like)).select("term_id")
    p_exp = exp._jdf.queryExecution().executedPlan().toString()
    exp_ids = [int(r["term_id"]) for r in exp.collect()]
    pruned_wc = layout.read_postings_bucketed(
        spark, "/tmp/explain_buckets", term_ids=exp_ids, n_buckets=8)
    qwc = T.query_terms_df(spark, {0: exp_ids})
    p = (T.search(pruned_wc.select("doc_id", "term_id", "weight"), qwc, k=10)
         ._jdf.queryExecution().executedPlan().toString())
    sections.append((
        "Wildcard/fuzzy rewrite, deployed shape — (a) LIKE expansion = one "
        "vocab-sized parquet scan (collect capped by max_expansions), "
        "(b) the expansion runs as a plain disjunction over the "
        "term-pruned bucketed store",
        f"expansion: {summarize(p_exp)} | scoring: {summarize(p)}",
        interesting(p_exp) + "\n" + interesting(p)))

    with open("EXPLAIN.md", "w") as f:
        f.write("# Physical-plan evidence\n\n")
        f.write("Generated by `python tools/explain_plans.py` — the plans "
                "backing the scale-design claims in README.md.\n")
        for title, summary, lines in sections:
            f.write(f"\n## {title}\n\n`{summary}`\n\n```\n{lines}\n```\n")
    print("wrote EXPLAIN.md")
    spark.stop()


if __name__ == "__main__":
    main()
