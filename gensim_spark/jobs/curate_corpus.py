#!/usr/bin/env python
"""Corpus-curation job: pages parquet → curated training-data parquet.

The hygiene pipeline a Common-Crawl-style corpus goes through between
extraction and tokenizer/training, as one spark-submit job:

  quality + repetition filters → PII scrub → exact dedup → near-dup dedup
  (MinHash-LSH → connected components, keep cluster minimum) → benchmark
  decontamination → deterministic train/val/test split → optional
  context-window chunking → parquet partitioned by split.

Scale/resume shape (the north-rule contract, same as build_index):

* Global *decision* stages (dedup keep/drop, contamination flags) are
  doc_id-keyed tables computed once and persisted under
  ``<output>/_stages/`` — each is resumable by artifact (a committed
  ``_SUCCESS`` marker skips the stage on re-run). Decisions must be
  global — a per-group dedup would miss cross-group duplicates.
* The *apply* stage (filter + scrub + split + chunk + write) is
  embarrassingly parallel per doc, so it runs in ``--num-groups``
  hash-of-doc_id groups; each group appends to a JSON ledger after its
  parquet commit, and ``--resume`` skips committed groups. A crashed
  10^12-doc curate resumes from the ledger, not from byte zero.
* Per-stage drop counts land in ``curate_metrics.json`` — the lineage
  record of what the pipeline removed and why.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def _stage_path(output: str, name: str) -> str:
    return f"{output}/_stages/{name}"


def _stage_done(output: str, name: str) -> bool:
    return os.path.exists(f"{_stage_path(output, name)}/_SUCCESS")


def run(spark, input_path: str, output: str, benchmark: str | None = None,
        min_quality: float = 0.5, max_dup_line_frac: float = 0.5,
        near_dup: bool = True, decontaminate_n: int = 13,
        hashed_decontaminate: bool = False,
        chunk_size: int = 0, chunk_stride: int | None = None,
        bpe_merges: int = 0, bpe_min_count: int = 1,
        num_groups: int = 8, resume: bool = True,
        fractions=(("train", 0.90), ("val", 0.05), ("test", 0.05))) -> dict:
    """Job body; returns curation metrics. Importable so tests drive it on
    the shared session without a subprocess."""
    from pyspark.sql import functions as F

    from gensim_spark.operators import curation as CU
    from gensim_spark.operators import dedup as D
    from gensim_spark.operators import textstats as TS
    from gensim_spark.plans import pipeline as P

    t0 = time.perf_counter()
    pages = spark.read.parquet(input_path)
    if "doc_id" not in pages.columns:
        pages = pages.withColumn("doc_id", F.monotonically_increasing_id())
    docs = pages.select("doc_id", "text")
    tok = P.tokenize(docs).cache()
    n_input = tok.count()

    # ---- global decision stages (resumable by artifact) ----------------
    # exact dedup: md5 fingerprint, keep the minimum doc_id per group
    if not (resume and _stage_done(output, "exact_keep")):
        fp = TS.fingerprint(tok)
        keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        keep.select("doc_id").write.mode("overwrite").parquet(
            _stage_path(output, "exact_keep"))
    exact_keep = spark.read.parquet(_stage_path(output, "exact_keep"))

    if near_dup and not (resume and _stage_done(output, "near_keep")):
        sigs = D.minhash_signatures(tok, num_hashes=8, shingle_n=3)
        pairs = D.minhash_band_pairs(sigs, bands=4, rows_per_band=2)
        clusters = D.dedup_clusters(tok.select("doc_id"), pairs)
        clusters.filter(F.col("keep")).select("doc_id").write.mode(
            "overwrite").parquet(_stage_path(output, "near_keep"))
    near_keep = (spark.read.parquet(_stage_path(output, "near_keep"))
                 if near_dup else None)

    if benchmark and not (resume and _stage_done(output, "contaminated")):
        bench_tok = P.tokenize(
            spark.read.parquet(benchmark).select(
                F.col("doc_id"), F.col("text")))
        flags = CU.decontaminate(tok, bench_tok, n=decontaminate_n,
                                 hashed=hashed_decontaminate)
        flags.filter(F.col("contaminated")).select("doc_id").write.mode(
            "overwrite").parquet(_stage_path(output, "contaminated"))
    contaminated = (spark.read.parquet(_stage_path(output, "contaminated"))
                    if benchmark else None)

    # ---- per-doc quality mask (pure projections — recomputed per group,
    # cheaper than persisting corpus-sized intermediates) -----------------
    quality = TS.quality_stats(docs.join(tok, "doc_id"))
    rep = TS.repetition_stats(docs.join(tok, "doc_id"))
    good = (
        quality.select("doc_id", "quality")
        .join(rep.select("doc_id", "dup_line_frac"), "doc_id")
        .filter((F.col("quality") >= min_quality)
                & (F.col("dup_line_frac") <= max_dup_line_frac))
        .select("doc_id")
    )

    # ---- survivors = quality ∩ exact-keep ∩ near-keep ∖ contaminated ----
    survivors = good.join(exact_keep, "doc_id")
    if near_keep is not None:
        survivors = survivors.join(near_keep, "doc_id")
    if contaminated is not None:
        survivors = survivors.join(contaminated, "doc_id", "left_anti")
    survivors = survivors.cache()
    n_out = survivors.count()

    # stage drop accounting (each count is one semi/anti join + count)
    n_quality = good.count()
    n_exact = tok.select("doc_id").join(exact_keep, "doc_id").count()
    n_near = (tok.select("doc_id").join(near_keep, "doc_id").count()
              if near_keep is not None else n_input)
    n_cont = contaminated.count() if contaminated is not None else 0

    # ---- apply stage: scrub + split (+ chunk) per resumable group -------
    ledger_path = f"{output}/curate_ledger.json"
    ledger = {}
    if resume and os.path.exists(ledger_path):
        with open(ledger_path) as f:
            ledger = json.load(f)
    scrubbed = CU.pii_scrub(docs).select("doc_id", "clean_text")
    splits = CU.split_assign(survivors, fractions=fractions)
    base = (survivors.join(scrubbed, "doc_id").join(splits, "doc_id")
            .select("doc_id", "split", F.col("clean_text").alias("text")))
    bpe_model = None
    tok_plan = (P.tokenize(base.select("doc_id", "text"))
                if (bpe_merges > 0 or chunk_size > 0) else None)
    if bpe_merges > 0:
        # train on the CURATED corpus (post-filter, post-scrub) — the
        # tokenizer a training run would actually fit; resumable by
        # artifact like the other global decision stages, but only when
        # the artifact was trained with the SAME request (a stale
        # tokenizer must not silently budget the chunks)
        from gensim_spark.operators import bpe as BP

        merges_path = f"{output}/bpe_merges.json"
        if resume and os.path.exists(merges_path):
            cand = BP.BpeModel.load(merges_path)
            if (cand.meta.get("requested_merges") == bpe_merges
                    and cand.meta.get("min_count") == bpe_min_count):
                bpe_model = cand
        if bpe_model is None:
            hist = BP.word_histogram(tok_plan, min_count=bpe_min_count)
            bpe_model = BP.bpe_train(hist, bpe_merges)
            bpe_model.meta.update(requested_merges=bpe_merges,
                                  min_count=bpe_min_count)
            tmp_m = merges_path + ".tmp"
            bpe_model.save(tmp_m)
            os.replace(tmp_m, merges_path)
    if chunk_size > 0:
        chunk_tok = tok_plan
        tokens_col = "tokens"
        if bpe_model is not None:
            # context windows budgeted in TOKENIZER tokens (what the
            # training run consumes), not whitespace words
            chunk_tok = bpe_model.encode(chunk_tok, tokens_col="tokens",
                                         out_col="bpe_tokens")
            tokens_col = "bpe_tokens"
        chunks = CU.chunk_tokens(chunk_tok, tokens_col=tokens_col,
                                 size=chunk_size, stride=chunk_stride)
        base = (chunks.join(splits, "doc_id")
                .select("doc_id", "chunk_id", "split",
                        F.col("chunk").alias("text")))
    rows_emitted = 0
    for g in range(num_groups):
        key = str(g)
        if key in ledger:
            rows_emitted += ledger[key]["rows"]
            continue
        part = base.filter(F.pmod(F.xxhash64("doc_id"),
                                  F.lit(num_groups)) == g).cache()
        tg = time.perf_counter()
        rows = part.count()  # before write: an empty group leaves no
        # parquet footer to re-read, and the cache makes write reuse the scan
        part.write.mode("overwrite").partitionBy("split").parquet(
            f"{output}/data/group={g}")
        part.unpersist()
        ledger[key] = {"rows": rows,
                       "wall_sec": round(time.perf_counter() - tg, 2)}
        rows_emitted += rows
        tmp = ledger_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ledger, f, indent=1)
        os.replace(tmp, ledger_path)  # atomic commit per group

    wall = time.perf_counter() - t0
    metrics = {
        "input_docs": n_input,
        "dropped_quality": n_input - n_quality,
        "dropped_exact_dup": n_input - n_exact,
        "dropped_near_dup": n_input - n_near,
        "dropped_contaminated": n_cont,
        "curated_docs": n_out,
        "rows_emitted": rows_emitted,
        "chunked": chunk_size > 0,
        "bpe_merges": len(bpe_model.merges) if bpe_model else 0,
        "groups": len(ledger),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_input / wall, 1),
    }
    with open(f"{output}/curate_metrics.json", "w") as f:
        json.dump(metrics, f, indent=1)
    tok.unpersist()
    survivors.unpersist()
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet dir")
    ap.add_argument("--output", required=True, help="curated output dir")
    ap.add_argument("--benchmark", default=None,
                    help="benchmark parquet (doc_id, text) to decontaminate "
                         "against")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--max-dup-line-frac", type=float, default=0.5)
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument("--decontaminate-n", type=int, default=13)
    ap.add_argument("--hashed-decontaminate", action="store_true",
                    help="probe 64-bit gram hashes instead of gram strings "
                         "(the no-string-allocation scale path)")
    ap.add_argument("--chunk-size", type=int, default=0,
                    help="emit token windows of this size (0 = whole docs)")
    ap.add_argument("--chunk-stride", type=int, default=None)
    ap.add_argument("--bpe-merges", type=int, default=0,
                    help="train a BPE tokenizer on the curated corpus "
                         "(resumable artifact bpe_merges.json) and budget "
                         "chunks in BPE tokens")
    ap.add_argument("--bpe-min-count", type=int, default=1,
                    help="drop word types rarer than this from the BPE "
                         "histogram (the driver-residency knob at scale)")
    ap.add_argument("--num-groups", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from gensim_spark.session import get_spark

    spark = get_spark("gensim_spark_curate")
    metrics = run(spark, args.input, args.output, benchmark=args.benchmark,
                  min_quality=args.min_quality,
                  max_dup_line_frac=args.max_dup_line_frac,
                  near_dup=not args.no_near_dup,
                  decontaminate_n=args.decontaminate_n,
                  hashed_decontaminate=args.hashed_decontaminate,
                  chunk_size=args.chunk_size, chunk_stride=args.chunk_stride,
                  bpe_merges=args.bpe_merges,
                  bpe_min_count=args.bpe_min_count,
                  num_groups=args.num_groups, resume=not args.no_resume)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
