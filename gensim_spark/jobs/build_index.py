#!/usr/bin/env python
"""Index build job: pages parquet (url, warc_ts, html, text, lang) → packed
shard index + vocab table + manifest. Resumable (--resume skips committed
shard groups via the manifest)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def run(spark, input_path: str, output: str, variant: str = "okapi",
        docs_per_shard: int = 32768, num_groups: int = 8,
        from_html: bool = False, resume: bool = True,
        iceberg: bool = False, positional: bool = False,
        positional_n_buckets: int = 64) -> dict:
    """The job body; returns build metrics. Importable so tests can drive
    it on the shared session without a subprocess."""
    from pyspark.sql import functions as F

    from gensim_spark.index.layout import write_packed_shards
    from gensim_spark.plans import pipeline as P

    t0 = time.perf_counter()
    pages = spark.read.parquet(input_path)
    if "doc_id" not in pages.columns:
        pages = pages.withColumn(
            "doc_id", F.monotonically_increasing_id())
    if from_html:
        idx = P.build_from_pages(pages, variant=variant)
    else:
        docs = pages.select("doc_id", "text")
        tok = P.tokenize(docs)
        idx = P.build(tok, variant=variant)
    if iceberg:
        from gensim_spark.index.icetable import IceTable
        from gensim_spark.index.layout import write_packed_shards_iceberg

        try:
            vt = IceTable.load(f"{output}/vocab")
        except FileNotFoundError:
            vt = IceTable.create(
                f"{output}/vocab",
                "token string, term_id bigint, df bigint, cf bigint,"
                " first_doc bigint")
        vt.append(idx.vocab, operation="overwrite",
                  summary={"num_docs": idx.num_docs})
        table = write_packed_shards_iceberg(
            idx.weighted, f"{output}/shards",
            docs_per_shard=docs_per_shard,
            num_groups=num_groups, resume=resume,
        )
        groups = {
            str(s.summary["group"]): {k: s.summary[k] for k in
                                      ("docs", "terms", "postings",
                                       "wall_sec")}
            for s in table.snapshots if "group" in s.summary
        }
    else:
        idx.vocab.write.mode("overwrite").parquet(f"{output}/vocab")
        manifest = write_packed_shards(
            idx.weighted, output, docs_per_shard=docs_per_shard,
            num_groups=num_groups, resume=resume,
        )
        groups = manifest["groups"]
    if positional:
        # phrase/NEAR query support: positions through the SAME bucketed
        # layout (positions column rides along; bucket pruning + term_id
        # pushdown at query time), plus the doclen table the scorer joins
        from gensim_spark.index.layout import write_postings_bucketed
        from gensim_spark.operators.positional import positional_postings

        docs_tok = idx.docs
        if docs_tok is None:
            # the fused --from-html build keeps no token frame (extract →
            # tokenize → BoW is ONE mapInPandas stage); re-derive tokens
            # with the same extraction + simple_preprocess semantics
            # (byte-identical per url) for the positional store
            from gensim_spark.functions.textprep import (
                extract_html_text_udf, tokenize_pages)

            extracted = pages.withColumn(
                "text", extract_html_text_udf(F.col("html")))
            docs_tok = tokenize_pages(extracted).select("doc_id", "tokens")
        write_postings_bucketed(
            positional_postings(docs_tok, idx.vocab),
            f"{output}/positional", n_buckets=positional_n_buckets)
        idx.doclen.write.mode("overwrite").parquet(f"{output}/doclen")
    wall = time.perf_counter() - t0
    metrics = {
        "num_docs": idx.num_docs,
        "avgdl": idx.stats.avgdl,
        "variant": variant,
        # the fit parameters the weighted postings were built with — the
        # served scorers (serving.phrase_topk_served) read these back so
        # they can never diverge from the distributed scores (ADVICE r4)
        "k1": idx.stats.k1,
        "b": idx.stats.b,
        "epsilon": idx.stats.epsilon,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(idx.num_docs / wall, 1),
        "iceberg": bool(iceberg),
        "positional": bool(positional),
        "positional_n_buckets": positional_n_buckets if positional else None,
        "groups": groups,
    }
    with open(f"{output}/build_metrics.json", "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


def add_documents(spark, input_path: str, index_dir: str,
                  from_html: bool = False) -> dict:
    """Grow a ``--positional`` index in place: append the new pages'
    positional postings, doclen rows, AND packed term-store shards
    instead of rebuilding (VERDICT r4 #3 — ``add_documents`` on a
    phrase-enabled index forced a full rebuild). Phrase/NEAR/span AND
    term/WAND/served queries all see the appended docs. Mirrors the
    ``append_packed_shards_iceberg`` contract:

    - **Frozen model** (the reference's ``Similarity.add_documents``
      semantics — the Dictionary and the fitted weights don't refit on
      append, docsim.py:367-416): appended docs are indexed against the
      build-time vocab; their tokens outside it are ignored, and scoring
      keeps the build-time num_docs/df/avgdl, so existing docs' phrase
      and NEAR scores are bit-identical before and after the append.
      Refreshing the statistics is a rebuild, by design.
    - **Boundary guard**: new doc_ids must lie strictly above the store's
      current max (footer-stats check, no data scan); the input must
      carry an explicit ``doc_id`` column — auto-assigned ids would
      collide with the existing range.
    - The served path (``serving.phrase_topk_served``) needs no change:
      the hive dataset picks up the appended files, and the key-packing
      bound is derived from the data per query.

    Returns {"docs": n_appended, "wall_sec": ...} and records the append
    in build_metrics.json (num_docs stays the frozen scoring N;
    num_docs_total tracks the grown corpus)."""
    from pyspark.sql import functions as F

    from gensim_spark.index.layout import append_postings_bucketed
    from gensim_spark.operators.positional import positional_postings

    t0 = time.perf_counter()
    with open(f"{index_dir}/build_metrics.json") as f:
        meta = json.load(f)
    if not meta.get("positional"):
        raise SystemExit("add_documents grows the positional store — this "
                         "index was built without --positional")
    if meta.get("iceberg"):
        raise SystemExit("iceberg indexes grow through "
                         "Similarity.add_documents / the streaming store; "
                         "add_documents here serves the plain --positional "
                         "layout")
    pages = spark.read.parquet(input_path)
    if "doc_id" not in pages.columns:
        raise SystemExit("append input needs an explicit doc_id column "
                         "(above the index's current max) — auto-assigned "
                         "ids would collide with the existing range")
    if from_html:
        from gensim_spark.functions.textprep import (
            extract_html_text_udf, tokenize_pages)

        extracted = pages.withColumn(
            "text", extract_html_text_udf(F.col("html")))
        docs_tok = tokenize_pages(extracted).select("doc_id", "tokens")
    else:
        from gensim_spark.plans import pipeline as P

        docs_tok = P.tokenize(pages.select("doc_id", "text"))
    docs_tok = docs_tok.persist()
    # boundary guards on the INPUT docs (not the vocab-joined postings —
    # an all-OOV doc with a colliding id would otherwise slip past the
    # postings-level check and append a duplicate doclen row), ALL
    # evaluated before any write: positional/doclen footer-stats maxima,
    # plus the packed store's next-shard boundary (strictest — the WAND
    # reader needs appended docs in fresh shards)
    import os as _os

    from gensim_spark.index.layout import (append_packed_shards,
                                           max_doc_id_bucketed,
                                           packed_committed_max_shard)

    # a pending marker from a crashed earlier append means the three
    # stores may disagree (positional written, doclen/packed not) —
    # refuse loudly instead of guessing; the marker names the batch
    if meta.get("pending_append"):
        pa = meta["pending_append"]
        raise ValueError(
            f"index has a half-applied append (input={pa['input']!r}, "
            f"min_doc_id={pa['min_doc_id']}): a previous add_documents "
            "crashed mid-write and the positional/doclen/packed stores "
            "may disagree for that id range. Rebuild the index (or "
            "restore it from before that append) before appending again.")
    mn = docs_tok.agg(F.min("doc_id").alias("mn")).collect()[0]["mn"]
    has_packed = _os.path.exists(f"{index_dir}/manifest.json")
    if mn is not None:
        maxes = [m for m in (max_doc_id_bucketed(f"{index_dir}/positional"),
                             max_doc_id_bucketed(f"{index_dir}/doclen"))
                 if m is not None]
        if maxes and int(mn) <= max(maxes):
            raise ValueError(
                f"add_documents needs doc_ids > {max(maxes)} (index max); "
                f"got {mn}. Interleaved ids need a rebuild or the "
                "streaming incremental store.")
        if has_packed:
            with open(f"{index_dir}/manifest.json") as f:
                dps = int(json.load(f)["params"]["docs_per_shard"])
            boundary = (packed_committed_max_shard(index_dir) + 1) * dps
            if int(mn) < boundary:
                raise ValueError(
                    f"add_documents needs doc_ids >= {boundary}: the "
                    f"packed term store's next shard boundary (shards "
                    f"hold {dps} ids; the WAND reader keeps one run per "
                    f"(shard, term), so appended docs cannot extend a "
                    f"committed tail shard). Re-id the batch to start at "
                    f"{boundary}, or rebuild; got {mn}.")
    # mark the append in-flight BEFORE any write: the three stores cannot
    # be appended atomically, so a crash mid-way must be detectable (the
    # marker clears when the append record commits below)
    if mn is not None:
        meta["pending_append"] = {"input": input_path,
                                  "min_doc_id": int(mn)}
        with open(f"{index_dir}/build_metrics.json", "w") as f:
            json.dump(meta, f, indent=1)
    vocab = spark.read.parquet(f"{index_dir}/vocab")
    append_postings_bucketed(
        positional_postings(docs_tok, vocab), f"{index_dir}/positional",
        n_buckets=meta.get("positional_n_buckets") or 64)
    # doclen parity with the one-shot build: dl = FULL token count (incl.
    # out-of-vocab tokens), one row per doc with >= 1 token
    doclen_new = (docs_tok.filter(F.size("tokens") > 0)
                  .select("doc_id",
                          F.size("tokens").cast("long").alias("dl")))
    doclen_new.write.mode("append").parquet(f"{index_dir}/doclen")
    if has_packed:
        # grow the TERM-QUERY store too (WAND / served): weight the new
        # docs against the frozen vocab/stats and pack them as fresh
        # shards — without this, phrase queries would see appended docs
        # but term queries would not
        from gensim_spark.functions.textprep import bow_counts_udf
        from gensim_spark.operators import bm25 as M

        stats = M.fit_from_vocab(vocab, meta["num_docs"],
                                 variant=meta.get("variant", "okapi"),
                                 k1=meta.get("k1", 1.5),
                                 b=meta.get("b", 0.75),
                                 epsilon=meta.get("epsilon", 0.25))
        counts = docs_tok.select(
            "doc_id",
            F.size("tokens").cast("long").alias("dl"),
            F.explode(bow_counts_udf("tokens")).alias("e"),
        ).select("doc_id", F.col("e.token").alias("token"),
                 F.col("e.tf").alias("tf"), "dl")
        with_dl = counts.join(
            F.broadcast(vocab.select("token", "term_id")), "token"
        ).select("doc_id", "term_id", "tf", "dl")
        weighted_new = M.weight_postings(with_dl, stats, dl="inline")
        # mn is already validated against the shard boundary above — skip
        # append_packed_shards' own pass over the weighted lineage
        append_packed_shards(weighted_new, index_dir, min_doc_id=mn)
    n_new = docs_tok.count()
    docs_tok.unpersist()
    rec = {"input": input_path, "docs": int(n_new),
           "wall_sec": round(time.perf_counter() - t0, 2)}
    meta.pop("pending_append", None)  # all stores written: commit
    meta.setdefault("appends", []).append(rec)
    meta["num_docs_total"] = meta.get(
        "num_docs_total", meta["num_docs"]) + int(n_new)
    with open(f"{index_dir}/build_metrics.json", "w") as f:
        json.dump(meta, f, indent=1)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet dir")
    ap.add_argument("--output", required=True, help="index output dir")
    ap.add_argument("--variant", default="okapi",
                    choices=["okapi", "lucene", "atire"])
    ap.add_argument("--docs-per-shard", type=int, default=32768)
    ap.add_argument("--num-groups", type=int, default=8)
    ap.add_argument("--from-html", action="store_true",
                    help="extract text from the html column (Arrow UDF path)")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--iceberg", action="store_true",
                    help="store shards + vocab as Iceberg-semantics tables "
                         "(snapshot commits, time travel, manifest pruning)")
    ap.add_argument("--positional", action="store_true",
                    help="also write the positional bucketed store + "
                         "doclen (enables query_index --phrase/--near)")
    ap.add_argument("--positional-n-buckets", type=int, default=64)
    ap.add_argument("--append", action="store_true",
                    help="grow an existing --positional index with the "
                         "input pages (frozen vocab/stats; doc_id column "
                         "required, ids above the index's current max)")
    args = ap.parse_args()

    from gensim_spark.session import get_spark

    spark = get_spark("gensim_spark_build")
    if args.append:
        metrics = add_documents(spark, args.input, args.output,
                                from_html=args.from_html)
    else:
        metrics = run(spark, args.input, args.output, variant=args.variant,
                      docs_per_shard=args.docs_per_shard,
                      num_groups=args.num_groups, from_html=args.from_html,
                      resume=not args.no_resume, iceberg=args.iceberg,
                      positional=args.positional,
                      positional_n_buckets=args.positional_n_buckets)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
