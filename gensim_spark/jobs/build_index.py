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
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gensim_spark.index.layout import write_packed_shards
    from gensim_spark.plans import pipeline as P
    from gensim_spark.session import get_spark

    spark = get_spark("gensim_spark_build")
    t0 = time.perf_counter()
    pages = spark.read.parquet(args.input)
    if args.from_html:
        idx = P.build_from_pages(pages, variant=args.variant)
    else:
        if "doc_id" in pages.columns:
            docs = pages.select("doc_id", "text")
        else:
            docs = pages.select(
                F.monotonically_increasing_id().alias("doc_id"), "text"
            )
        tok = P.tokenize(docs)
        idx = P.build(tok, variant=args.variant)
    if args.iceberg:
        from gensim_spark.index.icetable import IceTable
        from gensim_spark.index.layout import write_packed_shards_iceberg

        try:
            vt = IceTable.load(f"{args.output}/vocab")
        except FileNotFoundError:
            vt = IceTable.create(
                f"{args.output}/vocab",
                "token string, term_id bigint, df bigint, cf bigint,"
                " first_doc bigint")
        vt.append(idx.vocab, operation="overwrite",
                  summary={"num_docs": idx.num_docs})
        table = write_packed_shards_iceberg(
            idx.weighted, f"{args.output}/shards",
            docs_per_shard=args.docs_per_shard,
            num_groups=args.num_groups, resume=not args.no_resume,
        )
        groups = {
            str(s.summary["group"]): {k: s.summary[k] for k in
                                      ("docs", "terms", "postings",
                                       "wall_sec")}
            for s in table.snapshots if "group" in s.summary
        }
    else:
        idx.vocab.write.mode("overwrite").parquet(f"{args.output}/vocab")
        manifest = write_packed_shards(
            idx.weighted, args.output, docs_per_shard=args.docs_per_shard,
            num_groups=args.num_groups, resume=not args.no_resume,
        )
        groups = manifest["groups"]
    wall = time.perf_counter() - t0
    metrics = {
        "num_docs": idx.num_docs,
        "avgdl": idx.stats.avgdl,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(idx.num_docs / wall, 1),
        "iceberg": bool(args.iceberg),
        "groups": groups,
    }
    with open(f"{args.output}/build_metrics.json", "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
