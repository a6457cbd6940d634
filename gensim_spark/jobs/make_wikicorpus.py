#!/usr/bin/env python
"""Wikipedia → Dictionary + BoW + TF-IDF pipeline job
(gensim/scripts/make_wikicorpus.py:1-110 as a spark-submit job).

The reference script streams a bz2 XML dump through WikiCorpus on one
machine (~9 h for 3.5M articles); here the same pipeline is one declarative
plan — dump scan → markup cascade → vocab with the reference's
``filter_extremes(no_below=20, no_above=0.1, keep_n=100000)`` → doc2bow
postings → TF-IDF — executed cluster-wide. Outputs mirror the reference
artifact-for-artifact:

* ``PREFIX_wordids.txt.bz2``   — token↔id mapping (save_as_text format)
* ``PREFIX_bow.mm``            — term-frequency Matrix Market file
* ``PREFIX_tfidf.mm``          — TF-IDF Matrix Market file
* ``PREFIX.tfidf_model/``      — fitted idf table + params (parquet+json)
* ``PREFIX_metadata/``         — (doc_id, title) parquet (the reference's
  ``.metadata.cpickle``, relational instead of pickled)

``--sink parquet`` swaps the single-file MM interchange format for
partitioned parquet postings — the 100 TB path; MM stays the default for
byte-level reference parity. ``--online`` maps ids by hash (HashDictionary,
the reference's ``make_wiki_online`` variant) instead of by the exact
first-doc ordering.

Run: spark-submit --py-files gensim_spark.zip gensim_spark/jobs/make_wikicorpus.py \
       --input dump.xml[.bz2] --output /out/wiki [--keep-words 100000]
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

DEFAULT_DICT_SIZE = 100000   # make_wikicorpus.py:50


def run(spark, input_path: str, output_prefix: str,
        keep_words: int = DEFAULT_DICT_SIZE, no_below: int = 20,
        no_above: float = 0.1, smartirs: str = "nfc",
        sink: str = "mm", online: bool = False,
        min_words: int | None = None) -> dict:
    """The pipeline body; returns build metrics. Importable so tests can
    drive it without a subprocess."""
    from pyspark.sql import functions as F

    from gensim_spark.functions import wikitext as W
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import tfidf as T
    from gensim_spark.operators import vocab as V
    from gensim_spark.sources.matrix_market import write_mm
    from gensim_spark.sources.textcorpus import save_vocab_as_text

    t0 = time.perf_counter()
    if input_path.endswith(".parquet") or os.path.isdir(input_path):
        articles = spark.read.parquet(input_path)
        if "tokens" not in articles.columns:
            kw = {} if min_words is None else {"min_words": min_words}
            articles = W.wiki_articles_to_tokens(articles, **kw)
    else:
        kw = {} if min_words is None else {"min_words": min_words}
        articles = W.wiki_articles_to_tokens(
            W.read_wiki_dump(spark, input_path), **kw)
    articles = articles.cache()
    num_docs = articles.count()

    tok = articles.select("doc_id", "tokens")
    if online:
        # make_wiki_online variant: HashDictionary(id_range=keep_words) —
        # ids ARE the hashes. Colliding tokens share one id, so postings
        # must be re-aggregated by (doc_id, term_id) and the id-level
        # df/cf recomputed from the aggregated postings (summing the
        # token-level counts would double-count docs containing two
        # colliding tokens — hashdictionary.py:119-140 counts per id).
        # ids are stateless hashes (hash_term_id_col needs no vocab
        # table), so postings come straight off the token stream — the
        # doc2bow join would broadcast a corpus-sized distinct-token
        # table, the exact OOM the online path exists to avoid
        raw_postings = (
            tok.select("doc_id", F.explode("tokens").alias("token"))
            .withColumn("term_id",
                        V.hash_term_id_col(F.col("token"), keep_words))
            .groupBy("doc_id", "term_id")
            .agg(F.count(F.lit(1)).alias("tf")))
        hashed = V.build_vocab(tok).withColumn(
            "term_id", V.hash_term_id_col(F.col("token"), keep_words))
        id_stats = (raw_postings.groupBy("term_id")
                    .agg(F.count(F.lit(1)).alias("df"),
                         F.sum("tf").alias("cf")))
        good_ids = id_stats.filter(
            (F.col("df") >= no_below)
            & (F.col("df") <= int(no_above * num_docs)))
        # one row per id for the artifacts: merged token set, id-level df
        # (HashDictionary.save_as_text, hashdictionary.py:310-345)
        # colliding tokens merge into one field joined with ', ' — the
        # reference tab-joins them (hashdictionary.py:347) but puts the
        # word list LAST in its own 3-column layout; our Dictionary-format
        # artifact has the token mid-field, where a tab would corrupt the
        # TSV and load_vocab_from_text would silently drop the row
        vocab = (hashed.groupBy("term_id")
                 .agg(F.concat_ws(", ", F.sort_array(
                     F.collect_set("token"))).alias("token"))
                 .join(good_ids, "term_id"))
    else:
        vocab = V.filter_extremes(
            V.build_vocab(tok), num_docs, no_below=no_below,
            no_above=no_above, keep_n=keep_words)
    vocab = vocab.cache()
    vocab_size = vocab.count()
    if online:
        postings = raw_postings.join(
            F.broadcast(vocab.select("term_id")), "term_id"
        ).select("doc_id", "term_id", "tf")
    else:
        postings = B.doc2bow_postings(tok, vocab)

    os.makedirs(os.path.dirname(output_prefix) or ".", exist_ok=True)
    save_vocab_as_text(vocab, output_prefix + "_wordids.txt.bz2", num_docs)
    articles.select("doc_id", "title").write.mode("overwrite").parquet(
        output_prefix + "_metadata")

    dfs = vocab.select("term_id", "df")
    weighted = T.tfidf_postings(postings, dfs, num_docs, smartirs=smartirs)
    if sink == "mm":
        nd, nt, nnz = write_mm(postings, output_prefix + "_bow.mm",
                               weight_col="tf")
        write_mm(weighted, output_prefix + "_tfidf.mm")
    else:
        postings.write.mode("overwrite").parquet(output_prefix + "_bow")
        weighted.write.mode("overwrite").parquet(output_prefix + "_tfidf")
        nnz = postings.count()
        nd, nt = num_docs, vocab_size

    # PREFIX.tfidf_model: the fitted state (idfs + params), reloadable
    dfs.write.mode("overwrite").parquet(output_prefix + ".tfidf_model/dfs")
    with open(output_prefix + ".tfidf_model/meta.json", "w") as fh:
        json.dump({"smartirs": smartirs, "num_docs": num_docs,
                   "num_nnz": int(nnz)}, fh)
    articles.unpersist()
    metrics = {"num_docs": int(nd), "vocab_size": int(vocab_size),
               "num_terms": int(nt), "num_nnz": int(nnz),
               "elapsed_sec": round(time.perf_counter() - t0, 3)}
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="wiki XML dump (.xml/.xml.bz2) or articles parquet")
    ap.add_argument("--output", required=True, help="output path prefix")
    ap.add_argument("--keep-words", type=int, default=DEFAULT_DICT_SIZE)
    ap.add_argument("--no-below", type=int, default=20)
    ap.add_argument("--no-above", type=float, default=0.1)
    ap.add_argument("--smartirs", default="nfc")
    ap.add_argument("--sink", default="mm", choices=["mm", "parquet"],
                    help="mm = reference interchange files; "
                         "parquet = partitioned postings (100 TB path)")
    ap.add_argument("--online", action="store_true",
                    help="hash-mapped ids (make_wiki_online variant)")
    ap.add_argument("--min-words", type=int, default=None,
                    help="article length filter (WikiCorpus default 50)")
    args = ap.parse_args()

    from gensim_spark.session import get_spark

    spark = get_spark("gensim_spark_make_wikicorpus")
    metrics = run(spark, args.input, args.output,
                  keep_words=args.keep_words, no_below=args.no_below,
                  no_above=args.no_above, smartirs=args.smartirs,
                  sink=args.sink, online=args.online,
                  min_words=args.min_words)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
