#!/usr/bin/env python
"""Word2Vec training job (gensim/scripts/word2vec_standalone.py:1-130 as a
spark-submit job): text corpus → distributed SGNS/CBOW training → vectors
in the original word2vec C text/binary format.

Mirrors the C tool's flags (-train/-output/-size/-window/-sample/-hs/
-negative/-iter/-min_count/-alpha/-cbow/-binary/-accuracy). The corpus
scan, vocab build, and every training epoch are cluster-side (the
shard-synchronous protocol of operators/word2vec.py); only the V×D model
state lives on the driver — the reference's own memory model.

Run: spark-submit --py-files gensim_spark.zip gensim_spark/jobs/word2vec_train.py \
       -train corpus.txt -output vectors.txt -size 100 -cbow 0
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


def read_analogy_questions(spark, path: str):
    """questions-words.txt → (section, a, b, c, expected) DataFrame.

    The format of the C tool / gensim's evaluate_word_analogies
    (keyedvectors.py:1310-1330): ``: section-name`` headers, then one
    4-word analogy per line; lines before any header are skipped as the
    reference does."""
    rows, section = [], None
    with open(path, encoding="utf8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith(":"):
                section = line[1:].strip()
                continue
            parts = line.split()
            if section is not None and len(parts) == 4:
                rows.append((section, *parts))
    return spark.createDataFrame(
        rows, "section string, a string, b string, c string, expected string")


def run(spark, train: str, output: str | None, size: int = 100,
        window: int = 5, sample: float = 1e-3, hs: int = 0,
        negative: int = 5, iter_: int = 5, min_count: int = 5,
        alpha: float | None = None, cbow: int = 1, binary: int = 0,
        accuracy: str | None = None, num_shards: int = 64,
        seed: int = 1) -> dict:
    """Importable job body; returns metrics (+ accuracy sections if asked)."""
    import numpy as np
    from pyspark.sql import functions as F

    from gensim_spark.operators import vocab as V
    from gensim_spark.operators import word2vec as W2V
    from gensim_spark.sources.word2vec_format import save_word2vec_format

    t0 = time.perf_counter()
    skipgram = cbow == 0
    if alpha is None:
        alpha = 0.025 if skipgram else 0.05   # word2vec_standalone.py:112

    if train.endswith(".parquet") or os.path.isdir(train):
        docs = spark.read.parquet(train)
        if "doc_id" not in docs.columns:
            docs = docs.withColumn("doc_id",
                                   F.monotonically_increasing_id())
        if "tokens" not in docs.columns:
            docs = docs.select("doc_id",
                               F.split(F.col("text"), r"\s+").alias("tokens"))
    else:
        lines = spark.read.text(train)
        docs = lines.select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.filter(F.split(F.trim(F.col("value")), r"\s+"),
                     lambda t: t != "").alias("tokens"))
    docs = docs.select("doc_id", "tokens").cache()

    vocab = V.build_vocab(docs).filter(F.col("cf") >= min_count)
    vocab = V.compactify(vocab).cache()
    rows = vocab.select("term_id", "cf").orderBy("term_id").collect()
    counts = np.array([r["cf"] for r in rows], dtype=np.int64)
    ids = W2V.corpus_ids(docs, vocab)
    model = W2V.word2vec_fit(
        ids, len(counts), counts, vector_size=size, window=window,
        negative=negative, alpha=alpha, epochs=iter_, sample=sample,
        num_shards=num_shards, seed=seed, sg=1 if skipgram else 0, hs=hs)

    # count column → save orders most-frequent-first, the C tool's layout
    vecs = (model.vectors_df(spark)
            .join(F.broadcast(vocab.select("term_id", "token", "cf")),
                  "term_id")
            .select(F.col("token").alias("word"), "embedding",
                    F.col("cf").alias("count"),
                    F.col("term_id").alias("word_id")))
    if output:
        save_word2vec_format(vecs, output, binary=bool(binary))
    metrics = {"vocab_size": int(len(counts)),
               "vector_size": int(size), "epochs": int(iter_),
               "sg": int(skipgram),
               "elapsed_sec": round(time.perf_counter() - t0, 3)}
    if accuracy:
        # -accuracy questions-words.txt: the C tool's analogy eval
        # (word2vec_standalone.py:119 → accuracy(); file format is
        # ": section" headers + 4-word lines)
        from pyspark.sql import Window

        from gensim_spark.operators import keyedvectors as KV
        qdf = read_analogy_questions(spark, accuracy)
        # the C tool / model.accuracy() restricts the eval to the 30k most
        # frequent words (keyedvectors.py:1304 restrict_vocab=30000); our
        # ids are arrival-order, so rank by count first (vocab-sized
        # single-task window — eval-time only, the vocab is min_count-
        # bounded)
        ranked = vecs.withColumn(
            "freq_rank",
            F.row_number().over(
                Window.orderBy(F.desc("count"), F.asc("word"))) - 1)
        score, sections, oov = KV.evaluate_word_analogies(
            ranked.select("word", "embedding", "freq_rank"), qdf,
            key_col="word", restrict_vocab=30000, index_col="freq_rank")
        metrics["accuracy"] = {
            "score": round(float(score), 4),
            "oov": int(oov),
            "sections": [{"section": s["section"],
                          "correct": len(s["correct"]),
                          "incorrect": len(s["incorrect"])}
                         for s in sections],
        }
    docs.unpersist()
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-train", required=True)
    ap.add_argument("-output")
    ap.add_argument("-window", type=int, default=5)
    ap.add_argument("-size", type=int, default=100)
    ap.add_argument("-sample", type=float, default=1e-3)
    ap.add_argument("-hs", type=int, default=0, choices=[0, 1])
    ap.add_argument("-negative", type=int, default=5)
    ap.add_argument("-iter", type=int, default=5, dest="iter_")
    ap.add_argument("-min_count", type=int, default=5)
    ap.add_argument("-alpha", type=float, default=None)
    ap.add_argument("-cbow", type=int, default=1, choices=[0, 1])
    ap.add_argument("-binary", type=int, default=0, choices=[0, 1])
    ap.add_argument("-accuracy")
    ap.add_argument("-num_shards", type=int, default=64)
    args = ap.parse_args()

    from gensim_spark.session import get_spark

    spark = get_spark("gensim_spark_word2vec")
    metrics = run(spark, args.train, args.output, size=args.size,
                  window=args.window, sample=args.sample, hs=args.hs,
                  negative=args.negative, iter_=args.iter_,
                  min_count=args.min_count, alpha=args.alpha,
                  cbow=args.cbow, binary=args.binary,
                  accuracy=args.accuracy, num_shards=args.num_shards)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
