"""Index persistence — the ``SaveLoad`` analogue (gensim/utils.py:389-768).

gensim pickles models with large-array externalization and optional mmap
reload; the Spark-native equivalent is a directory of parquet tables plus a
JSON manifest carrying the scalars and lineage:

    <dir>/vocab/        (token, term_id, df, cf, first_doc)
    <dir>/postings/     (doc_id, term_id, tf, dl)
    <dir>/weighted/     (doc_id, term_id, weight)
    <dir>/meta.json     {num_docs, variant, k1, b, epsilon, avgdl, ...}

Loading rebuilds an ``IndexedCorpus`` whose idf table derives from the saved
vocab (exactly as fitting from a loaded Dictionary does in gensim).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from gensim_spark.operators import bm25 as M
from gensim_spark.plans.pipeline import IndexedCorpus


def save_index(index: IndexedCorpus, path: str,
               include_weighted: bool = True) -> dict:
    os.makedirs(path, exist_ok=True)
    index.vocab.write.mode("overwrite").parquet(f"{path}/vocab")
    counts_like = index.postings.join(index.doclen, "doc_id").select(
        "doc_id", "term_id", "tf", "dl"
    )
    counts_like.write.mode("overwrite").parquet(f"{path}/postings")
    if include_weighted and index.weighted is not None:
        index.weighted.write.mode("overwrite").parquet(f"{path}/weighted")
    meta = {
        "num_docs": index.num_docs,
        "saved_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "include_weighted": include_weighted,
    }
    if index.stats is not None:
        meta.update({
            "variant": index.stats.variant, "k1": index.stats.k1,
            "b": index.stats.b, "epsilon": index.stats.epsilon,
            "avgdl": index.stats.avgdl,
        })
    with open(f"{path}/meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def load_index(spark: SparkSession, path: str) -> IndexedCorpus:
    with open(f"{path}/meta.json") as f:
        meta = json.load(f)
    vocab = spark.read.parquet(f"{path}/vocab")
    postings_dl = spark.read.parquet(f"{path}/postings")
    stats = None
    weighted = None
    if "variant" in meta:
        # Rehydrate the stats from the saved scalars — refitting would change
        # avgdl for indexes originally fit with fit_from_postings (the
        # nnz/num_docs reference quirk) and silently shift BM25 weights.
        stats = M.BM25Stats(
            variant=meta["variant"], k1=meta["k1"], b=meta["b"],
            epsilon=meta["epsilon"], avgdl=meta["avgdl"],
            num_docs=meta["num_docs"],
            idfs=M.idf_table(vocab.select("term_id", "df"), meta["num_docs"],
                             meta["variant"], meta["epsilon"]),
        )
        if meta.get("include_weighted") and os.path.exists(f"{path}/weighted"):
            weighted = spark.read.parquet(f"{path}/weighted")
        else:
            weighted = M.weight_postings(postings_dl, stats, dl="inline")
    return IndexedCorpus(
        docs=None,
        vocab=vocab,
        postings=postings_dl.select("doc_id", "term_id", "tf"),
        doclen=postings_dl.select("doc_id", "dl").distinct(),
        num_docs=meta["num_docs"],
        stats=stats,
        weighted=weighted,
    )
